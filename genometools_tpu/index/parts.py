"""Memory-bounded, int64-capable ESA construction in code-range parts.

The capability equivalent of the reference's ``-parts`` / ``-memlimit``
planner (ref: src/match/sfx-partssuf.c:40 GtSuftabparts, planner at
:172) and its per-part pass-B (ref: src/match/sfx-suffixer.c:1947
preparethispart): the suffix set is split by first-``PREFIXLEN``-symbol
code ranges so that no part holds more than ``max_part_suffixes``
suffixes; parts are then built one at a time, each touching only
O(part) working memory beyond the (byte-packed) sequence itself, and
the concatenated part outputs ARE the suftab.  Positions are int64
throughout — this is the framework's >2^31 path (the in-memory doubling
engine is int32-bound, core/encseq.py suffix_keys guard).

Suffix-order contract (matches gt_encseq_check_comparetwosuffixes and
index.suffix exactly): regular symbols compare by code; a special at
position p compares as key ``sigma + p`` — greater than every regular
symbol, and two specials order by position.  Hence:

  * suffixes starting with a special form the tail of the suftab,
    ordered by position ascending, followed by the sentinel (empty
    suffix at totallength);
  * regular-start suffixes are partitioned by their bit-packed
    first-``PREFIXLEN`` digits (order-preserving encoding: regular
    code c -> c+1, special -> sigma+1, past-end / after-special -> 0),
    and within a part sorted by iterative digit refinement with the
    final position tiebreak resolving equal-prefix special ties.

The per-part sorter is the same packed-digit design as the distributed
pass-B (parallel/dist_esa.py) — here host numpy with int64 positions,
refining ``DIGITS_PER_ROUND`` symbols per round until every group is a
singleton (early exit), so memory per part is a few machine words per
suffix and rounds scale with the part's max LCP.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np

from ..core.chardef import is_special

PREFIXLEN = 8          # partition depth: 4^8 = 65536 buckets for DNA
DIGITS_PER_ROUND = 10  # 3 bits * 10 digits < 2^31 (int32-packable)
CHUNK = 1 << 24        # position-scan chunk (bounds planner memory)


def _digit_bits(sigma: int) -> int:
    return max(1, (sigma + 1).bit_length())


def _packed_codes(codes: np.ndarray, start: int, stop: int, depth0: int,
                  ndig: int, sigma: int, n: int) -> np.ndarray:
    """Order-preserving packed digits [depth0, depth0+ndig) of the
    suffixes starting in [start, stop): regular c -> c+1, special ->
    sigma+1, past-end and after-first-special -> 0. int64 output."""
    m = stop - start
    pos = np.arange(start, stop, dtype=np.int64)
    bits = _digit_bits(sigma)
    acc = np.zeros(m, np.int64)
    alive = np.ones(m, bool)
    for d in range(depth0, depth0 + ndig):
        idx = pos + d
        dig = codes[np.minimum(idx, n - 1)]
        # running past the end hits the sentinel — a special at
        # position n (key sigma + n), not a smallest symbol
        spec = is_special(dig) | (idx >= n)
        val = np.where(alive,
                       np.where(spec, sigma + 1, dig.astype(np.int64) + 1),
                       0)
        acc = (acc << bits) | val
        alive &= ~spec
    return acc


@dataclass
class PartPlan:
    """Code-range parts: part i covers packed first-PREFIXLEN codes in
    [bounds[i], bounds[i+1])."""
    bounds: np.ndarray        # int64[nparts+1]
    counts: np.ndarray        # int64[nparts]
    num_regular: int
    prefixlen: int


def plan_parts(codes: np.ndarray, max_part_suffixes: int,
               sigma: int = 4) -> PartPlan:
    """Pass A + planner: chunked histogram of packed first-PREFIXLEN
    codes over regular-start suffixes, greedily split into ranges of at
    most max_part_suffixes (a single over-full bucket becomes its own
    part, like the reference planner's minimum granularity)."""
    n = codes.size
    bits = _digit_bits(sigma)
    nbuckets = 1 << (bits * PREFIXLEN)
    hist = np.zeros(nbuckets, np.int64)
    for s in range(0, n, CHUNK):
        e = min(n, s + CHUNK)
        pk = _packed_codes(codes, s, e, 0, PREFIXLEN, sigma, n)
        regular = ~is_special(codes[s:e])
        hist += np.bincount(pk[regular], minlength=nbuckets)
    num_regular = int(hist.sum())

    bounds = [0]
    counts = []
    acc = 0
    nz = np.flatnonzero(hist)
    for b in nz:
        c = int(hist[b])
        if acc and acc + c > max_part_suffixes:
            bounds.append(int(b))
            counts.append(acc)
            acc = 0
        acc += c
    bounds.append(nbuckets)
    counts.append(acc)
    return PartPlan(np.asarray(bounds, np.int64),
                    np.asarray(counts, np.int64), num_regular, PREFIXLEN)


def _sort_part(codes: np.ndarray, pos: np.ndarray, sigma: int,
               n: int) -> np.ndarray:
    """Sort the suffixes at ``pos`` (all sharing no constraint beyond
    the part's code range) by iterative packed-digit refinement with
    position tiebreak. Returns pos in suffix order."""
    m = pos.size
    if m <= 1:
        return pos
    bits = _digit_bits(sigma)
    rank = np.zeros(m, np.int64)          # dense group ids, refined
    order = np.arange(m, dtype=np.int64)
    alive = np.ones(m, bool)              # in order space: no special /
    depth = 0                             # end seen at depth < current
    max_depth = n + DIGITS_PER_ROUND
    while depth < max_depth:
        # digits for the current order's positions
        p = pos[order]
        acc = np.zeros(m, np.int64)
        for d in range(depth, depth + DIGITS_PER_ROUND):
            idx = p + d
            dig = codes[np.minimum(idx, n - 1)]
            # past-the-end == sentinel special at position n; ties
            # against real specials at the same depth resolve by the
            # position key (both keys are sigma + (p + d))
            spec = is_special(dig) | (idx >= n)
            val = np.where(alive,
                           np.where(spec, sigma + 1,
                                    dig.astype(np.int64) + 1), 0)
            acc = (acc << bits) | val
            alive &= ~spec
        # stable sort within groups by (rank, digits, position); the
        # position key only ever decides between suffixes whose digits
        # stay equal through their whole compared extent — i.e. equal
        # prefixes ending in specials at the same depth, which the
        # contract orders by position (key sigma + p)
        srt = np.lexsort((p, acc, rank))
        order = order[srt]
        alive = alive[srt]
        rank_s = rank[srt]
        acc_s = acc[srt]
        neq = np.zeros(m, bool)
        neq[1:] = (rank_s[1:] != rank_s[:-1]) | (acc_s[1:] != acc_s[:-1])
        rank = np.cumsum(neq, dtype=np.int64)
        # a group is finished when its digits ran out (hit a special /
        # the end) or it became a singleton; unfinished groups are those
        # with alive digits and >1 member
        sizes = np.bincount(rank, minlength=int(rank[-1]) + 1)
        unfinished = (sizes[rank] > 1) & alive
        if not unfinished.any():
            break
        depth += DIGITS_PER_ROUND
    return pos[order]


def iter_suftab_parts(codes: np.ndarray, max_part_suffixes: int,
                      sigma: int = 4,
                      plan: PartPlan | None = None
                      ) -> Iterator[np.ndarray]:
    """Yield the suftab as consecutive int64 segments, never holding
    more than one part's working set: regular-code parts in code order,
    then all special-start suffixes by position, then the sentinel."""
    n = codes.size
    if plan is None:
        plan = plan_parts(codes, max_part_suffixes, sigma)
    nparts = plan.counts.size
    for i in range(nparts):
        lo, hi = int(plan.bounds[i]), int(plan.bounds[i + 1])
        cnt = int(plan.counts[i])
        part_pos = np.empty(cnt, np.int64)
        got = 0
        for s in range(0, n, CHUNK):
            e = min(n, s + CHUNK)
            pk = _packed_codes(codes, s, e, 0, plan.prefixlen, sigma, n)
            sel = (~is_special(codes[s:e])) & (pk >= lo) & (pk < hi)
            hits = np.flatnonzero(sel) + s
            part_pos[got:got + hits.size] = hits
            got += hits.size
        assert got == cnt
        yield _sort_part(codes, part_pos, sigma, n)
    # special-start suffixes order by position (key sigma + p)
    spec_pos = []
    for s in range(0, n, CHUNK):
        e = min(n, s + CHUNK)
        spec_pos.append(np.flatnonzero(is_special(codes[s:e])) + s)
    tail = (np.concatenate(spec_pos) if spec_pos
            else np.zeros(0, np.int64)).astype(np.int64)
    yield tail
    yield np.asarray([n], np.int64)          # sentinel (empty suffix)


def build_suftab_parts(codes: np.ndarray, max_part_suffixes: int,
                       sigma: int = 4) -> np.ndarray:
    """Whole suftab via the parts engine (for testing / small inputs —
    real >RAM runs should consume iter_suftab_parts streamingly)."""
    return np.concatenate(
        list(iter_suftab_parts(codes, max_part_suffixes, sigma)))
