"""Online query matching over a suffix array.

Capability equivalent of the reference esa-mmsearch machinery
(ref: src/match/esa-mmsearch.c: gt_mmsearch binary search at :116,
GtMMsearchiterator :203, gt_querysubstringmatch — used by `gt repfind -q`
and ltrharvest) plus the minimum-unique-substring and matching-statistics
applications (ref: src/match/esa-minunique.c `gt uniquesub`,
`gt matstat`).

Redesign: searches are expressed as vectorized numpy searchsorted over
the suffix array using precomputed rank keys, so a whole batch of query
windows is located in one pass instead of per-window binary search loops.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.chardef import is_special
from ..core.encseq import Encseq
from ..index.esa import EnhancedSuffixArray


class SuffixArraySearcher:
    """Interval-narrowing search over an ESA (the MMsearchiterator role).

    Within a suftab interval whose suffixes share a depth-d prefix, the
    characters at depth d appear in non-decreasing code order (regular
    codes 0..3 first, specials/short suffixes after), so each pattern
    character narrows the interval with two numpy searchsorted calls —
    O(|pattern| log n) total, no Python char loops."""

    def __init__(self, esa: EnhancedSuffixArray):
        self.esa = esa
        self.codes = esa.encseq.codes_view(esa.readmode).astype(np.uint8)
        self.sa = esa.suftab.astype(np.int64)
        self.n = self.codes.size

    def _narrow(self, lo: int, hi: int, depth: int, sym: int):
        """Sub-interval of suffixes whose depth-d char == sym."""
        idx = self.sa[lo:hi] + depth
        chars = np.where(idx < self.n,
                         self.codes[np.minimum(idx, self.n - 1)],
                         np.uint8(255))
        l2 = lo + int(np.searchsorted(chars, sym, "left"))
        h2 = lo + int(np.searchsorted(chars, sym, "right"))
        return l2, h2

    def interval(self, pattern: np.ndarray) -> tuple[int, int]:
        """suftab interval [lo, hi) of suffixes with `pattern` as prefix
        (ref: gt_mmsearch)."""
        lo, hi = 0, len(self.sa)
        for depth, sym in enumerate(pattern):
            if sym >= 250 or lo >= hi:
                return lo, lo
            lo, hi = self._narrow(lo, hi, depth, int(sym))
        return lo, hi

    def occurrences(self, pattern: np.ndarray) -> np.ndarray:
        lo, hi = self.interval(pattern)
        return np.sort(self.sa[lo:hi])

    def longest_prefix_match(self, query: np.ndarray) -> int:
        """Length of the longest prefix of `query` occurring in the
        index (matching statistics primitive, ref: esa-minunique.c)."""
        lo, hi = 0, len(self.sa)
        length = 0
        while length < len(query):
            sym = int(query[length])
            if sym >= 250:
                break
            l2, h2 = self._narrow(lo, hi, length, sym)
            if l2 >= h2:
                break
            lo, hi = l2, h2
            length += 1
        return length


def query_substring_matches(esa: EnhancedSuffixArray, query: Encseq,
                            minlength: int):
    """All maximal substring matches of every query position
    (ref: gt_querysubstringmatch): for each query position, the longest
    prefix of the query suffix occurring in the database; reported when
    >= minlength. Returns rows (dbpos, querypos, length) with all db
    occurrences enumerated."""
    searcher = SuffixArraySearcher(esa)
    qcodes = query.codes_view(0)
    out = []
    qn = qcodes.size
    qpos = 0
    while qpos < qn:
        suffix = qcodes[qpos:]
        if is_special(qcodes[qpos:qpos + 1])[0]:
            qpos += 1
            continue
        length = searcher.longest_prefix_match(suffix)
        if length >= minlength:
            for dbpos in searcher.occurrences(qcodes[qpos:qpos + length]):
                out.append((int(dbpos), qpos, length))
        qpos += 1
    return out


def minimum_unique_substrings(esa: EnhancedSuffixArray, query: Encseq,
                              minlength: int = 1, maxlength: int | None = None):
    """`gt uniquesub` (ref: esa-minunique.c gt_findminuniquesubstrings):
    for each query position, the shortest prefix length that is unique
    in the database (occurs 0 times as an extension = unique point);
    reported if within [minlength, maxlength]."""
    searcher = SuffixArraySearcher(esa)
    qcodes = query.codes_view(0)
    out = []
    qn = qcodes.size
    for qpos in range(qn):
        if is_special(qcodes[qpos:qpos + 1])[0]:
            continue
        limit = maxlength or (qn - qpos)
        found = None
        for length in range(1, min(limit, qn - qpos) + 1):
            pat = qcodes[qpos:qpos + length]
            if is_special(pat[-1:])[0]:
                break
            lo, hi = searcher.interval(pat)
            if hi - lo <= 1:
                if hi - lo == 1:
                    found = length
                break
        if found is not None and found >= minlength:
            out.append((qpos, found))
    return out


def matching_statistics(esa: EnhancedSuffixArray, query: Encseq):
    """`gt matstat`: per query position the length of the longest match
    starting there (ref: matching statistics over the index)."""
    searcher = SuffixArraySearcher(esa)
    qcodes = query.codes_view(0)
    out = np.zeros(qcodes.size, np.int64)
    for qpos in range(qcodes.size):
        if is_special(qcodes[qpos:qpos + 1])[0]:
            continue
        out[qpos] = searcher.longest_prefix_match(qcodes[qpos:])
    return out


def approximate_search(esa: EnhancedSuffixArray, pattern: np.ndarray,
                       max_edits: int, best_match_only: bool = False):
    """Approximate tag matching over the index
    (ref: `gt tagerator`, src/match/tagerator.c + idx-limdfs.c: a
    depth-limited DFA walk over the index trie; here a DFS over
    suffix-array intervals carrying a banded edit-distance row).

    Returns rows (dbpos, length, distance): substring occurrences of the
    whole pattern within edit distance <= max_edits. Each (interval,
    depth) node expands per character by narrowing the suftab interval;
    the DP row prunes branches whose minimum exceeds max_edits.
    """
    searcher = SuffixArraySearcher(esa)
    m = len(pattern)
    if m == 0:
        return []
    results = {}
    init = np.arange(m + 1, dtype=np.int64)
    maxdepth = m + max_edits

    def dfs(lo, hi, depth, row):
        if lo >= hi or depth > maxdepth:
            return
        if row[m] <= max_edits:
            dist = int(row[m])
            for pos in searcher.sa[lo:hi]:
                key = (int(pos), depth)
                if key not in results or results[key] > dist:
                    results[key] = dist
        if row.min() > max_edits:
            return
        for sym in range(4):
            l2, h2 = searcher._narrow(lo, hi, depth, sym)
            if l2 >= h2:
                continue
            new = np.empty(m + 1, np.int64)
            new[0] = depth + 1
            for j in range(1, m + 1):
                cost = 0 if pattern[j - 1] == sym else 1
                new[j] = min(row[j - 1] + cost, row[j] + 1, new[j - 1] + 1)
            dfs(l2, h2, depth + 1, new)

    dfs(0, len(searcher.sa), 0, init)
    # keep, per start position, the best (shortest-distance) occurrence
    out = []
    best_per_pos = {}
    for (pos, depth), dist in results.items():
        cur = best_per_pos.get(pos)
        if cur is None or dist < cur[1]:
            best_per_pos[pos] = (depth, dist)
    for pos, (depth, dist) in sorted(best_per_pos.items()):
        out.append((pos, depth, dist))
    if best_match_only and out:
        dmin = min(d for _, _, d in out)
        out = [r for r in out if r[2] == dmin]
    return out


def tagerator_search(esa: EnhancedSuffixArray, tag: np.ndarray,
                     max_edits: int, nowildcards: bool = True):
    """Complete-tag approximate matching with the reference tagerator's
    accept-and-prune semantics (ref: src/match/tagerator.c +
    idx-limdfs.c runlimdfs/esa_splitandprocess): DFS over suffix-array
    intervals carrying a full edit-distance column; a branch ACCEPTS at
    the earliest depth d where the whole tag aligns within
    ``max_edits`` (row[m] <= e) — every position of the interval is
    reported with dblength d — and the branch is pruned there, so an
    exact occurrence shadowed by a shorter accepting prefix is never
    re-reported (matches the reference's output sets).  Suffixes whose
    next character is special continue as per-suffix context walks
    (ref: esa_overcontext) — specials never match a tag character but
    may be absorbed as differences.

    Returns rows (dbpos, dblen, dist) in DFS report order.
    """
    searcher = SuffixArraySearcher(esa)
    m = len(tag)
    out: list[tuple[int, int, int]] = []
    if m == 0:
        return out
    e = int(max_edits)
    init = np.arange(m + 1, dtype=np.int64)
    maxdepth = m + e
    codes = searcher.codes
    n = searcher.n

    def step_row(row, sym_matches):
        new = np.empty(m + 1, np.int64)
        new[0] = row[0] + 1
        cost = 1 - sym_matches.astype(np.int64)
        cand = np.minimum(row[:-1] + cost, row[1:] + 1)
        prev = new[0]
        for j in range(1, m + 1):
            prev = min(int(cand[j - 1]), prev + 1)
            new[j] = prev
        return new

    def context_walk(pos, depth, row):
        """Per-suffix continuation once off the shared trie (specials
        or singleton intervals)."""
        d = depth
        r = row
        while d <= maxdepth:
            if r[m] <= e:
                out.append((int(pos), d, int(r[m])))
                return
            if r.min() > e:
                return
            idx = pos + d
            if idx >= n:
                return
            cc = int(codes[idx])
            if cc == 255:                # separator ends the context
                return
            r = step_row(r, tag == cc)
            d += 1
        return

    def dfs(lo, hi, depth, row):
        if lo >= hi or depth > maxdepth:
            return
        if row[m] <= e:
            dist = int(row[m])
            for p in searcher.sa[lo:hi]:
                out.append((int(p), depth, dist))
            return                       # accept-and-prune
        if row.min() > e:
            return
        firstspecial = lo
        for sym in range(4):
            l2, h2 = searcher._narrow(lo, hi, depth, sym)
            if l2 >= h2:
                continue
            dfs(l2, h2, depth + 1, step_row(row, tag == sym))
            firstspecial = h2
        if nowildcards:
            return
        # suffixes with a wildcard at this depth: per-suffix context
        # walks (ref: esa_overcontext; only with -withwildcards)
        for b in range(firstspecial, hi):
            p = int(searcher.sa[b])
            idx = p + depth
            if idx >= n:
                continue
            cc = int(codes[idx])
            if cc < 4 or cc == 255:      # covered by a child / separator
                continue
            context_walk(p, depth + 1, step_row(row, tag == cc))

    dfs(0, len(searcher.sa), 0, init)
    return out
