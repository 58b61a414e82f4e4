"""LTRharvest: LTR retrotransposon prediction.

Capability equivalent of `gt ltrharvest`
(ref: src/ltr/ltrharvest_stream.c, gt_ltrharvest.c). Pipeline, mirroring
the reference's phases with its default parameters:

  1. seeds: exact maximal repeats with length >= seedlength (default 30)
     whose two instances are mindistltr..maxdistltr apart (defaults
     1000..15000) on the same sequence
     (ref: gt_simpleexactselfmatchstore, ltrharvest_stream.c:187)
  2. extension: xdrop extension of the repeat pair outward
     (ref: gt_searchforLTRs, ltrharvest_stream.c:897) giving candidate
     LTR boundaries
  3. filters: per-LTR length in [minlenltr, maxlenltr] (100..1000),
     similarity >= `similar`% (85), overlap resolution keeping the
     earlier candidate
  4. optional TSD search (target-site duplication >= mintsd) in the
     vicinity of the boundaries.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.encseq import Encseq
from ..index.esa import build_esa
from ..match.maxpairs import enumerate_maxpairs
from ..ops.xdrop import XdropScores, xdrop_extend


@dataclass
class LTRPrediction:
    seqnum: int
    start1: int   # left LTR [start1, end1] inclusive, relative to seq
    end1: int
    start2: int
    end2: int
    similarity: float
    tsd_length: int = 0

    @property
    def element_range(self):
        return self.start1, self.end2


@dataclass
class LTRHarvestParams:
    seedlength: int = 30
    minlenltr: int = 100
    maxlenltr: int = 1000
    mindistltr: int = 1000
    maxdistltr: int = 15000
    similar: float = 85.0
    mintsd: int = 4
    maxtsd: int = 20
    xdropbelowscore: int = 5
    with_tsd: bool = False


def ltrharvest(encseq: Encseq, params: LTRHarvestParams | None = None
               ) -> list[LTRPrediction]:
    params = params or LTRHarvestParams()
    esa = build_esa(encseq)
    mp = enumerate_maxpairs(esa, params.seedlength)
    scores = XdropScores(2, -2, -3, -3)  # ref: ltrharvest arbitscores
    preds: list[LTRPrediction] = []
    seqnum_of = encseq.seqnum_of_pos

    a = np.minimum(mp.pos1, mp.pos2).astype(np.int64)
    b = np.maximum(mp.pos1, mp.pos2).astype(np.int64)
    order = np.argsort(a, kind="stable")
    for i in order:
        p1, p2, ln = int(a[i]), int(b[i]), int(mp.length[i])
        s1, s2 = int(seqnum_of(p1)), int(seqnum_of(p2))
        if s1 != s2:
            continue
        dist = p2 - p1
        if not (params.mindistltr <= dist <= params.maxdistltr):
            continue
        lo = int(encseq.seq_startpos(s1))
        hi = int(encseq.seq_endpos(s1))
        # left extension: before both instances, read right-to-left
        ul = encseq.codes[lo:p1][::-1]
        vl = encseq.codes[p1 + ln:p2][::-1][:p1 - lo + 1]
        bl = xdrop_extend(ul, vl, params.xdropbelowscore, scores)
        # right extension: after both instances
        ur = encseq.codes[p1 + ln:p2]
        vr = encseq.codes[p2 + ln:hi + 1]
        br = xdrop_extend(ur, vr, params.xdropbelowscore, scores)
        start1 = p1 - bl.ivalue
        end1 = p1 + ln - 1 + br.ivalue
        start2 = p2 - bl.jvalue
        end2 = p2 + ln - 1 + br.jvalue
        len1 = end1 - start1 + 1
        len2 = end2 - start2 + 1
        if not (params.minlenltr <= len1 <= params.maxlenltr):
            continue
        if not (params.minlenltr <= len2 <= params.maxlenltr):
            continue
        if end1 >= start2:  # LTRs must not overlap each other
            continue
        sim = _similarity(encseq.codes[start1:end1 + 1],
                          encseq.codes[start2:end2 + 1])
        if sim < params.similar:
            continue
        pred = LTRPrediction(s1, start1 - lo, end1 - lo, start2 - lo,
                             end2 - lo, sim)
        if params.with_tsd:
            _find_tsd(encseq, pred, lo, params)
        preds.append(pred)
    return _resolve_overlaps(preds)


def _similarity(u: np.ndarray, v: np.ndarray) -> float:
    """Percent identity of the two LTR candidates via greedy unit-cost
    distance (ref: similarity check in gt_searchforLTRs)."""
    from ..ops.greedy import greedy_extend
    d, best = greedy_extend(u, v, trim=False, perc_mat_history=0,
                            maxalignedlendifference=10 ** 9)
    alignedlen = len(u) + len(v)
    if d > alignedlen:
        return 0.0
    return 100.0 * (1.0 - 2.0 * d / alignedlen)


def _find_tsd(encseq: Encseq, pred: LTRPrediction, seqstart: int,
              params: LTRHarvestParams) -> None:
    """Search the longest exact repeat flanking the element boundaries
    (ref: gt_findcorrectboundaries / TSD search)."""
    codes = encseq.codes
    lo = seqstart
    left_end = lo + pred.start1          # exclusive end of left flank
    right_start = lo + pred.end2 + 1     # first pos after the element
    best = 0
    for tlen in range(params.maxtsd, params.mintsd - 1, -1):
        if left_end - tlen < lo:
            continue
        a = codes[left_end - tlen:left_end]
        b = codes[right_start:right_start + tlen]
        if a.size == tlen and b.size == tlen and (a == b).all() \
                and (a < 4).all():
            best = tlen
            break
    pred.tsd_length = best


def _resolve_overlaps(preds: list[LTRPrediction]) -> list[LTRPrediction]:
    """Drop candidates overlapping an already-accepted element
    (ref: ltrboundaries_overlap, ltrharvest_stream.c:1190)."""
    out: list[LTRPrediction] = []
    for p in sorted(preds, key=lambda x: (x.seqnum, x.start1, x.end2)):
        clash = any(q.seqnum == p.seqnum and
                    not (p.end2 < q.start1 or q.end2 < p.start1)
                    for q in out)
        if not clash:
            out.append(p)
    return out


def fasta_out_entries(preds: list[LTRPrediction], encseq: Encseq,
                      inner: bool = False, width: int = 60):
    """FASTA lines for prediction regions (capability of
    ltrharvest_fasta_out_stream/-visitor, ref:
    src/ltr/ltrharvest_fasta_out_visitor.c): header
    '<desc> (dbseq-nr N) [start,end]' with 1-based inclusive
    coordinates; inner=True emits the between-LTR region
    (leftLTR.end+1 .. rightLTR.start-1)."""
    import sys as _sys
    out = []
    for p in preds:
        if inner:
            lo1, hi1 = p.end1 + 2, p.start2        # 1-based inclusive
        else:
            lo1, hi1 = p.start1 + 1, p.end2 + 1
        if lo1 >= hi1:
            print(f"warning: trying to output empty"
                  f"{' inner' if inner else ''} sequence for candidate "
                  f"at {p.start1 + 1}-{p.end2 + 1} on sequence "
                  f"{p.seqnum}", file=_sys.stderr)
            continue
        desc = encseq.descs[p.seqnum] if p.seqnum < len(encseq.descs) \
            else ""
        start = int(encseq.seq_startpos(p.seqnum))
        codes = encseq.codes[start + lo1 - 1:start + hi1]
        text = encseq.alphabet.decode(codes)
        out.append(f">{desc} (dbseq-nr {p.seqnum}) [{lo1},{hi1}]")
        for i in range(0, len(text), width):
            out.append(text[i:i + width])
    return out


def tabout_lines(preds: list[LTRPrediction], encseq: Encseq | None = None,
                 longoutput: bool = False):
    """Tabular output rows (capability of ltrharvest_tabout_visitor.c);
    longoutput adds the TSD sequence + length columns when TSDs were
    searched (motif columns appear when motif annotation exists —
    PPT/PBS motifs live in ltrdigest here)."""
    lines = []
    for p in preds:
        cols = [f"{p.start1} {p.end2} {p.end2 - p.start1 + 1}",
                f"{p.start1} {p.end1} {p.end1 - p.start1 + 1}"]
        if longoutput and p.tsd_length and encseq is not None:
            s = int(encseq.seq_startpos(p.seqnum))
            lt = encseq.alphabet.decode(
                encseq.codes[s + p.start1 - p.tsd_length:s + p.start1])
            rt = encseq.alphabet.decode(
                encseq.codes[s + p.end2 + 1:s + p.end2 + 1 + p.tsd_length])
            cols.append(f"{lt} {p.tsd_length}")
        cols.append(f"{p.start2} {p.end2} {p.end2 - p.start2 + 1}")
        if longoutput and p.tsd_length and encseq is not None:
            cols.append(f"{rt} {p.tsd_length}")
        cols.append(f"{p.similarity:.2f} {p.seqnum}")
        lines.append(" ".join(cols))
    return lines


def gff3_nodes(preds: list[LTRPrediction], encseq: Encseq,
               seqids: bool = False):
    """Render predictions as GFF3 feature trees like `gt ltrharvest -gff3`
    (repeat_region > LTR_retrotransposon > long_terminal_repeat x2).
    seqids=True uses the sequence description's first word as the
    region id (ref: gt_ltrharvest.c -seqids)."""
    from ..anno.genome_node import FeatureNode
    nodes = []
    for p in preds:
        seqid = f"seq{p.seqnum}"
        if seqids and p.seqnum < len(encseq.descs):
            word = encseq.descs[p.seqnum].split()
            if word:
                seqid = word[0]
        region = FeatureNode(seqid, "repeat_region",
                             p.start1 + 1 - p.tsd_length,
                             p.end2 + 1 + p.tsd_length, "?", "LTRharvest")
        elem = FeatureNode(seqid, "LTR_retrotransposon", p.start1 + 1,
                           p.end2 + 1, "?", "LTRharvest")
        region.add_child(elem)
        for s, e in ((p.start1, p.end1), (p.start2, p.end2)):
            ltr = FeatureNode(seqid, "long_terminal_repeat", s + 1, e + 1,
                              "?", "LTRharvest")
            elem.add_child(ltr)
        nodes.append(region)
    return nodes
