"""LTRdigest: PPT and PBS annotation of LTR retrotransposons.

Capability equivalent of the reference LTRdigest feature annotators
(ref: src/ltr/ltrdigest_ppt_visitor.c, ltrdigest_pbs_visitor.c,
gt_ltrdigest.c): the polypurine tract (RR_tract + U_box) is found with
a 4-state HMM decoded around the 3' LTR start; the primer binding site
by Smith-Waterman alignment of tRNA 3' ends around the 5' LTR end.
The protein-domain (pHMM/HMMER) annotator is out of scope without
vendored HMMER.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..anno.genome_node import FeatureNode, Range
from ..utils.hmm import HMM

PPT_OUT, PPT_IN, PPT_UBOX, PPT_N = 0, 1, 2, 3

LTRDIGEST_TAG = "LTRdigest"


@dataclass
class LTRdigestParams:
    """Defaults mirror gt_ltrdigest.c option defaults."""

    ppt_len: tuple = (8, 30)
    ubox_len: tuple = (3, 30)
    ppt_radius: int = 30
    max_ubox_dist: int = 0
    ppt_purine_prob: float = 0.97
    ppt_pyrimidine_prob: float = 0.03
    bkg_a_prob: float = 0.25
    bkg_c_prob: float = 0.25
    bkg_g_prob: float = 0.25
    bkg_t_prob: float = 0.25
    ubox_u_prob: float = 0.91
    pbs_alilen: tuple = (11, 30)
    pbs_offsetlen: tuple = (0, 5)
    pbs_trnaoffsetlen: tuple = (0, 5)
    pbs_max_edist: int = 1
    pbs_radius: int = 30
    pbs_match: int = 5
    pbs_mismatch: int = -10
    pbs_insertion: int = -20
    pbs_deletion: int = -20


# DNA code order a=0 c=1 g=2 t=3, wildcard -> 4 ('n')
_CODE = {"a": 0, "c": 1, "g": 2, "t": 3}


def _encode5(seq: str) -> np.ndarray:
    return np.array([_CODE.get(c, 4) for c in seq.lower()], np.int64)


def _ppt_hmm(p: LTRdigestParams) -> HMM:
    """ref: ltrdigest_ppt_visitor.c:160 gt_ppt_hmm_new."""
    hmm = HMM(4, 5)
    B = hmm.B
    B[PPT_OUT, :4] = [p.bkg_a_prob, p.bkg_c_prob, p.bkg_g_prob,
                      p.bkg_t_prob]
    B[PPT_IN, :4] = [p.ppt_purine_prob / 2, p.ppt_pyrimidine_prob / 2,
                     p.ppt_purine_prob / 2, p.ppt_pyrimidine_prob / 2]
    nu = (1.0 - p.ubox_u_prob) / 3.0
    B[PPT_UBOX, :4] = [nu, nu, nu, p.ubox_u_prob]
    B[PPT_N, :4] = 0.0
    B[PPT_N, 4] = 1.0
    A = hmm.A
    A[:] = 0.0
    for i in range(4):
        for j in range(4):
            if i != j:
                A[i, j] = 0.05
        A[i, i] = 1.0 - A[i].sum()
    hmm.pi[:] = 0.25
    return hmm


@dataclass
class PPTHit:
    rng: Range            # genomic 1-based
    strand: str
    score: float
    ubox: Range | None = None


def ppt_find(element_seq: str, leftltr: Range, rightltr: Range,
             element_start: int, params: LTRdigestParams | None = None
             ) -> list[PPTHit]:
    """Find PPT candidates on both strands of one LTR element
    (ref: gt_ppt_find).  element_seq is the element's sequence;
    leftltr/rightltr are genomic 1-based LTR ranges;
    element_start is the element's genomic 1-based start."""
    params = params or LTRdigestParams()
    hmm = _ppt_hmm(params)
    seqlen = len(element_seq)
    from ..utils.seqtools import revcomp_str
    hits: list[PPTHit] = []
    for strand, seq, ltrlen in (
            ("+", element_seq, rightltr.length),
            ("-", revcomp_str(element_seq), leftltr.length)):
        radius = min(params.ppt_radius, ltrlen - 1)
        if radius < 1:
            continue
        enc = _encode5(seq)
        off = (seqlen - 1) - (ltrlen - 1) - radius - 1
        if off < 0 or off + 2 * radius + 1 > seqlen:
            continue
        decoded = hmm.viterbi(enc[off:off + 2 * radius + 1])
        hits += _group_hits(decoded, radius, strand, leftltr, rightltr,
                            params)
    hits.sort(key=lambda h: -h.score)
    return hits


def _window_to_genomic(start: int, end: int, strand: str, radius: int,
                       leftltr: Range, rightltr: Range) -> Range:
    """ref: gt_ppt_hit_get_coords."""
    if strand == "+":
        s = rightltr.start - 2 - radius + start
        return Range(s, s + (end - start))
    e = leftltr.end + radius - start
    return Range(e - (end - start), e)


def _group_hits(decoded, radius, strand, leftltr, rightltr, params):
    """Group the decoded state sequence into candidate stretches
    (ref: ltrdigest_ppt_visitor.c:293 gt_group_hits)."""
    out = []
    potential_ubox = None
    start = 0
    for i in range(2 * radius - 1):
        if decoded[i + 1] != decoded[i] or i + 2 == 2 * radius:
            state = int(decoded[i])
            length = i - start + 1
            if state == PPT_UBOX and \
                    params.ubox_len[0] <= length <= params.ubox_len[1]:
                potential_ubox = (start, i)
            elif state == PPT_IN and \
                    params.ppt_len[0] <= length <= params.ppt_len[1]:
                r2 = radius * radius
                score = (r2 - abs(radius - i) ** 2) / r2
                ubox = None
                if potential_ubox is not None:
                    if start - potential_ubox[1] <= params.max_ubox_dist:
                        ubox = _window_to_genomic(
                            potential_ubox[0], potential_ubox[1], strand,
                            radius, leftltr, rightltr)
                    potential_ubox = None
                out.append(PPTHit(
                    _window_to_genomic(start, i, strand, radius,
                                       leftltr, rightltr),
                    strand, score, ubox))
            else:
                potential_ubox = None
            start = i + 1
    return out


@dataclass
class PBSHit:
    rng: Range            # genomic 1-based
    strand: str
    trna: str
    trna_offset: int
    offset: int
    edist: int
    score: float


def pbs_find(element_seq: str, leftltr: Range, rightltr: Range,
             element_start: int, trna_lib: list[tuple[str, str]],
             params: LTRdigestParams | None = None) -> list[PBSHit]:
    """Smith-Waterman search of tRNA 3' ends around the 5' LTR end
    (ref: gt_pbs_find).  trna_lib = [(description, sequence)]."""
    params = params or LTRdigestParams()
    from ..core.alphabet import dna_alphabet
    from ..match.alignment import local_alignment
    from ..utils.seqtools import revcomp_str
    alpha = dna_alphabet()
    out: list[PBSHit] = []
    r = params.pbs_radius
    windows = []
    fw_off = leftltr.length - r
    if fw_off >= 0 and fw_off + 2 * r + 1 <= len(element_seq):
        windows.append(("+", element_seq[fw_off:fw_off + 2 * r + 1]))
    rev = revcomp_str(element_seq)
    rv_off = rightltr.length - r
    if rv_off >= 0 and rv_off + 2 * r + 1 <= len(rev):
        windows.append(("-", rev[rv_off:rv_off + 2 * r + 1]))
    for desc, trna in trna_lib:
        trna_from3 = revcomp_str(trna)
        for strand, window in windows:
            u = alpha.encode(window.encode())
            v = alpha.encode(trna_from3.encode())
            res = local_alignment(u, v, matchscore=params.pbs_match,
                                  mismatchscore=params.pbs_mismatch,
                                  gapscore=params.pbs_insertion)
            if res is None or res.score <= 0:
                continue
            # unit edit distance of the local alignment
            edist = 0
            ui, vi = res.ustart, res.vstart
            for op, c in res.eops:
                for _ in range(c):
                    if op == "M":
                        if window[ui].lower() != trna_from3[vi].lower():
                            edist += 1
                        ui += 1
                        vi += 1
                    elif op == "D":
                        edist += 1
                        ui += 1
                    else:
                        edist += 1
                        vi += 1
            alilen = res.uend - res.ustart + 1
            offset = abs(r - res.ustart)
            if not (edist <= params.pbs_max_edist and
                    params.pbs_offsetlen[0] <= offset
                    <= params.pbs_offsetlen[1] and
                    params.pbs_alilen[0] <= alilen
                    <= params.pbs_alilen[1] and
                    params.pbs_trnaoffsetlen[0] <= res.vstart
                    <= params.pbs_trnaoffsetlen[1]):
                continue
            penalties = 1.0 if (edist == 0 or offset == 0) \
                else float(edist * offset)
            score = (alilen *
                     ((len(trna) - res.vstart) / len(trna))) / penalties
            # genomic coords (ref: gt_pbs_hit_get_coords)
            if strand == "+":
                s = element_start + leftltr.length - r + res.ustart
                rng = Range(s, s + alilen - 1)
            else:
                e = element_start + len(element_seq) - 1 \
                    - (rightltr.length - r + res.ustart)
                rng = Range(e - alilen + 1, e)
            out.append(PBSHit(rng, strand, desc, res.vstart, offset,
                              edist, score))
    out.sort(key=lambda h: -h.score)
    return out


def ltrdigest(nodes, mapping, trna_lib=None,
              params: LTRdigestParams | None = None):
    """Annotate LTR_retrotransposon features with RR_tract / U_box and
    primer_binding_site children (in place; returns nodes)
    (ref: gt_ltrdigest.c stream)."""
    params = params or LTRdigestParams()
    for top in nodes:
        if not isinstance(top, FeatureNode):
            continue
        for fn in top.traverse():
            if fn.type != "LTR_retrotransposon":
                continue
            ltrs = sorted((c for c in fn.children
                           if c.type == "long_terminal_repeat"),
                          key=lambda c: c.range.start)
            if len(ltrs) != 2:
                continue
            leftltr, rightltr = ltrs[0].range, ltrs[1].range
            seq = mapping.get_sequence(fn.seqid, fn.range.start,
                                       fn.range.end)
            lrel = Range(leftltr.start - fn.range.start + 1,
                         leftltr.end - fn.range.start + 1)
            rrel = Range(rightltr.start - fn.range.start + 1,
                         rightltr.end - fn.range.start + 1)
            hits = ppt_find(seq, Range(leftltr.start, leftltr.end),
                            Range(rightltr.start, rightltr.end),
                            fn.range.start, params)
            strand = None
            if hits:
                best = hits[0]
                strand = best.strand
                ppt = FeatureNode(fn.seqid, "RR_tract", best.rng.start,
                                  best.rng.end, best.strand,
                                  LTRDIGEST_TAG)
                fn.add_child(ppt)
                if best.ubox is not None:
                    fn.add_child(FeatureNode(
                        fn.seqid, "U_box", best.ubox.start,
                        best.ubox.end, best.strand, LTRDIGEST_TAG))
            if trna_lib:
                pbs_hits = pbs_find(seq, lrel, rrel, fn.range.start,
                                    trna_lib, params)
                if pbs_hits:
                    b = pbs_hits[0]
                    pbs = FeatureNode(fn.seqid, "primer_binding_site",
                                      b.rng.start, b.rng.end, b.strand,
                                      LTRDIGEST_TAG, score=b.score)
                    # ref: ltrdigest_pbs_visitor.c:399-409
                    pbs.set_attribute("trna", b.trna)
                    pbs.set_attribute("trnaoffset", str(b.trna_offset))
                    pbs.set_attribute("pbsoffset", str(b.offset))
                    pbs.set_attribute("edist", str(b.edist))
                    fn.add_child(pbs)
                    if strand is None:
                        strand = b.strand
            if strand is not None:
                # ref: ltrdigest_ppt_visitor.c:498 sets the mainnode
                # strand; unknown-strand descendants follow suit
                fn.strand = strand
                for m in fn.traverse():
                    if m.strand in (".", "?"):
                        m.strand = strand
    return nodes


def ltrdigest_file_out(nodes, mapping, prefix: str,
                       seqnamelen: int = 20) -> None:
    """Tabular + FASTA file family of `gt ltrdigest -outfileprefix`
    (capability of ltrdigest_file_out_stream, ref:
    src/ltr/ltrdigest_file_out_stream.c): writes
    <prefix>_tabout.csv (header + one row per element),
    <prefix>_{5ltr,3ltr,complete,ppt,pbs}.fas."""

    def fa(path):
        return open(path, "w")

    def show(f, desc, seq, width=60):
        f.write(f">{desc}\n")
        for i in range(0, len(seq), width):
            f.write(seq[i:i + width] + "\n")

    tab = open(prefix + "_tabout.csv", "w")
    tab.write(
        "element start\telement end\telement length\tsequence\t"
        "lLTR start\tlLTR end\tlLTR length\t"
        "rLTR start\trLTR end\trLTR length\t"
        "lTSD start\tlTSD end\tlTSD motif\t"
        "rTSD start\trTSD end\trTSD motif\t"
        "PPT start\tPPT end\tPPT motif\tPPT strand\tPPT offset"
        "\tPBS start\tPBS end\tPBS strand\ttRNA\ttRNA motif\tPBS "
        "offset\ttRNA offset\tPBS/tRNA edist\n")
    f5 = fa(prefix + "_5ltr.fas")
    f3 = fa(prefix + "_3ltr.fas")
    fc = fa(prefix + "_complete.fas")
    fp = fa(prefix + "_ppt.fas")
    fb = fa(prefix + "_pbs.fas")
    try:
        for top in nodes:
            if not isinstance(top, FeatureNode):
                continue
            for fn in top.traverse():
                if fn.type != "LTR_retrotransposon":
                    continue
                ltrs = sorted((c for c in fn.children
                               if c.type == "long_terminal_repeat"),
                              key=lambda c: c.range.start)
                if len(ltrs) != 2:
                    continue
                sid = fn.seqid.replace(" ", "_")[:seqnamelen]
                er, lr, rr = fn.range, ltrs[0].range, ltrs[1].range
                desc = f"{sid}_{er.start}_{er.end}"
                row = [er.start, er.end, er.end - er.start + 1, sid,
                       lr.start, lr.end, lr.end - lr.start + 1,
                       rr.start, rr.end, rr.end - rr.start + 1]

                def seq_of(rng):
                    return mapping.get_sequence(fn.seqid, rng.start,
                                                rng.end)

                # on the minus strand 5'/3' LTR roles swap
                # (ref: gt_ltrelement_*ltrlen role logic)
                minus = fn.strand == "-"
                show(f5, f"{desc}_5ltr",
                     seq_of(rr if minus else lr))
                show(f3, f"{desc}_3ltr",
                     seq_of(lr if minus else rr))
                show(fc, desc, seq_of(er))
                kids = {c.type: c for c in fn.children}
                tsds = [c for c in (top.children
                                    if top.type == "repeat_region"
                                    else [])
                        if c.type == "target_site_duplication"]
                tsds = sorted(tsds, key=lambda c: c.range.start)
                for t in (tsds[:1], tsds[1:2]):
                    if t:
                        tr = t[0].range
                        row += [tr.start, tr.end, seq_of(tr)]
                    else:
                        row += ["", "", ""]
                ppt = kids.get("RR_tract")
                if ppt is not None:
                    pr = ppt.range
                    off = abs(rr.start - pr.end) \
                        if ppt.strand == "+" else abs(lr.end - pr.start)
                    row += [pr.start, pr.end, seq_of(pr), ppt.strand,
                            off]
                    show(fp, f"{desc}_ppt", seq_of(pr))
                else:
                    row += ["", "", "", "", ""]
                pbs = kids.get("primer_binding_site")
                if pbs is not None:
                    br = pbs.range
                    row += [br.start, br.end, pbs.strand,
                            pbs.get_attribute("trna") or "",
                            seq_of(br),
                            pbs.get_attribute("pbsoffset") or "",
                            pbs.get_attribute("trnaoffset") or "",
                            pbs.get_attribute("edist") or ""]
                    show(fb, f"{desc}_pbs", seq_of(br))
                else:
                    row += [""] * 8
                tab.write("\t".join(str(x) for x in row) + "\n")
    finally:
        for f in (tab, f5, f3, fc, fp, fb):
            f.close()
