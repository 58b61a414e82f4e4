"""repfind: maximal exact repeats with reference-format reporting.

Capability equivalent of `gt repfind` (ref: src/tools/gt_repfind.c).
Output lines follow the reference querymatch format for self matches
(ref: src/match/querymatch.c:431 prettyprint):

    len1 seqnum1 relpos1 F len2 seqnum2 relpos2

with the instance at the smaller absolute position printed first, and `P`
(here: R per golden files) for palindromic (-r) matches against the
reverse complement.

Validated against the reference golden files
testdata/repfind-result/{Duplicate.fna.result, Atinsert-8-8, ...}.
"""

from __future__ import annotations

import numpy as np

from ..core.encseq import FWD, Encseq
from ..index.esa import EnhancedSuffixArray, build_esa
from .maxpairs import MaxPairs, enumerate_maxpairs


def _format_rows(encseq: Encseq, p1: np.ndarray, p2: np.ndarray,
                 length: np.ndarray, direction: str) -> np.ndarray:
    """(len, seq1, rel1, len, seq2, rel2) int rows, smaller abs pos first."""
    a = np.minimum(p1, p2).astype(np.int64)
    b = np.maximum(p1, p2).astype(np.int64)
    s1 = encseq.seqnum_of_pos(a)
    s2 = encseq.seqnum_of_pos(b)
    r1 = a - encseq.seq_startpos(s1)
    r2 = b - encseq.seq_startpos(s2)
    return np.stack([length, s1, r1, length, s2, r2], axis=1)


def repfind_self(encseq: Encseq, minlength: int,
                 esa: EnhancedSuffixArray | None = None,
                 parts_memlimit: int | None = None) -> np.ndarray:
    """Forward self maximal repeats (gt repfind -l). Returns int rows
    (len, seq1, rel1, len, seq2, rel2).

    parts_memlimit (max suffixes resident at once) switches to the
    memory-bounded streamed execution: the code-range parts engine
    produces (suf, lcp) segments that feed the streaming bottom-up
    walker — the suffix table never exists whole in RAM (ref model:
    -parts/-memlimit sfx-partssuf.c:172 + esa-seqread.h:27)."""
    if parts_memlimit is not None:
        from ..index.seqread import SequentialSuffixArrayReader
        from .maxpairs import enumerate_maxpairs_stream
        rd = SequentialSuffixArrayReader.from_parts(
            encseq.codes, parts_memlimit, encseq.alphabet.num_chars)
        mp = enumerate_maxpairs_stream(rd, encseq, minlength)
        return _format_rows(encseq, mp.pos1, mp.pos2, mp.length, "F")
    if esa is None:
        esa = build_esa(encseq, FWD)
    mp = enumerate_maxpairs(esa, minlength)
    return _format_rows(encseq, mp.pos1, mp.pos2, mp.length, "F")


def _repfind_transformed(encseq: Encseq, minlength: int,
                         complement: bool,
                         esa: EnhancedSuffixArray | None = None
                         ) -> np.ndarray:
    """Matches between the sequence set and its reverse (-r) or reverse
    complement (-p), byte-ordered like the reference.

    Match *set*: concatenate seq + SEPARATOR + transformed(seq) and run
    the forward maxpairs engine, keeping cross-half pairs. Each concat
    pair (p in half 1, q in half 2) IS one directed iterator event of
    the reference's query-substring machinery (ref: esa-mmsearch.c:847
    gt_querysubstringmatchiterator_next over the encseq read in
    GT_READMODE_{REVERSE,REVCOMPL}): the db occurrence is p, the query
    occurrence's forward image starts at fpos = 2n - q - (len-1), and
    the concat pair's left/right-maximality equals the event's
    db-left-maximality + maximal extendright length.

    Reference gating and order are then applied exactly:
      * gt_querymatch_ordered with force_order (default true,
        ref: querymatch.c:73,357): print iff dbseq < queryseq, or same
        sequence and dbrel <= querystart_fwdstrand;
      * emission order = (query unit ascending, reverse-readmode offset
        ascending, db hits in suftab order) — offset o relates to the
        printed forward-strand position by o = seqlen - qrel - len.
    """
    from ..core.chardef import SEPARATOR, is_special as _issp
    n = encseq.total_length
    tr = encseq.codes[::-1]
    if complement:
        comp = encseq.alphabet.complement_table()
        tr = np.where(_issp(tr), tr, comp[tr])
    codes = np.concatenate([encseq.codes, [SEPARATOR], tr]).astype(np.uint8)
    ssp = np.concatenate([encseq.ssp, [n],
                          2 * n - encseq.ssp[::-1]]).astype(np.int64)
    m = Encseq(codes, ssp, encseq.descs + encseq.descs[::-1],
               encseq.alphabet)
    cesa = build_esa(m, FWD)
    mp = enumerate_maxpairs(cesa, minlength)
    p1, p2, ln = mp.pos1.astype(np.int64), mp.pos2.astype(np.int64), \
        mp.length.astype(np.int64)
    lo = np.minimum(p1, p2)
    hi = np.maximum(p1, p2)
    keep = (lo < n) & (hi > n)
    db, hi, ln = lo[keep], hi[keep], ln[keep]
    fpos = 2 * n - hi - (ln - 1)

    dbseq = encseq.seqnum_of_pos(db)
    dbrel = db - encseq.seq_startpos(dbseq)
    qseq = encseq.seqnum_of_pos(fpos)
    qrel = fpos - encseq.seq_startpos(qseq)  # == querystart_fwdstrand
    keep2 = (dbseq < qseq) | ((dbseq == qseq) & (dbrel <= qrel))
    dbseq, dbrel, qseq, qrel, db, ln = (a[keep2] for a in
                                        (dbseq, dbrel, qseq, qrel, db, ln))

    if esa is None:
        esa = build_esa(encseq, FWD)
    rank = np.empty(esa.suftab.size, np.int64)
    rank[esa.suftab] = np.arange(esa.suftab.size)
    off = encseq.seq_length(qseq) - qrel - ln
    order = np.lexsort((rank[db], off, qseq))
    rows = np.stack([ln, dbseq, dbrel, ln, qseq, qrel], axis=1)
    return rows[order]


def repfind_reverse(encseq: Encseq, minlength: int,
                    esa: EnhancedSuffixArray | None = None) -> np.ndarray:
    """Reverse matches (gt repfind -r, direction letter R): substring at
    pos1 read forward equals substring at pos2 read backward."""
    return _repfind_transformed(encseq, minlength, complement=False,
                                esa=esa)


def repfind_palindromic(encseq: Encseq, minlength: int,
                        esa: EnhancedSuffixArray | None = None) -> np.ndarray:
    """Reverse-strand matches (gt repfind -p, direction letter P)."""
    return _repfind_transformed(encseq, minlength, complement=True,
                                esa=esa)


def repfind_extend(encseq: Encseq, minlength: int,
                   extension: str = "greedy", minidentity: int = 90,
                   maxalignedlendifference: int = 30,
                   perc_mat_history: int = 55, history: int = 64,
                   esa: EnhancedSuffixArray | None = None) -> list:
    """repfind -extendgreedy/-extendxdrop: extend every maximal pair
    (ref: gt_rf_extend_selfmatch_with_output, seed-extend.c:1457).

    Returns SeedExtendMatch records in the reference's 10-column format.
    Validated against repfind-result/Duplicate.fna-greedy-8-8-90-30-55.
    """
    from ..ops.greedy import PolishingInfo
    from ..ops.xdrop import optimal_xdrop_belowscore
    from .seed_extend import SeedExtendMatch, _extend_one_seed, \
        _score2distance, _seq_codes

    if esa is None:
        esa = build_esa(encseq, FWD)
    mp = enumerate_maxpairs(esa, minlength)
    errorpercentage = 100 - minidentity
    greedy_ctx = None
    belowscore = 0
    if extension == "greedy":
        pol = PolishingInfo.new(float(errorpercentage), history)
        greedy_ctx = (pol, perc_mat_history, maxalignedlendifference,
                      history)
    else:
        belowscore = optimal_xdrop_belowscore(errorpercentage, 97)

    out = []
    seq_cache = {}

    def seq_of(s):
        if s not in seq_cache:
            seq_cache[s] = _seq_codes(encseq, s, False)
        return seq_cache[s]

    a = np.minimum(mp.pos1, mp.pos2).astype(np.int64)
    b = np.maximum(mp.pos1, mp.pos2).astype(np.int64)
    for p1, p2, ln in zip(a, b, mp.length.astype(np.int64)):
        s1 = int(encseq.seqnum_of_pos(p1))
        s2 = int(encseq.seqnum_of_pos(p2))
        r1 = int(p1 - encseq.seq_startpos(s1))
        r2 = int(p2 - encseq.seq_startpos(s2))
        same_seq = s1 == s2
        from ..ops.xdrop import XdropScores
        ext = _extend_one_seed(seq_of(s1), seq_of(s2), same_seq, r1, r2,
                               int(ln), belowscore, XdropScores(),
                               greedy_ctx)
        if ext is None:
            continue
        u_l, v_l, sd_l, u_r, v_r, sd_r, _mml, _mmr = ext
        dblen = int(ln) + u_l + u_r
        querylen = int(ln) + v_l + v_r
        alignedlen = dblen + querylen
        if extension == "greedy":
            dist = sd_l + sd_r
            score = alignedlen - 3 * dist
        else:
            score = 2 * int(ln) + sd_l + sd_r
            dist = _score2distance(score, alignedlen)
        err = 200.0 * dist / alignedlen
        if err > errorpercentage or alignedlen < 2 * minlength:
            continue
        out.append(SeedExtendMatch(
            dblen, s1, r1 - u_l, "F", querylen, s2, r2 - v_l,
            score, dist, 100.0 - err))
    return out


def format_match_lines(rows: np.ndarray, direction: str = "F") -> list[str]:
    d = f" {direction} "
    return [f"{a} {b} {c}{d}{x} {y} {z}"
            for a, b, c, x, y, z in rows.tolist()]


def write_match_lines(out, rows: np.ndarray, direction: str = "F",
                      chunk: int = 1 << 17) -> None:
    """Bulk emission: the C formatter writes straight to the output fd
    when one exists (an itoa loop instead of per-row Python
    formatting); otherwise join+write in chunks. Callers must emit
    nothing else between bulk calls on the same stream (the C side
    appends through its own fd)."""
    if rows.shape[0] > (1 << 14):
        try:
            fd = out.fileno()
        except Exception:
            fd = None
        if fd is not None:
            from ..core.native import write_match_lines_native
            out.flush()
            if write_match_lines_native(rows, direction,
                                        f"/dev/fd/{fd}", True):
                return
    d = f" {direction} "
    lst = rows.tolist()
    for s in range(0, len(lst), chunk):
        out.write("\n".join(
            f"{a} {b} {c}{d}{x} {y} {z}"
            for a, b, c, x, y, z in lst[s:s + chunk]))
        out.write("\n")


def parse_result_file(path: str) -> np.ndarray:
    """Parse a reference repfind .result file into canonical rows."""
    rows = []
    dirs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            rows.append([int(parts[0]), int(parts[1]), int(parts[2]),
                         int(parts[4]), int(parts[5]), int(parts[6])])
            dirs.append(parts[3])
    return np.asarray(rows, np.int64), dirs


def canonical_sort(rows: np.ndarray) -> np.ndarray:
    if rows.size == 0:
        return rows.reshape(0, 6)
    order = np.lexsort(tuple(rows[:, i] for i in (5, 4, 2, 1, 0)))
    return rows[order]
