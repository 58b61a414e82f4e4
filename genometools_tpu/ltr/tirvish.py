"""TIRvish — Terminal Inverted Repeat discovery.

Capability equivalent of the reference TIR stream + tool (ref:
src/extended/tir_stream.c, src/tools/gt_tir.c): seeds are maximal
repeats between a sequence and its reverse complement (discovered on
the MIRRORED encseq, ref: tir_stream.c:135 gt_tir_store_seeds over
gt_enumeratemaxpairs), each seed is xdrop-extended on both flanks with
arbitrary scores (ref: tir_stream.c:456 gt_tir_searchforTIRs), the TIR
pair is TSD-adjusted (best target-site duplication in the boundary
vicinities, ref: tir_stream.c:306 gt_tir_find_best_TSD), filtered by
arm similarity (greedy unit edit distance), sorted, overlap-resolved,
and emitted as the reference's GFF3 hierarchy (repeat_region >
target_site_duplication x2 + terminal_inverted_repeat_element >
terminal_inverted_repeat x2, ref: tir_stream.c:878-944).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.encseq import Encseq


@dataclass
class TIRvishParams:
    """Defaults mirror gt tirvish (ref: src/tools/gt_tir.c:142-233)."""
    min_seed_length: int = 20
    min_tir_length: int = 100
    max_tir_length: int = 1000
    min_tir_distance: int = 500
    max_tir_distance: int = 10000
    mat: int = 2
    mis: int = -2
    ins: int = -3
    dele: int = -3
    xdrop_belowscore: int = 5
    similarity_threshold: float = 85.0
    min_tsd_length: int = 2
    max_tsd_length: int = 11
    vicinity: int = 60
    overlaps: str = "best"          # best | longest | no | all


@dataclass
class TIRPair:
    contignumber: int
    left_tir_start: int
    left_tir_end: int
    right_tir_start: int            # mirror coordinates (revcomp half)
    right_tir_end: int
    right_transformed_start: int
    right_transformed_end: int
    similarity: float = 0.0
    tsd_length: int = 0
    skip: bool = False


def _xdrop_extend(u: np.ndarray, v: np.ndarray, p: TIRvishParams):
    """gt_evalxdroparbitscoresextend on forward windows; returns
    (ivalue, jvalue)."""
    from ..ops.xdrop import XdropScores, xdrop_extend
    if u.size == 0 or v.size == 0:
        return 0, 0
    scores = XdropScores(mat=p.mat, mis=p.mis, ins=p.ins, del_=p.dele)
    best = xdrop_extend(u, v, p.xdrop_belowscore, scores)
    return int(best.ivalue), int(best.jvalue)


def _unit_edist(u: np.ndarray, v: np.ndarray) -> int:
    """greedyunitedist (ref: tir_stream.c:612): unit-cost edit distance
    of the two arms — O((n+m)d) greedy diagonal front."""
    n, m = u.size, v.size
    if n == 0 or m == 0:
        return max(n, m)
    # Myers O(nd) greedy: fronts over diagonals
    maxd = n + m
    off = maxd
    V = np.full(2 * maxd + 2, -1, np.int64)
    V[off + 1] = 0
    for d in range(maxd + 1):
        for k in range(-d, d + 1, 2):
            if k == -d or (k != d and V[off + k - 1] < V[off + k + 1]):
                x = V[off + k + 1]
            else:
                x = V[off + k - 1] + 1
            y = x - k
            while x < n and y < m and u[x] == v[y] and u[x] < 4 \
                    and v[y] < 4:
                x += 1
                y += 1
            V[off + k] = x
            if x >= n and y >= m:
                return d
    return maxd


def _tsd_matches(db: np.ndarray, query: np.ndarray, minlen: int):
    """gt_sarrquerysubstringmatch equivalent: for each query position,
    the longest db-matching prefix; every db occurrence reported when
    >= minlen. Yields (dbstart, querystart, length)."""
    n = db.size
    out = []
    for q0 in range(query.size):
        if query[q0] >= 4:
            continue
        best = 0
        for s in range(n):
            l = 0
            while (s + l < n and q0 + l < query.size
                   and db[s + l] < 4 and query[q0 + l] < 4
                   and db[s + l] == query[q0 + l]):
                l += 1
            if l > best:
                best = l
        if best >= minlen:
            for s in range(n):
                l = 0
                while (s + l < n and q0 + l < query.size
                       and db[s + l] < 4 and query[q0 + l] < 4
                       and db[s + l] == query[q0 + l]):
                    l += 1
                if l == best:
                    out.append((s, q0, best))
    return out


def tirvish(encseq: Encseq, params: TIRvishParams | None = None
            ) -> list[TIRPair]:
    """Run the full TIR pipeline on an (unmirrored) encseq."""
    from ..index.esa import build_esa
    from ..match.maxpairs import enumerate_maxpairs
    p = params or TIRvishParams()
    m = encseq.mirror()
    codes = m.codes
    total = m.total_length
    midpos = encseq.total_length          # the mirror separator
    nseq_m = m.num_sequences

    esa = build_esa(m)
    mp = enumerate_maxpairs(esa, p.min_seed_length)

    pairs: list[TIRPair] = []
    order = np.arange(mp.count)
    for i in order:
        pos1 = int(min(mp.pos1[i], mp.pos2[i]))
        pos2 = int(max(mp.pos1[i], mp.pos2[i]))
        slen = int(mp.length[i])
        # seed must span the two halves (ref: tir_stream.c:153)
        if pos1 > midpos or pos2 < midpos:
            continue
        distance = (total - 1 - pos2 - slen + 1) - pos1
        if distance < p.min_tir_distance or distance > p.max_tir_distance:
            continue
        seq1 = int(m.seqnum_of_pos(pos1))
        seq2 = int(m.seqnum_of_pos(pos2))
        if seq2 != nseq_m - seq1 - 1:
            continue
        if slen > p.max_tir_length:
            continue

        seqstart1 = int(m.seq_startpos(seq1))
        seqend1 = seqstart1 + int(m.seq_length(seq1))
        seqstart2 = total - seqend1
        seqend2 = total - seqstart1
        alilen = p.max_tir_length - slen

        # left xdrop on reversed prefixes (ref: tir_stream.c:495-523)
        li = lj = 0
        if alilen and pos1 > seqstart1 and pos2 > seqstart2:
            ext = min(alilen, pos1 - seqstart1, pos2 - seqstart2)
            u = codes[pos1 - ext:pos1][::-1].copy()
            v = codes[pos2 - ext:pos2][::-1].copy()
            li, lj = _xdrop_extend(u, v, p)
        # right xdrop on forward suffixes
        ri = rj = 0
        if alilen and pos1 + slen < seqend1 and pos2 + slen < seqend2:
            ext = min(alilen, seqend1 - (pos1 + slen),
                      seqend2 - (pos2 + slen))
            u = codes[pos1 + slen:pos1 + slen + ext]
            v = codes[pos2 + slen:pos2 + slen + ext]
            ri, rj = _xdrop_extend(u, v, p)

        left_start = pos1 - li
        left_end = pos1 + slen - 1 + ri
        right_start = pos2 - lj
        right_end = pos2 + slen - 1 + rj
        tirlen = left_end - left_start
        if tirlen < p.min_tir_length or tirlen > p.max_tir_length:
            continue

        pair = TIRPair(
            contignumber=seq1,
            left_tir_start=left_start,
            left_tir_end=left_end,
            right_tir_start=right_start,
            right_tir_end=right_end,
            right_transformed_start=total - 1 - right_end,
            right_transformed_end=total - 1 - right_start)

        _search_tsds(m, pair, p, seqstart1,
                     seqstart1 + int(m.seq_length(seq1)) - 1)
        if not pair.skip and (pair.left_tir_end <= pair.left_tir_start
                              or pair.right_transformed_end
                              <= pair.right_transformed_start):
            pair.skip = True
        if not pair.skip:
            # reference compares the (TSD-adjusted) left arm to the
            # right arm IN MIRROR COORDINATES - i.e. already in the
            # left arm's orientation (ref: tir_stream.c:606-616)
            u = codes[pair.left_tir_start:pair.left_tir_end]
            v = codes[pair.right_tir_start:pair.right_tir_end]
            edist = _unit_edist(u, v)
            pair.similarity = 100.0 * (1.0 - edist / max(u.size, v.size))
            if pair.similarity < p.similarity_threshold:
                pair.skip = True
        pairs.append(pair)

    pairs.sort(key=lambda q: (q.contignumber, q.left_tir_start,
                              q.right_transformed_start))
    if p.overlaps in ("best", "longest", "no"):
        _remove_overlaps(pairs, p.overlaps)
    return [q for q in pairs if not q.skip]


def _search_tsds(m: Encseq, pair: TIRPair, p: TIRvishParams,
                 seq_start: int, seq_end: int) -> None:
    """ref: tir_stream.c:368 gt_tir_search_for_TSDs + find_best_TSD."""
    if p.min_tsd_length <= 1:
        return
    codes = m.codes
    start_left = max(seq_start, pair.left_tir_start - p.vicinity)
    end_left = min(pair.left_tir_end,
                   pair.left_tir_start + p.vicinity)
    start_right = max(pair.right_transformed_start,
                      pair.right_transformed_end - p.vicinity)
    end_right = min(seq_end, pair.right_transformed_end + p.vicinity)
    db = codes[start_left:end_left + 1]
    query = codes[start_right:end_right + 1]
    tsds = _tsd_matches(db, query, p.min_tsd_length)
    best_cost = None
    new_left = pair.left_tir_start
    new_right = pair.right_transformed_end
    best_len = 0
    for s, q0, tlen in tsds:
        pos1 = start_left + s
        offset = (start_right + q0) - pos1
        if tlen < p.min_tsd_length or tlen >= p.max_tsd_length:
            continue
        cost_left = abs((pos1 + tlen - 1) - pair.left_tir_start)
        cost_right = abs((pos1 + offset) - pair.right_transformed_end)
        cost = cost_left + cost_right
        if best_cost is None or cost < best_cost:
            best_cost = cost
            new_left = pos1 + tlen
            new_right = pos1 + offset - 1
            best_len = tlen
    if tsds:
        pair.left_tir_start = new_left
        pair.right_transformed_end = new_right
        pair.tsd_length = best_len
    else:
        pair.skip = True
    if pair.right_transformed_end <= pair.right_transformed_start:
        pair.skip = True
    if pair.left_tir_end <= pair.left_tir_start:
        pair.skip = True
    if pair.tsd_length == 0:
        pair.skip = True


def _remove_overlaps(pairs: list[TIRPair], mode: str) -> None:
    """ref: tir_stream.c:220 gt_tir_remove_overlaps."""
    live = [q for q in pairs if not q.skip]
    if not live:
        return
    ref_start = live[0].left_tir_start
    ref_end = live[0].right_transformed_end
    old = best = longest = live[0]
    for b in live[1:]:
        if b.left_tir_start <= ref_end and ref_start \
                <= b.right_transformed_end:
            ref_end = max(b.right_transformed_end, ref_end)
            if mode == "no":
                old.skip = True
                b.skip = True
            elif mode == "longest":
                if (longest.right_transformed_end
                        - longest.left_tir_start) < \
                        (b.right_transformed_end - b.left_tir_start):
                    longest.skip = True
                    longest = b
                else:
                    b.skip = True
            else:
                if best.similarity < b.similarity:
                    best.skip = True
                    best = b
                else:
                    b.skip = True
        else:
            old = best = longest = b
            ref_start = b.left_tir_start
            ref_end = b.right_transformed_end


def gff3_nodes(pairs: list[TIRPair], encseq: Encseq):
    """The reference's GFF3 hierarchy (ref: tir_stream.c:878-944);
    coordinates 1-based relative to the contig."""
    from ..anno.genome_node import FeatureNode, RegionNode
    mirrored = encseq.mirror()
    nodes = []
    with_tsd = any(q.tsd_length for q in pairs)
    regions: dict[int, tuple[int, int]] = {}
    for q in pairs:
        s0 = int(mirrored.seq_startpos(q.contignumber))
        a = q.left_tir_start - s0 - q.tsd_length + 1
        b = q.right_transformed_end - s0 + q.tsd_length + 1
        lo, hi = regions.get(q.contignumber, (a, b))
        regions[q.contignumber] = (min(lo, a), max(hi, b))
    for cn in sorted(regions):
        nodes.append(RegionNode(f"seq{cn}", *regions[cn]))
    for q in pairs:
        s0 = int(mirrored.seq_startpos(q.contignumber))
        seqid = f"seq{q.contignumber}"
        region = FeatureNode(
            seqid, "repeat_region",
            q.left_tir_start - s0 - q.tsd_length + 1,
            q.right_transformed_end - s0 + q.tsd_length + 1,
            "?", "TIRvish")
        if q.tsd_length and with_tsd:
            region.add_child(FeatureNode(
                seqid, "target_site_duplication",
                q.left_tir_start - s0 + 1 - q.tsd_length,
                q.left_tir_start - s0, "?", "TIRvish"))
            region.add_child(FeatureNode(
                seqid, "target_site_duplication",
                q.right_transformed_end - s0 + 2,
                q.right_transformed_end - s0 + 1 + q.tsd_length,
                "?", "TIRvish"))
        elem = FeatureNode(
            seqid, "terminal_inverted_repeat_element",
            q.left_tir_start - s0 + 1,
            q.right_transformed_end - s0 + 1, "?", "TIRvish")
        elem.attributes["tir_similarity"] = f"{q.similarity:.2f}"
        region.add_child(elem)
        elem.add_child(FeatureNode(seqid, "terminal_inverted_repeat",
                                   q.left_tir_start - s0 + 1,
                                   q.left_tir_end - s0 + 1, "?",
                                   "TIRvish"))
        elem.add_child(FeatureNode(seqid, "terminal_inverted_repeat",
                                   q.right_transformed_start - s0 + 1,
                                   q.right_transformed_end - s0 + 1, "?",
                                   "TIRvish"))
        nodes.append(region)
    return nodes


def refseq_match_annotate(nodes, encseq, refseq_paths,
                          min_ali_len_perc: float = 10.0,
                          flcands: bool = False,
                          source: str = "GenomeTools"):
    """Annotate candidate elements with their best reference-sequence
    match (capability of ltr_refseq_match_stream, ref:
    src/ltr/ltr_refseq_match_stream.c) — the reference shells out to
    BLASTN; here the in-house seed_extend greedy engine does the
    matching natively.  Adds a `nucleotide_match` child (target = the
    refseq description, similarity + match coordinates as attributes)
    to every element whose best alignment covers at least
    ``min_ali_len_perc`` percent of the element."""
    from ..anno.genome_node import FeatureNode
    from ..core.encseq import Encseq
    from ..match.seed_extend import SeedExtendParams, seed_extend

    ref = Encseq.from_files(list(refseq_paths))
    params = SeedExtendParams(minidentity=80, extension="greedy",
                              userdefinedleastlength=20)
    for top in nodes:
        if not isinstance(top, FeatureNode):
            continue
        for fn in top.traverse():
            if fn.type not in ("LTR_retrotransposon",
                               "terminal_inverted_repeat_element",
                               "repeat_region"):
                continue
            if fn.type == "repeat_region":
                continue
            rng = fn.range
            seqnum = 0
            try:
                seqnum = int(fn.get_attribute("seq_number") or 0)
            except (TypeError, ValueError):
                pass
            start = int(encseq.seq_startpos(seqnum))
            sub = encseq.codes[start + rng.start - 1:start + rng.end]
            cand = Encseq.from_codes(sub) if hasattr(Encseq,
                                                     "from_codes") \
                else None
            if cand is None:
                from ..core.alphabet import dna_alphabet
                cand = Encseq.from_string(
                    dna_alphabet().decode(sub))
            matches = seed_extend(cand, ref, params)
            if not matches:
                continue
            best = max(matches, key=lambda m: m.dblen)
            elen = rng.end - rng.start + 1
            if 100.0 * best.dblen / elen < min_ali_len_perc:
                continue
            if flcands and best.dblen < elen:
                continue
            desc = ref.descs[best.queryseqnum] \
                if best.queryseqnum < len(ref.descs) else ""
            child = FeatureNode(fn.seqid, "nucleotide_match",
                                rng.start + best.dbstart,
                                rng.start + best.dbstart +
                                best.dblen - 1,
                                best.direction == "P" and "-" or "+",
                                source)
            child.set_attribute("target", desc.split()[0] if desc
                                else "unknown")
            child.set_attribute("similarity",
                                f"{best.identity:.2f}")
            child.set_attribute("matchlen", str(best.dblen))
            fn.add_child(child)
    return nodes
