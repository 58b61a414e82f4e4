"""CDS addition (gt cds) + region mapping.

Capability equivalents of the reference CDS machinery
(ref: src/extended/cds_visitor.c, splicedseq.c, src/core/orf.c,
src/extended/region_mapping.c, seqid2seqnum_mapping.c,
src/core/bioseq_col.c grep_desc, tools/gt_cds.c): extract the spliced
exon sequence of each transcript, find ORFs in all three frames, and
add the longest one as (multi-segment) CDS features.

Validated against testdata/gt_cds_test_{1..14}.out,
gt_cds_test_descrange.out, gt_cds_descrange_multi.out, U89959_cds.gff3,
gt_cds_nostartcodon_nofinalstopcodon.out and nGASP/resIIIcds.gff3.
"""

from __future__ import annotations

import numpy as np

from ..utils.seqtools import revcomp_str, translate_dna
from .genome_node import FeatureNode, GenomeNode, Range

_STOP = "*"
_START = "M"


# ---------------------------------------------------------------------------
# region mapping (-seqfile + -matchdesc / -usedesc)
# ---------------------------------------------------------------------------

def _parse_description_range(desc: str):
    """'ID:start..end' -> (id, Range) or None
    (ref: core/parseutils.c gt_parse_description_range)."""
    if ":" not in desc:
        return None
    ident, _, rest = desc.partition(":")
    if ".." not in rest:
        return None
    s, _, e = rest.partition("..")
    try:
        start, end = int(s), int(e)
    except ValueError:
        return None
    if start > end:
        return None
    return ident, Range(start, end)


class RegionMapping:
    """seqid -> sequence resolution (ref: region_mapping.c).

    matchdesc: seqid matched as a substring of sequence descriptions
    (ref: bioseq_col.c:56 grep_desc).  usedesc: descriptions of the
    form 'ID:start..end' define coordinate offsets
    (ref: seqid2seqnum_mapping.c).
    """

    def __init__(self, descs: list[str], seqs: list[str],
                 matchdesc: bool = False, usedesc: bool = False):
        self.descs = descs
        self.seqs = seqs
        self.matchdesc = matchdesc
        self.usedesc = usedesc
        self._grep_cache: dict[str, int] = {}
        if usedesc:
            # ref: seqid2seqnum_mapping.c fill_mapping/handle_description
            self.id_map: dict[str, list] = {}
            for i, desc in enumerate(descs):
                parsed = _parse_description_range(desc)
                if parsed is None:
                    ident, rng = desc, None
                else:
                    ident, rng = parsed
                entries = self.id_map.setdefault(ident, [])
                if entries and (rng is None or entries[0][0] is None):
                    raise ValueError(
                        f"input sequence(s) contain multiple sequences "
                        f'with ID "{ident}" and not all of them have '
                        f"description ranges")
                entries.append((rng, i))

    @classmethod
    def from_file(cls, path: str, matchdesc: bool = False,
                  usedesc: bool = False) -> "RegionMapping":
        from ..core.seqio import read_seqfile
        ss = read_seqfile(path)
        return cls(ss.descs,
                   [s.tobytes().decode("latin-1") for s in ss.seqs],
                   matchdesc=matchdesc, usedesc=usedesc)

    @classmethod
    def from_encseq(cls, indexname: str, matchdesc: bool = False,
                    usedesc: bool = False) -> "RegionMapping":
        """ref: region_mapping.c gt_region_mapping_new_encseq."""
        from ..core.encseq import Encseq
        e = Encseq.load(indexname)
        seqs = []
        for i in range(e.num_sequences):
            start = int(e.seq_startpos(i))
            seqs.append(e.extract_decoded(start,
                                          start + int(e.seq_length(i)) - 1))
        return cls(list(e.descs), seqs, matchdesc=matchdesc,
                   usedesc=usedesc)

    def _grep_desc(self, seqid: str) -> int:
        if seqid in self._grep_cache:
            return self._grep_cache[seqid]
        hits = [i for i, d in enumerate(self.descs) if seqid in d]
        if len(hits) > 1:
            raise ValueError(f"query seqid '{seqid}' could match more "
                             f"than one sequence description")
        if not hits:
            raise ValueError(
                f"no description matched sequence ID '{seqid}'")
        self._grep_cache[seqid] = hits[0]
        return hits[0]

    def get_sequence(self, seqid: str, start: int, end: int) -> str:
        """Extract [start, end] (1-based inclusive) for seqid
        (ref: region_mapping.c:213 gt_region_mapping_get_sequence)."""
        if self.usedesc:
            entries = self.id_map.get(seqid)
            entry = None
            if entries:
                for rng, i in entries:
                    if rng is None or (rng.start <= start and
                                       end <= rng.end):
                        entry = (rng, i)
                        break
            if entry is None:
                raise ValueError(f'cannot find a sequence with ID '
                                 f'"{seqid}" {{range {start},{end})')
            rng, i = entry
            offset = rng.start if rng is not None else 1
            seq = self.seqs[i]
            if end >= len(seq) + offset:
                raise ValueError(
                    f"trying to extract range {start}-{end} on sequence "
                    f"``{seqid}'' which is not covered by that sequence "
                    f"(with boundaries {rng.start}-{rng.end}). Has the "
                    f"sequence-region to sequence mapping been defined "
                    f"correctly?")
            return seq[start - offset:end - offset + 1]
        # matchdesc (also the plain-seqfile default path goes through
        # description matching in practice)
        i = self._grep_desc(seqid)
        seq = self.seqs[i]
        if start - 1 > len(seq) - 1 or end - 1 > len(seq) - 1:
            raise ValueError(
                f"trying to extract range {start - 1}-{end - 1} on "
                f"sequence ``{seqid}'' which is not covered by that "
                f"sequence (only {len(seq)} characters in size). Has the "
                f"sequence-region to sequence mapping been defined "
                f"correctly?")
        return seq[start - 1:end]


# ---------------------------------------------------------------------------
# ORF determination (ref: src/core/orf.c gt_determine_ORFs)
# ---------------------------------------------------------------------------

def determine_orfs(frame: str, framenum: int, start_codon: bool,
                   final_stop_codon: bool) -> list[tuple[int, int]]:
    """ORFs of one translated frame as nt ranges in transcript coords;
    the stop codon is included in the ORF."""
    orfs = []
    start = None
    for i, aa in enumerate(frame):
        if start is None:
            if start_codon:
                if aa == _START:
                    start = i * 3 + framenum
            else:
                if i:
                    if frame[i - 1] == _STOP and aa != _STOP:
                        start = i * 3 + framenum
                elif aa != _STOP:
                    start = framenum
        elif aa == _STOP:
            orfs.append((start, i * 3 + framenum + 2))
            start = None
    if not final_stop_codon and start is not None:
        orfs.append((start, (len(frame) - 1) * 3 + framenum + 2))
    return orfs


# ---------------------------------------------------------------------------
# CDS visitor
# ---------------------------------------------------------------------------

class _CDSAdder:
    def __init__(self, mapping: RegionMapping, minorflen: int,
                 start_codon: bool, final_stop_codon: bool, source: str,
                 serial_start: int):
        self.mapping = mapping
        self.minorflen = minorflen
        self.start_codon = start_codon
        self.final_stop_codon = final_stop_codon
        self.source = source
        self.serial = serial_start

    def process(self, fn: FeatureNode) -> None:
        """ref: cds_visitor.c:293 add_cds_if_necessary."""
        # direct children exons in range order (the reference's child
        # dlist is range-sorted, feature_node.c:1104)
        exons = sorted((c for c in fn.children
                        if c.type == "exon" and c.strand in "+-"),
                       key=lambda c: (c.range.start, c.range.end))
        if not exons:
            return
        pieces = []
        posmap = []
        for ex in exons:
            pieces.append(self.mapping.get_sequence(
                ex.seqid, ex.range.start, ex.range.end))
            posmap.extend(range(ex.range.start, ex.range.end + 1))
        spliced = "".join(pieces)
        if len(spliced) <= 2:
            return
        pos = np.asarray(posmap, dtype=np.int64)
        if fn.strand == "-":
            spliced = revcomp_str(spliced)
            pos = pos[::-1]
        orfs = []
        for f in range(3):
            orfs.extend(determine_orfs(translate_dna(spliced, f), f,
                                       self.start_codon,
                                       self.final_stop_codon))
        if not orfs:
            return
        # stable sort by length, longest first
        # (ref: gt_ranges_sort_by_length_stable)
        orfs.sort(key=lambda r: -(r[1] - r[0] + 1))
        best = orfs[0]
        if best[1] - best[0] + 1 < self.minorflen * 3:
            return
        self._create_cds(fn, pos, best)

    def _create_cds(self, fn: FeatureNode, pos: np.ndarray,
                    orf: tuple[int, int]) -> None:
        """ref: cds_visitor.c:187 create_CDS_features_for_ORF +
        set_phases."""
        p = pos[orf[0]:orf[1] + 1]
        # split transcript positions into runs of genomic-contiguous
        # positions; runs are in transcript (5'->3') order
        step = -1 if fn.strand == "-" else 1
        breaks = np.flatnonzero(np.diff(p) != step) + 1
        runs = np.split(p, breaks)
        features = []
        for run in runs:
            lo, hi = (int(run[-1]), int(run[0])) if fn.strand == "-" \
                else (int(run[0]), int(run[-1]))
            cds = FeatureNode(fn.seqid, "CDS", lo, hi, fn.strand,
                              self.source)
            features.append(cds)
        # genomic creation order defines serials (tie-break for the
        # writer's sibling sort: new CDS lines follow same-range exons)
        for cds in sorted(features,
                          key=lambda c: (c.range.start, c.range.end)):
            cds.serial = self.serial
            self.serial += 1
            fn.add_child(cds)
        rep = features[0]
        rep.is_multi = True
        for cds in features[1:]:
            cds.is_multi = True
            cds.multi_representative = rep
        phase = 0
        for cds in features:  # transcript order
            cds.phase = str(phase)
            phase = (3 - (cds.range.length - phase) % 3) % 3


def _check_sorted(nodes: list[GenomeNode], name: str) -> None:
    """The reference's sorted in-stream rejects files where a region
    node (incl. auto-synthesized ones) follows comments/features, or
    same-seqid features run backwards (ref: gff3_in_stream_plain.c:63
    buffer_is_sorted with gt_genome_node_compare)."""
    from .genome_node import CommentNode, RegionNode
    seen_nonregion = False
    last: dict[str, tuple] = {}
    for n in nodes:
        if isinstance(n, RegionNode):
            if seen_nonregion:
                raise ValueError(f"the file {name} is not sorted")
        elif isinstance(n, CommentNode):
            seen_nonregion = True
        elif isinstance(n, FeatureNode):
            seen_nonregion = True
            key = (n.range.start, n.range.end)
            if n.seqid in last and key < last[n.seqid]:
                raise ValueError(f"the file {name} is not sorted")
            last[n.seqid] = key


def add_cds(nodes: list[GenomeNode], mapping: RegionMapping,
            minorflen: int = 64, start_codon: bool = False,
            final_stop_codon: bool = False, source: str = "gt cds",
            filename: str = "input") -> list[GenomeNode]:
    """gt cds: add CDS features for the longest ORF of every
    exon-bearing feature (in place; returns nodes)."""
    from .gff3 import add_missing_regions
    nodes = add_missing_regions(nodes)
    _check_sorted(nodes, filename)
    max_serial = 0
    for n in nodes:
        if isinstance(n, FeatureNode):
            for m in n.traverse():
                max_serial = max(max_serial, m.serial)
    adder = _CDSAdder(mapping, minorflen, start_codon, final_stop_codon,
                      source, max_serial + 1)
    for n in nodes:
        if isinstance(n, FeatureNode):
            for m in n.traverse():
                adder.process(m)
    return nodes
