"""GTF and BED parsing + GFF3<->GTF conversion.

Capability equivalents of the reference parsers
(ref: src/extended/gtf_parser.c, bed_parser.c, tools gt_gtf_to_gff3.c,
gt_gff3_to_gtf.c, gt_bed_to_gff3.c).
"""

from __future__ import annotations

from .genome_node import FeatureNode, GenomeNode, RegionNode


def parse_gtf(text: str) -> list[GenomeNode]:
    """GTF2.2 -> gene/mRNA/exon/CDS feature trees
    (ref: gtf_parser.c: group by gene_id/transcript_id)."""
    genes: dict[str, FeatureNode] = {}
    transcripts: dict[str, FeatureNode] = {}
    order: list[FeatureNode] = []
    serial = 0
    for line_no, line in enumerate(text.splitlines(), 1):
        if not line.strip() or line.startswith("#"):
            continue
        cols = line.split("\t")
        if len(cols) < 9:
            raise ValueError(f"GTF line {line_no}: expected 9 fields")
        seqid, source, ftype, start, end, score, strand, phase, attrs = \
            cols[:9]
        if ftype not in ("exon", "CDS", "start_codon", "stop_codon",
                        "5UTR", "3UTR", "transcript", "gene"):
            continue
        ad = {}
        for part in attrs.strip().rstrip(";").split(";"):
            part = part.strip()
            if not part:
                continue
            key, _, val = part.partition(" ")
            ad[key] = val.strip().strip('"')
        gid = ad.get("gene_id", "")
        tid = ad.get("transcript_id", "")
        start_i, end_i = int(start), int(end)
        serial += 1
        if gid not in genes:
            g = FeatureNode(seqid, "gene", start_i, end_i, strand, source)
            g.serial = serial
            g.set_attribute("ID", gid)
            genes[gid] = g
            order.append(g)
        else:
            g = genes[gid]
            g.range = g.range.join(FeatureNode(
                seqid, "gene", start_i, end_i).range)
        if tid and tid not in transcripts:
            serial += 1
            t = FeatureNode(seqid, "mRNA", start_i, end_i, strand, source)
            t.serial = serial
            t.set_attribute("ID", tid)
            transcripts[tid] = t
            g.add_child(t)
        if ftype in ("exon", "CDS"):
            f = FeatureNode(seqid, ftype, start_i, end_i, strand, source,
                            None if score == "." else float(score),
                            phase if phase in "012" else ".")
            f.serial = serial
            t = transcripts.get(tid)
            if t is not None:
                t.add_child(f)
                t.range = t.range.join(f.range)
                genes[gid].range = genes[gid].range.join(f.range)
    return order


def gff3_to_gtf(nodes: list[GenomeNode]) -> str:
    """Render feature trees as GTF (ref: gt_gff3_to_gtf / gtf_visitor)."""
    lines = []
    for node in nodes:
        if not isinstance(node, FeatureNode):
            continue
        gid_counter = getattr(gff3_to_gtf, "_gid", 0)
        for gene in [node] if node.type == "gene" else []:
            gid = gene.get_attribute("ID") or f"gene{gid_counter}"
            for t in gene.children:
                tid = t.get_attribute("ID") or f"{gid}.t"
                for c in t.children:
                    if c.type not in ("exon", "CDS"):
                        continue
                    score = "." if c.score is None else f"{c.score:g}"
                    lines.append("\t".join([
                        c.seqid, c.source, c.type, str(c.range.start),
                        str(c.range.end), score, c.strand, c.phase,
                        f'gene_id "{gid}"; transcript_id "{tid}";']))
    return "\n".join(lines) + ("\n" if lines else "")


def parse_bed(text: str) -> list[GenomeNode]:
    """BED -> feature trees (ref: bed_parser.c): BED blocks become
    exon children of a mRNA/BED_feature; thick range becomes CDS."""
    out: list[GenomeNode] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith(("#", "track", "browser")):
            continue
        cols = line.split()
        if len(cols) < 3:
            continue
        seqid, start, end = cols[0], int(cols[1]) + 1, int(cols[2])
        name = cols[3] if len(cols) > 3 else None
        score = float(cols[4]) if len(cols) > 4 and cols[4] != "." else None
        strand = cols[5] if len(cols) > 5 else "."
        f = FeatureNode(seqid, "BED_feature", start, end, strand, "BED",
                        score)
        if name:
            f.set_attribute("Name", name)
        # thick (CDS) range
        if len(cols) > 7:
            ts, te = int(cols[6]) + 1, int(cols[7])
            if te >= ts:
                cds = FeatureNode(seqid, "CDS", ts, te, strand, "BED")
                f.add_child(cds)
        # blocks
        if len(cols) > 11:
            sizes = [int(x) for x in cols[10].rstrip(",").split(",")]
            starts = [int(x) for x in cols[11].rstrip(",").split(",")]
            for bs, sz in zip(starts, sizes):
                ex = FeatureNode(seqid, "exon", start + bs,
                                 start + bs + sz - 1, strand, "BED")
                f.add_child(ex)
        out.append(f)
    return out
