"""Tests: GTF/BED parsers, feature index/extractfeat, structures, HMM."""

import numpy as np
import pytest

from genometools_tpu.anno.feature_index import FeatureIndex, extract_features
from genometools_tpu.anno.genome_node import FeatureNode
from genometools_tpu.anno.gff3 import GFF3Writer, gff3_to_string, parse_gff3
from genometools_tpu.anno.parsers import gff3_to_gtf, parse_bed, parse_gtf
from genometools_tpu.utils.hmm import HMM, coin_hmm_loaded, dice_hmm_loaded
from genometools_tpu.utils.structures import (BloomFilter,
                                              CompressedBitsequence,
                                              DiscDistri, IntervalTree, RMQ,
                                              UnionFind, WaveletTree)

GTF = """chr1\ttest\texon\t100\t200\t.\t+\t.\tgene_id "g1"; transcript_id "t1";
chr1\ttest\texon\t300\t400\t.\t+\t.\tgene_id "g1"; transcript_id "t1";
chr1\ttest\tCDS\t150\t200\t.\t+\t0\tgene_id "g1"; transcript_id "t1";
"""

BED = """chr1\t99\t400\tfeat1\t900\t+\t149\t400\t0\t2\t101,101\t0,200
"""


class TestParsers:
    def test_gtf(self):
        nodes = parse_gtf(GTF)
        genes = [n for n in nodes if isinstance(n, FeatureNode)]
        assert len(genes) == 1
        g = genes[0]
        assert g.type == "gene" and g.range.start == 100 and \
            g.range.end == 400
        t = g.children[0]
        assert t.type == "mRNA"
        assert sorted(c.type for c in t.children) == ["CDS", "exon", "exon"]

    def test_gtf_roundtrip(self):
        genes = [n for n in parse_gtf(GTF) if isinstance(n, FeatureNode)]
        text = gff3_to_gtf(genes)
        genes2 = [n for n in parse_gtf(text) if isinstance(n, FeatureNode)]
        assert len(genes2) == 1
        assert len(genes2[0].children[0].children) == 3

    def test_bed(self):
        feats = [n for n in parse_bed(BED) if isinstance(n, FeatureNode)]
        assert len(feats) == 1
        f = feats[0]
        assert f.range.start == 100 and f.range.end == 400
        blocks = [c for c in f.children if c.type == "BED_block"]
        assert len(blocks) == 2
        assert blocks[0].range.start == 100
        thick = [c for c in f.children if c.type == "BED_thick_feature"]
        assert thick[0].range.start == 150


class TestFeatureIndex:
    def _nodes(self):
        return parse_gff3(
            "##gff-version 3\n"
            "c\t.\tgene\t100\t500\t.\t+\t.\tID=g1\n"
            "c\t.\tgene\t800\t900\t.\t-\t.\tID=g2\n"
            "d\t.\tgene\t1\t50\t.\t+\t.\tID=g3\n")

    def test_range_query(self):
        fi = FeatureIndex()
        fi.add_gff3(self._nodes())
        assert fi.seqids() == ["c", "d"]
        hits = fi.features_for_range("c", 450, 850)
        assert len(hits) == 2
        assert fi.features_for_range("c", 600, 700) == []
        assert fi.range_for_seqid("c").start == 100

    def test_extract_features(self):
        nodes = parse_gff3(
            "##gff-version 3\n"
            "c\t.\tgene\t1\t20\t.\t+\t.\tID=g1\n"
            "c\t.\tmRNA\t1\t20\t.\t+\t.\tID=m1;Parent=g1\n"
            "c\t.\texon\t1\t4\t.\t+\t.\tParent=m1\n"
            "c\t.\texon\t9\t12\t.\t+\t.\tParent=m1\n")
        seqs = {"c": "acgtacgtacgtacgtacgt"}
        out = extract_features(nodes, seqs, "exon", join=True)
        assert out.num_sequences == 1
        assert out.seqs[0].tobytes().decode() == "acgtacgt"


class TestStructures:
    def test_wavelet_tree(self):
        rng = np.random.default_rng(0)
        seq = rng.integers(0, 6, 300)
        wt = WaveletTree(seq, 6)
        for c in range(6):
            for pos in (0, 7, 150, 300):
                assert wt.rank(c, pos) == int((seq[:pos] == c).sum())
        occ = np.flatnonzero(seq == 3)
        if occ.size:
            assert wt.select(3, 1) == occ[0]

    def test_rmq(self):
        rng = np.random.default_rng(1)
        a = rng.integers(0, 1000, 200)
        r = RMQ(a)
        for _ in range(50):
            lo = int(rng.integers(0, 200))
            hi = int(rng.integers(lo, 200))
            v, idx = r.query(lo, hi)
            assert v == a[lo:hi + 1].min()
            assert a[idx] == v and lo <= idx <= hi

    def test_compressed_bits(self):
        rng = np.random.default_rng(2)
        bits = rng.random(500) < 0.3
        cb = CompressedBitsequence(bits)
        for pos in (0, 63, 64, 100, 500):
            assert cb.rank1(pos) == int(bits[:pos].sum())
        k = int(bits.sum())
        if k:
            assert bits[cb.select1(k)]

    def test_union_find(self):
        uf = UnionFind(10)
        uf.union(1, 2)
        uf.union(2, 3)
        assert uf.find(1) == uf.find(3)
        assert uf.find(4) != uf.find(1)

    def test_interval_tree(self):
        it = IntervalTree([1, 10, 20], [5, 15, 30])
        assert it.find_overlapping(12, 22) == [1, 2]
        assert it.find_overlapping(6, 9) == []

    def test_bloom(self):
        bf = BloomFilter()
        bf.add("acgt")
        assert "acgt" in bf
        assert "tttt" not in bf

    def test_disc_distri(self):
        d = DiscDistri()
        d.add(5, 3)
        d.add(1)
        lines = d.show()
        assert lines[0].startswith("1: 1")


class TestHMM:
    def test_valid_models(self):
        assert coin_hmm_loaded().is_valid()
        assert dice_hmm_loaded().is_valid()

    def test_forward_backward_agree(self):
        hmm = dice_hmm_loaded()
        rng = np.random.default_rng(3)
        obs = rng.integers(0, 6, 50)
        assert abs(hmm.forward(obs) - hmm.backward(obs)) < 1e-8

    def test_viterbi_finds_loaded_region(self):
        hmm = dice_hmm_loaded()
        obs = np.array([0, 1, 2, 3, 4, 5] * 5 + [5] * 30 + [2, 3, 1] * 5)
        path = hmm.viterbi(obs)
        assert path[35] == 1  # inside the loaded run
        assert path[5] == 0


class TestSketch:
    def test_svg_render(self, testdata):
        from genometools_tpu.anno.sketch import Diagram, sketch
        nodes = parse_gff3((testdata / "gff3_file_1_short.txt").read_text())
        svg = sketch(nodes)
        assert svg.startswith("<svg")
        assert "gene" in svg and "exon" in svg
        assert svg.count("<rect") > 5
        d = Diagram.from_nodes(nodes)
        assert d.seqid == "ctg123"
        # exons overlap -> must occupy more than one line in the track
        exon_track = [t for t in d.tracks if t.ftype == "exon"][0]
        assert len(exon_track.lines) >= 2


class TestCondenseq:
    def test_roundtrip_and_compression(self):
        from genometools_tpu.core.seqio import SeqSet
        from genometools_tpu.utils.condenseq import compress
        rng = np.random.default_rng(0)
        base = "".join(rng.choice(list("acgt"), 400))
        variants = []
        for i in range(5):
            v = list(base)
            for _ in range(8):
                p = int(rng.integers(0, len(v)))
                v[p] = rng.choice(list("acgt"))
            variants.append("".join(v))
        unrelated = "".join(rng.choice(list("acgt"), 300))
        seqs = [base] + variants + [unrelated]
        ss = SeqSet(seqs=[np.frombuffer(s.encode(), np.uint8) for s in seqs],
                    descs=[f"s{i}" for i in range(len(seqs))])
        store = compress(ss, kmersize=16)
        # round trip
        from genometools_tpu.core.alphabet import dna_alphabet
        alpha = dna_alphabet()
        for i, s in enumerate(seqs):
            got = alpha.decode(store.extract(i))
            assert got == s
        # compression: variants linked, so far fewer unique bases
        assert len(store.uniques) == 2
        assert store.compressed_size() < ss.total_length * 0.6


class TestAnnoDB:
    def test_sqlite_roundtrip(self, tmp_path):
        from genometools_tpu.anno.anno_db import AnnoDB
        nodes = parse_gff3(
            "##gff-version 3\n"
            "##sequence-region   c 1 1000\n"
            "c\t.\tgene\t100\t500\t.\t+\t.\tID=g1;Name=foo\n"
            "c\t.\tmRNA\t100\t500\t.\t+\t.\tID=m1;Parent=g1\n"
            "c\t.\texon\t100\t200\t.\t+\t.\tParent=m1\n"
            "d\t.\tgene\t1\t50\t.\t-\t.\tID=g2\n")
        db = AnnoDB(str(tmp_path / "f.db"))
        db.add_gff3(nodes)
        assert db.seqids() == ["c", "d"]
        feats = db.features_for_range("c", 150, 600)
        assert len(feats) == 1
        g = feats[0]
        assert g.get_attribute("Name") == "foo"
        assert g.children[0].type == "mRNA"
        assert g.children[0].children[0].type == "exon"
        assert db.features_for_range("c", 600, 700) == []


class TestTypeChecker:
    def test_sofa_hierarchy(self):
        from genometools_tpu.anno.anno_db import TypeChecker
        text = open("/root/reference/gtdata/obo_files/sofa.obo").read()
        tc = TypeChecker.from_obo(text)
        assert tc.is_valid("gene")
        assert tc.is_valid("exon")
        assert not tc.is_valid("not_a_type")
        # in SOFA, mRNA is_a transcript (transitively)
        assert tc.is_a("mRNA", "transcript")
        assert not tc.is_a("transcript", "mRNA")
        bad = tc.check_nodes(parse_gff3(
            "##gff-version 3\nc\t.\tblah\t1\t2\t.\t+\t.\t.\n"))
        assert bad == ["blah"]


class TestSam:
    def test_parse_reference_sam(self):
        from genometools_tpu.anno.anno_db import parse_sam
        text = open("/root/reference/testdata/rcr_testreads_on_seq.sam").read()
        alns = list(parse_sam(text))
        assert len(alns) == 10
        a = alns[0]
        assert a.pos >= 0 and a.cigar
        assert a.reference_length > 0
        ops = a.cigar_ops()
        assert all(op in "MIDNSHP=X" for _, op in ops)


class TestConversionGoldens:
    def test_bed_goldens(self, testdata):
        """gt bed_to_gff3 vs the testdata/bed_files corpus. Content must
        match on every file; byte-exactness holds except for multi-seqid
        region ordering (C-hashmap order in the reference)."""
        import os
        bd = testdata / "bed_files"
        exact = srt = n = 0
        for f in sorted(os.listdir(bd)):
            if not f.endswith(".bed"):
                continue
            n += 1
            got = GFF3Writer().render(parse_bed((bd / f).read_text()))
            want = (bd / f.replace(".bed", ".gff3")).read_text()
            exact += got == want
            srt += sorted(got.splitlines()) == sorted(want.splitlines())
        assert n == 12 and srt == 12 and exact >= 7

    def test_gtf_golden_normalized(self, testdata):
        """gt gtf_to_gff3 golden; gene/mRNA numbering follows the C
        hashmap in the reference, so numbers are normalized away."""
        import re
        got = GFF3Writer().render(parse_gtf(
            (testdata / "gt_gtf_to_gff3_test.gtf").read_text()))
        want = (testdata / "gt_gtf_to_gff3_test.gff3").read_text()

        def norm(text):
            return sorted(re.sub(r"\b(gene|mRNA)\d+\b", r"\1#", l)
                          for l in text.splitlines())

        assert norm(got) == norm(want)

    def test_gtf_stop_codon_no_flank_errors(self, testdata):
        with pytest.raises(ValueError, match="with no flanking CDS"):
            parse_gtf((testdata /
                       "gt_gtf_to_gff3_test_fail_no_flank.gtf").read_text())


class TestSketchFormats:
    GFF = """##gff-version 3
##sequence-region   chr1 1 100000
chr1\ttest\tgene\t1000\t9000\t.\t+\t.\tID=gene1;Name=g1
chr1\ttest\tmRNA\t1000\t9000\t.\t+\t.\tID=m1;Parent=gene1
chr1\ttest\texon\t1000\t2000\t.\t+\t.\tParent=m1
chr1\ttest\texon\t5000\t9000\t.\t+\t.\tParent=m1
chr1\ttest\tgene\t60000\t80000\t.\t-\t.\tID=gene2
"""

    def _nodes(self):
        from genometools_tpu.anno.gff3 import parse_gff3
        return parse_gff3(self.GFF)

    def test_png_and_pdf_render(self):
        from genometools_tpu.anno.sketch import sketch
        png = sketch(self._nodes(), fmt="png")
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        pdf = sketch(self._nodes(), fmt="pdf")
        assert pdf[:5] == b"%PDF-"

    def test_style_file_colors(self, tmp_path):
        from genometools_tpu.anno.sketch import sketch
        from genometools_tpu.anno.style import load_style
        st = tmp_path / "my.style"
        st.write_text("""
-- comment
style = {
  gene = {
    fill = {red=1.0, green=0.0, blue=0.0},
    stroke = {red=0.0, green=0.0, blue=0.0, alpha=1.0},
    style = "box",
    collapse_to_parent = false,
    max_capt_show_width = nil,
  },
}
""")
        style = load_style(str(st))
        assert style["gene"]["fill"]["red"] == 1.0
        png = sketch(self._nodes(), fmt="png", style=style)
        # the pure-red gene fill must appear in the rendered image
        import io
        from PIL import Image
        img = Image.open(io.BytesIO(png))
        assert (255, 0, 0) in (c for _, c in img.getcolors(65536))

    def test_reference_default_style_parses(self):
        from genometools_tpu.anno.style import load_style, track_colors
        style = load_style("/root/reference/gtdata/sketch/default.style")
        colors = track_colors(style)
        assert "gene" in colors and colors["gene"]["fill"].startswith("#")
        assert "exon" in colors

    def test_sketch_page_multipage_pdf(self):
        from genometools_tpu.anno.sketch import sketch_pages
        pdf = sketch_pages(self._nodes(), page_span=30000)
        assert pdf[:5] == b"%PDF-"
        # 1..80000 at 30000 bp/page -> 3 pages
        assert pdf.count(b"/Type /Page") >= 3 or \
            pdf.count(b"/Page") >= 3


class TestImageInfo:
    """Image maps (ref: src/annotationsketch/image_info.c + rec_map.c;
    `gt sketch -showrecmaps`, gt_sketch.c:449)."""

    def _nodes(self):
        from genometools_tpu.anno.gff3 import parse_gff3
        return parse_gff3(open(
            "/root/reference/testdata/standard_gene_as_tree.gff3").read())

    def test_recmaps_collected_svg(self):
        from genometools_tpu.anno.sketch import ImageInfo, sketch
        ii = ImageInfo()
        svg = sketch(self._nodes(), image_info=ii)
        assert svg.count("<rect") - 1 == len(ii.rec_maps)  # -1: bg rect
        assert ii.height > 0
        rm = ii.rec_maps[0]
        # ref format: '%.0f,%.0f,%.0f,%.0f'
        parts = rm.html_imagemap_coords().split(",")
        assert len(parts) == 4 and all(
            p.lstrip("-").isdigit() for p in parts)
        assert rm.nw_x <= rm.se_x and rm.nw_y <= rm.se_y
        assert rm.node.type

    def test_recmaps_collected_png(self):
        from genometools_tpu.anno.sketch import ImageInfo, sketch
        ii = ImageInfo()
        sketch(self._nodes(), fmt="png", image_info=ii)
        assert len(ii.rec_maps) > 3

    def test_cli_showrecmaps(self, tmp_path):
        import subprocess
        import sys
        r = subprocess.run(
            [sys.executable, "-m", "genometools_tpu", "sketch",
             str(tmp_path / "o.svg"),
             "/root/reference/testdata/standard_gene_as_tree.gff3",
             "-showrecmaps"], capture_output=True, text=True,
            cwd="/root/repo")
        assert r.returncode == 0, r.stderr
        lines = [l for l in r.stdout.splitlines() if l]
        assert lines and all(", " in l for l in lines)
        coords = lines[0].split(", ")[0].split(",")
        assert len(coords) == 4
