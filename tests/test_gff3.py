"""GFF3 + node-stream tests vs reference goldens."""

import pytest

from genometools_tpu.anno.genome_node import FeatureNode, Range
from genometools_tpu.anno.gff3 import GFF3Error, GFF3Writer, parse_gff3
from genometools_tpu.anno.node_stream import (FeatureStats, add_introns_stream,
                                              gff3_in_stream, select_stream,
                                              sort_stream, stat_stream,
                                              uniq_stream)

GOLDEN_CASES = [
    ("revision_numbers.gff3", "revision_numbers.out", False),
    ("gt_gff3_prob_2.in", "gt_gff3_prob_2.out", True),
    ("gt_gff3_prob_5.in", "gt_gff3_prob_5.out", True),
    ("gt_gff3_prob_7.in", "gt_gff3_prob_7.unsorted", False),
    ("gt_gff3_prob_7.in", "gt_gff3_prob_7.sorted", True),
    ("gt_gff3_prob_8.in", "gt_gff3_prob_8.out", False),
    ("gt_gff3_prob_9.in", "gt_gff3_prob_9.out", False),
    ("gt_gff3_prob_10.in", "gt_gff3_prob_10.out", False),
    ("gt_gff3_prob_11.in", "gt_gff3_prob_11.out", False),
    ("standard_gene_as_dag.gff3", "standard_gene_as_dag_sorted.gff3", False),
    ("gt_gff3_test_15.gff3", "gt_gff3_test_15.out", False),
    ("gt_gff3_test_18.gff3", "gt_gff3_test_18.gff3", False),
    ("gt_gff3_test_22.gff3", "gt_gff3_test_22.gff3", False),
    ("gt_gff3_test_23.gff3", "gt_gff3_test_23.gff3", False),
    ("gt_gff3_test_24.gff3", "gt_gff3_test_23.gff3", False),
    ("gt_gff3_test_25.gff3", "gt_gff3_test_25.out", False),
    ("additional_attribute.gff3", "additional_attribute.gff3", False),
]


class TestGoldens:
    @pytest.mark.parametrize("inp,out,dosort", GOLDEN_CASES)
    def test_golden(self, testdata, inp, out, dosort):
        nodes = parse_gff3((testdata / inp).read_text())
        if dosort:
            nodes = list(sort_stream(nodes))
        got = GFF3Writer().render(nodes)
        assert got == (testdata / out).read_text()

    def test_short_sorted(self, testdata):
        nodes = parse_gff3((testdata / "gff3_file_1_short.txt").read_text())
        got = GFF3Writer().render(nodes)
        want = (testdata / "gff3_file_1_short_sorted.txt").read_text()
        assert sorted(got.splitlines()) == want.splitlines()

    def test_prob1_errors(self, testdata):
        with pytest.raises(GFF3Error):
            parse_gff3((testdata / "gt_gff3_prob_1.gff3").read_text())

    def test_prob6_error_message(self, testdata):
        with pytest.raises(GFF3Error, match="does not contain"):
            parse_gff3((testdata / "gt_gff3_prob_6.in").read_text())


class TestParser:
    def test_escaping(self):
        nodes = parse_gff3(
            "##gff-version 3\nchr1\t.\tgene\t1\t10\t.\t+\t.\t"
            "ID=g%3B1;Note=a%2Cb\n")
        feats = [n for n in nodes if isinstance(n, FeatureNode)]
        assert feats[0].get_attribute("ID") == "g;1"
        assert feats[0].get_attribute("Note") == "a,b"

    def test_fasta_section(self):
        nodes = parse_gff3(
            "##gff-version 3\nchr1\t.\tgene\t1\t4\t.\t+\t.\t.\n"
            "##FASTA\n>chr1\nACGT\nAC\n")
        from genometools_tpu.anno.genome_node import SequenceNode
        seqs = [n for n in nodes if isinstance(n, SequenceNode)]
        assert len(seqs) == 1 and seqs[0].sequence == "ACGTAC"

    def test_multi_parent(self):
        text = ("##gff-version 3\n"
                "c\t.\tgene\t1\t100\t.\t+\t.\tID=g1\n"
                "c\t.\tmRNA\t1\t100\t.\t+\t.\tID=m1;Parent=g1\n"
                "c\t.\tmRNA\t1\t100\t.\t+\t.\tID=m2;Parent=g1\n"
                "c\t.\texon\t1\t50\t.\t+\t.\tParent=m1,m2\n")
        nodes = parse_gff3(text)
        feats = [n for n in nodes if isinstance(n, FeatureNode)]
        gene = feats[0]
        m1, m2 = gene.children
        assert m1.children[0] is m2.children[0]

    def test_undefined_parent_raises(self):
        with pytest.raises(GFF3Error, match="was not defined"):
            parse_gff3("##gff-version 3\n"
                       "c\t.\texon\t1\t50\t.\t+\t.\tParent=nope\n")


class TestStreams:
    def _gene(self):
        text = ("##gff-version 3\n"
                "c\t.\tgene\t1\t100\t.\t+\t.\tID=g1\n"
                "c\t.\tmRNA\t1\t100\t.\t+\t.\tID=m1;Parent=g1\n"
                "c\t.\texon\t1\t20\t.\t+\t.\tParent=m1\n"
                "c\t.\texon\t50\t70\t.\t+\t.\tParent=m1\n")
        return parse_gff3(text)

    def test_add_introns(self):
        nodes = list(add_introns_stream(self._gene()))
        feats = [n for n in nodes if isinstance(n, FeatureNode)]
        mrna = feats[0].children[0]
        introns = [c for c in mrna.children if c.type == "intron"]
        assert len(introns) == 1
        assert (introns[0].range.start, introns[0].range.end) == (21, 49)

    def test_select(self):
        nodes = list(select_stream(self._gene(), typefilter="exon"))
        feats = [n for n in nodes if isinstance(n, FeatureNode)]
        assert len(feats) == 1
        nodes = list(select_stream(self._gene(), typefilter="CDS"))
        assert not [n for n in nodes if isinstance(n, FeatureNode)]

    def test_uniq(self):
        nodes = self._gene() + self._gene()
        out = [n for n in uniq_stream(nodes) if isinstance(n, FeatureNode)]
        assert len(out) == 1

    def test_stats(self):
        stats = FeatureStats()
        list(stat_stream(self._gene(), stats))
        assert stats.counts == {"gene": 1, "mRNA": 1, "exon": 2}


class TestAddIntrons:
    def test_addintrons_golden(self, testdata):
        from genometools_tpu.anno.node_stream import add_introns_stream
        nodes = list(add_introns_stream(
            parse_gff3((testdata / "addintrons.gff3").read_text())))
        got = GFF3Writer().render(nodes)
        assert got == (testdata / "addintrons.out").read_text()

    def test_overlapping_exons_golden(self, testdata):
        from genometools_tpu.anno.node_stream import add_introns_stream
        nodes = list(add_introns_stream(parse_gff3(
            (testdata /
             "gt_gff3_addintrons_overlapping_exons.gff3").read_text())))
        got = GFF3Writer().render(nodes)
        want = (testdata /
                "gt_gff3_addintrons_overlapping_exons_with_introns.gff3"
                ).read_text()
        assert got == want


class TestCSA:
    @pytest.mark.parametrize("i", range(1, 7))
    def test_prob_goldens(self, testdata, i):
        from genometools_tpu.anno.csa import csa
        nodes = parse_gff3((testdata / f"gt_csa_prob_{i}.in").read_text())
        got = GFF3Writer().render(csa(nodes))
        assert got == (testdata / f"gt_csa_prob_{i}.out").read_text()

    def test_u89959_golden(self, testdata):
        from genometools_tpu.anno.csa import csa
        nodes = parse_gff3((testdata / "U89959_sas.gff3").read_text())
        got = GFF3Writer().render(csa(nodes))
        assert got == (testdata / "U89959_csas.gff3").read_text()

    def test_unsorted_errors(self):
        from genometools_tpu.anno.csa import csa
        nodes = parse_gff3(
            "##gff-version 3\n"
            "c\t.\tgene\t100\t200\t.\t+\t.\tID=g1\n"
            "c\t.\texon\t100\t200\t.\t+\t.\tParent=g1\n"
            "###\n"
            "c\t.\tgene\t1\t50\t.\t+\t.\tID=g2\n"
            "c\t.\texon\t1\t50\t.\t+\t.\tParent=g2\n")
        with pytest.raises(ValueError, match="is not sorted"):
            csa(nodes)


class TestCDSPhaseCheck:
    """ref: cds_check_visitor.c via the gff3 in-stream
    (testsuite/gt_gff3_include.rb cds_check section)."""

    @pytest.mark.parametrize("i", range(1, 13))
    def test_succ(self, testdata, i):
        parse_gff3((testdata / f"cds_check_succ_{i}.gff3").read_text())

    @pytest.mark.parametrize("i,msg", [
        (1, r"has the wrong phase 1 \(should be 0\)"),
        (2, r"has the wrong phase 2 \(should be 1\)"),
        (3, r"has the wrong phase 0 \(should be 2\)"),
        (4, r"has the wrong phase 0 \(should be 1\)"),
    ])
    def test_fail(self, testdata, i, msg):
        with pytest.raises(GFF3Error, match=msg):
            parse_gff3((testdata / f"cds_check_fail_{i}.gff3").read_text())

    @pytest.mark.parametrize("inf,outf", [
        ("cds_check_fail_1.gff3", "cds_check_succ_1.gff3"),
        ("cds_check_fail_2.gff3", "cds_check_succ_5.gff3"),
        ("cds_check_fail_3.gff3", "cds_check_succ_9.gff3"),
        ("cds_check_fail_4.gff3", "cds_check_succ_12.gff3"),
        ("cds_feature_with_multiple_parents.gff3",
         "cds_feature_with_multiple_parents_tidied.gff3"),
        ("cds_with_multiple_parents_1.gff3",
         "cds_with_multiple_parents_1_tidied.gff3"),
        ("cds_with_multiple_parents_2.gff3",
         "cds_with_multiple_parents_2_tidied.gff3"),
        ("gt_gff3_phases2.gff3", "gt_gff3_phases1.out"),
    ])
    def test_tidy(self, testdata, inf, outf):
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            nodes = parse_gff3((testdata / inf).read_text(), strict=False)
        got = GFF3Writer().render(nodes)
        assert got == (testdata / outf).read_text()

    def test_tidy_retainids(self, testdata):
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            nodes = parse_gff3(
                (testdata / "gt_gff3_phases3.gff3").read_text(),
                strict=False)
        got = GFF3Writer(retainids=True).render(nodes)
        assert got == (testdata / "gt_gff3_phases3.out").read_text()

    @pytest.mark.parametrize("i", [1, 4, 5, 6, 7])
    def test_short_exon_corner_cases_pass(self, testdata, i):
        parse_gff3((testdata / f"gt_gff3_phases{i}.gff3").read_text())
