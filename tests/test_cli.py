"""End-to-end CLI tests (the stest-equivalent tier)."""

import contextlib
import io
import os

import numpy as np
import pytest

from genometools_tpu.cli import main


def run_cli(argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(argv)
    return rc, buf.getvalue()


class TestCLI:
    def test_suffixerator_tallymer_repfind(self, tmp_path, testdata):
        idx = str(tmp_path / "dup")
        rc, _ = run_cli(["suffixerator", "-db",
                         str(testdata / "Duplicate.fna"),
                         "-indexname", idx, "-suf", "-lcp", "-tis", "-dna"])
        assert rc == 0
        rc, out = run_cli(["encseq", "info", idx])
        assert "number of sequences: 2" in out
        rc, out = run_cli(["tallymer", "mkindex", "-esa", idx,
                           "-mersize", "19"])
        assert rc == 0 and out  # histogram lines
        rc, out = run_cli(["repfind", "-l", "8", "-ii", idx])
        want = [l.strip() for l in open(str(
            testdata / "repfind-result" / "Duplicate.fna.result"))]
        assert sorted(out.splitlines()) == sorted(want)

    def test_seed_extend_cli(self, tmp_path, testdata):
        idx = str(tmp_path / "sp")
        run_cli(["suffixerator", "-db", str(testdata / "small_poly.fas"),
                 "-indexname", idx, "-suf", "-lcp", "-tis", "-dna"])
        rc, out = run_cli(["seed_extend", "-ii", idx, "-l", "10",
                           "-extendxdrop", "97"])
        want = [l.strip() for l in open(str(testdata / "seedextend3.out"))
                if l.strip()]
        assert out.splitlines() == want

    def test_gff3_cli(self, testdata):
        rc, out = run_cli(["gff3", str(testdata / "gt_gff3_prob_8.in")])
        assert out == (testdata / "gt_gff3_prob_8.out").read_text()

    def test_readjoiner_cli(self, tmp_path, testdata, monkeypatch):
        monkeypatch.chdir(tmp_path)
        rc, _ = run_cli(["readjoiner", "prefilter", "-db",
                         str(testdata / "readjoiner" / "3_varlen_seq.fas"),
                         "-readset", "reads"])
        assert rc == 0
        rc, _ = run_cli(["readjoiner", "assembly", "-readset", "reads",
                         "-l", "5", "-depthcutoff", "2",
                         "-lengthcutoff", "31"])
        got = open("reads.contigs.fas").read()
        want = (testdata / "readjoiner" /
                "3_varlen_seq.contigs.fas").read_text()
        assert got == want

    def test_spmtest_cli(self, testdata):
        rc, out = run_cli(["readjoiner", "spmtest", "-db",
                           str(testdata / "readjoiner" / "pw.fas"),
                           "-l", "3"])
        want = sorted(l.strip() for l in open(
            str(testdata / "readjoiner" / "pw-ex.spm")))
        assert sorted(out.splitlines()) == want

    def test_seqstat(self, testdata):
        rc, out = run_cli(["seqstat", str(testdata / "Atinsert.fna")])
        assert "number of contigs:     21" in out

    def test_seqtools_cli(self, testdata):
        rc, out = run_cli(["fingerprint", str(testdata / "Duplicate.fna")])
        assert len(out.splitlines()) == 2
        rc, out = run_cli(["sequniq", str(testdata / "Duplicate.fna")])
        assert out.count(">") == 2  # the two seqs differ in length


class TestMagicmatchSeqtransform:
    """ref: gt_magicmatch_include.rb, gt_seqtransform_include.rb,
    gt_fastq_sample_include.rb."""

    @pytest.mark.parametrize("name,src", [
        ("U89959_ests", "U89959_ests.fas"),
        ("Random", "Random.fna"),
        ("RandomN", "RandomN.fna"),
        ("sw100K1", "sw100K1.fsa"),
    ])
    def test_magicmatch_goldens(self, testdata, name, src):
        rc, out = run_cli(["magicmatch", "-t", "-f", str(testdata / src)])
        assert rc == 0
        assert out == (testdata / f"{name}.magicmatch").read_text()

    def test_seqtransform_invariant(self, testdata):
        path = str(testdata / "nGASP" / "protein_100.fas")
        rc, out = run_cli(["seqtransform", path])
        assert rc == 0 and out == open(path).read()

    def test_seqtransform_addstop(self, testdata):
        rc, out = run_cli(["seqtransform", "-addstopaminos",
                           str(testdata / "nGASP" / "protein_100.fas")])
        want = (testdata / "nGASP" / "protein_100_with_stop.fas").read_text()
        assert rc == 0 and out == want

    def test_fastq_sample(self, testdata):
        rc, out = run_cli(["fastq_sample", "-length", "40",
                           str(testdata / "test1.fastq")])
        assert rc == 0
        assert "total length 66 from 2 entries" in out

    def test_fastq_sample_overlength(self, testdata):
        rc, _ = run_cli(["fastq_sample", "-length", "200",
                         str(testdata / "test1.fastq")])
        assert rc == 1


class TestGff3SmallTools:
    """ref: gt_seqids/loccheck/gff3validator/inlineseq include files."""

    def test_seqids_golden(self, testdata):
        rc, out = run_cli(["seqids",
                           str(testdata / "encode_known_genes_Mar07.gff3")])
        assert rc == 0
        assert out == \
            (testdata / "encode_known_genes_Mar07.seqids").read_text()

    def test_seqids_empty(self, testdata):
        rc, out = run_cli(["seqids", str(testdata / "gt_view_prob_1.gff3")])
        assert rc == 0 and out == ""

    def test_loccheck(self, testdata, capsys):
        import contextlib
        import io
        err = io.StringIO()
        with contextlib.redirect_stderr(err):
            rc = main(["loccheck",
                       str(testdata / "gt_loccheck_containment_fail.gff3")])
        assert rc == 0
        assert "mRNA child range 1123458-1124606" in err.getvalue()

    def test_loccheck_ok(self, testdata):
        import contextlib
        import io
        err = io.StringIO()
        with contextlib.redirect_stderr(err):
            rc = main(["loccheck",
                       str(testdata / "standard_gene_as_dag.gff3")])
        assert rc == 0 and err.getvalue() == ""

    def test_gff3validator(self, testdata):
        rc, out = run_cli(["gff3validator",
                           str(testdata / "standard_gene_as_tree.gff3")])
        assert rc == 0 and "input is valid GFF3" in out

    def test_gff3validator_typecheck(self, testdata):
        obo = "/root/reference/gtdata/obo_files/sofa.obo"
        rc, out = run_cli(["gff3validator", "-typecheck", obo,
                           str(testdata / "standard_gene_as_tree.gff3")])
        assert rc == 0 and "input is valid GFF3" in out

    def test_inlineseq_split(self, testdata, tmp_path):
        fas = str(tmp_path / "t.fas")
        gff = str(tmp_path / "t.gff3")
        rc, _ = run_cli(["inlineseq_split", "-seqfile", fas,
                         "-gff3file", gff,
                         str(testdata / "standard_fasta_example.gff3")])
        assert rc == 0
        assert open(fas).read() == \
            (testdata / "standard_fasta_example.fas").read_text()
        assert open(gff).read() == \
            (testdata /
             "standard_fasta_example_only_annotation.gff3").read_text()

    def test_inlineseq_roundtrip(self, testdata, tmp_path):
        fas = str(tmp_path / "t.fas")
        gff = str(tmp_path / "t.gff3")
        run_cli(["inlineseq_split", "-seqfile", fas, "-gff3file", gff,
                 str(testdata / "standard_fasta_example.gff3")])
        rc, out = run_cli(["inlineseq_add", "-seqfile", fas,
                           "-matchdesc", gff])
        assert rc == 0
        assert out == \
            (testdata / "standard_fasta_example_rejoined.gff3").read_text()

    def test_forward_parent_reference(self):
        from genometools_tpu.anno.gff3 import parse_gff3
        nodes = parse_gff3(
            "##gff-version 3\n"
            "c\t.\tCDS\t1\t50\t.\t+\t0\tParent=m1\n"
            "c\t.\tmRNA\t1\t100\t.\t+\t.\tID=m1\n")
        from genometools_tpu.anno.genome_node import FeatureNode
        feats = [n for n in nodes if isinstance(n, FeatureNode)]
        assert len(feats) == 1 and feats[0].children[0].type == "CDS"


class TestMergeesaCompreads:
    """ref: gt_mergeesa_include.rb (merged index == direct index),
    gt_csr_include.rb (compress/decompress round trip)."""

    def test_mergeesa_equals_direct(self, tmp_path, testdata, monkeypatch):
        monkeypatch.chdir(tmp_path)
        f1 = str(testdata / "Duplicate.fna")
        f2 = str(testdata / "Random.fna")
        run_cli(["suffixerator", "-db", f1, "-indexname", "i1", "-suf",
                 "-lcp", "-tis", "-dna"])
        run_cli(["suffixerator", "-db", f2, "-indexname", "i2", "-suf",
                 "-lcp", "-tis", "-dna"])
        run_cli(["suffixerator", "-db", f1, f2, "-indexname", "all",
                 "-suf", "-lcp", "-tis", "-dna"])
        rc, _ = run_cli(["mergeesa", "-indexname", "merged", "-ii",
                         "i1", "i2"])
        assert rc == 0
        for ext in (".suf", ".lcp", ".llv"):
            assert open("merged" + ext, "rb").read() == \
                open("all" + ext, "rb").read()

    def test_compreads_roundtrip(self, tmp_path, testdata, monkeypatch):
        monkeypatch.chdir(tmp_path)
        src = str(testdata / "csr_testcase.fastq")
        run_cli(["compreads", "compress", "-files", src, "-name", "t"])
        rc, _ = run_cli(["compreads", "decompress", "-file", "t"])
        assert rc == 0
        orig = [l for l in open(src) if not l.startswith("@")]
        got = [l for l in open("t.fastq") if not l.startswith("@")]
        assert got == orig

    def test_compreads_multifile(self, tmp_path, testdata, monkeypatch):
        monkeypatch.chdir(tmp_path)
        srcs = [str(testdata / f) for f in
                ("csr_testcase.fastq", "description_test.fastq")]
        run_cli(["compreads", "compress", "-files"] + srcs +
                ["-name", "t"])
        run_cli(["compreads", "decompress", "-file", "t"])
        orig = []
        for s in srcs:
            orig += [l for l in open(s) if not l.startswith("@")]
        got = [l for l in open("t.fastq") if not l.startswith("@")]
        assert got == orig


class TestSambam:
    """ref: gt_sambam_include.rb."""

    def test_sam_extract(self, testdata):
        rc, out = run_cli(["sambam", "-sam", "-idxfile",
                           str(testdata / "example_1.fa.fai"),
                           str(testdata / "example_1.sam.gz")])
        assert rc == 0
        assert out == (testdata / "example_1.sam.extract").read_text()

    def test_bam_extract(self, testdata):
        rc, out = run_cli(["sambam", str(testdata / "example_1.bam")])
        assert rc == 0
        assert out == (testdata / "example_1.sam.extract").read_text()
