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


def _run_raw(args, cwd):
    import subprocess
    import sys
    from pathlib import Path
    repo = Path(__file__).resolve().parent.parent
    return subprocess.run(
        [sys.executable, "-m", "genometools_tpu"] + args, cwd=cwd,
        capture_output=True, text=True,
        env={"PYTHONPATH": str(repo), "PATH": "/usr/bin:/bin",
             "HOME": "/root"})


def _run(args, cwd):
    r = _run_raw(args, cwd)
    assert r.returncode == 0, r.stderr[-1500:]
    return r.stdout


class TestLongTailTools:
    """ref registry src/gtt.c:186-265 long tail: splitfasta, seq,
    convertseq, clean, mmapandread, template, dot, shulengthdist,
    encseq2spm, prebwt, mkfmindex, mkfeatureindex, featureindex."""

    def test_splitfasta_numfiles_and_force(self, tmp_path):
        import shutil
        src = "/root/reference/testdata/U89959_ests.fas"
        f = tmp_path / "U89959_ests.fas"
        shutil.copy(src, f)
        out = _run(["splitfasta", "-numfiles", "8", str(f)], tmp_path)
        assert (tmp_path / "U89959_ests.fas.1").exists()
        assert (tmp_path / "U89959_ests.fas.8").exists()
        assert not (tmp_path / "U89959_ests.fas.9").exists()
        # file exists -> error without -force (ref testsuite behaviour)
        r = _run_raw(["splitfasta", str(f)], tmp_path)
        assert r.returncode != 0 and "exists already" in r.stderr
        # pieces concatenate back to the original
        cat = b"".join((tmp_path / f"U89959_ests.fas.{i}").read_bytes()
                       for i in range(1, 9))
        assert cat == f.read_bytes()

    def test_seq_convertseq_clean_mmap(self, tmp_path):
        src = "/root/reference/testdata/Duplicate.fna"
        out = _run(["seq", "-stat", src], tmp_path)
        assert "# number of sequences: 2" in out
        out = _run(["convertseq", "-r", src], tmp_path)
        from genometools_tpu.core.seqio import read_seqfile
        ss = read_seqfile(src)
        comp = bytes.maketrans(b"ACGTacgt", b"TGCAtgca")
        want = bytes(ss.seqs[0])[::-1].translate(comp).decode()
        got = "".join(out.splitlines()[1:1 + (len(want) + 59) // 60])
        assert got == want
        (tmp_path / "x.esq").write_bytes(b"z")
        _run(["clean"], tmp_path)
        assert not (tmp_path / "x.esq").exists()
        out = _run(["mmapandread", src], tmp_path)

    def test_encseq2spm_matches_spmtest(self, tmp_path):
        (tmp_path / "reads.fna").write_text(
            ">r0\nacgtacgtgg\n>r1\ngtggcattca\n>r2\nttcacaacgt\n")
        _run(["suffixerator", "-db", "reads.fna", "-indexname", "rds",
              "-tis", "--cpu"], tmp_path)
        out = _run(["encseq2spm", "-ii", "rds", "-l", "4", "-spm", "show",
                    "--cpu"], tmp_path)
        assert "0 + 1 + 4" in out and "1 + 2 + 4" in out

    def test_prebwt_bounds_consistent(self, tmp_path):
        import json
        (tmp_path / "reads.fna").write_text(
            ">r0\nacgtacgtgg\n>r1\ngtggcattca\n")
        _run(["packedindex", "mkindex", "-db", "reads.fna", "-indexname",
              "pck", "--cpu"], tmp_path)
        _run(["prebwt", "-pck", "pck", "-maxdepth", "2", "--cpu"],
             tmp_path)
        d = json.loads((tmp_path / "pck.pbt").read_text())
        b = d["bounds"]
        # single-symbol buckets tile the regular range in order
        assert b["0"][1] == b["1"][0] and b["1"][1] == b["2"][0]

    def test_featureindex_roundtrip(self, tmp_path):
        g = "/root/reference/testdata/Scaffold_102.gff3"
        _run(["mkfeatureindex", "-filename", "f.db", g], tmp_path)
        out = _run(["featureindex", "-filename", "f.db"], tmp_path)
        assert "gene" in out and "##gff-version 3" in out
        out2 = _run(["dot", g], tmp_path)
        assert out2.startswith("digraph {") and "->" in out2

    def test_shulengthdist_matrix(self, tmp_path):
        (tmp_path / "g.fna").write_text(
            ">a\nacgtacgtacgtaaacccgg\n>b\nacgtacgttttgggcaacgt\n")
        _run(["suffixerator", "-db", "g.fna", "-indexname", "idx", "-tis",
              "--cpu"], tmp_path)
        out = _run(["shulengthdist", "-ii", "idx", "--cpu"], tmp_path)
        lines = out.splitlines()
        assert lines[0] == "# sum of shulen" and lines[1] == "2"


class TestSpeckAndScriptfilter:
    def test_scriptfilter_metadata_golden(self, tmp_path):
        f = tmp_path / "f1.py"
        f.write_text('name = "name"\nauthor = "author"\n'
                     'version = "1.0"\nemail = "email@example.com"\n'
                     'short_descr = "short description"\n'
                     'description = "description"\n'
                     'def filter(gn):\n    return True\n')
        out = _run(["scriptfilter", "-scriptname", "false", str(f)],
                   tmp_path)
        want = open("/root/reference/testdata/"
                    "script_filter_output.txt").read()
        assert out == want
        # metadata given as functions produces identical output
        # (ref: gt_script_filter_include.rb metadata-as-functions)
        g = tmp_path / "f2.py"
        g.write_text('def name(): return "name"\n'
                     'def author(): return "author"\n'
                     'def version(): return "1.0"\n'
                     'def email(): return "email@example.com"\n'
                     'short_descr = "short description"\n'
                     'description = "description"\n'
                     'def filter(gn):\n    return False\n')
        assert _run(["scriptfilter", "-scriptname", "false", str(g)],
                    tmp_path) == want

    def test_select_rule_files(self, tmp_path):
        f = tmp_path / "drop_genes.py"
        f.write_text('name="g";author="a";version="1";email="e"\n'
                     'description="drop genes"\n'
                     'def filter(gn):\n    return gn.type == "gene"\n')
        g = "/root/reference/testdata/Scaffold_102.gff3"
        out = _run(["select", g, "-rule_files", str(f)], tmp_path)
        assert "\tgene\t" not in out

    def test_speck_rules(self, tmp_path):
        spec = tmp_path / "spec.py"
        spec.write_text(
            '@feature("gene")\n'
            'def _(gene, it):\n'
            '    it("has a transcript",'
            ' gene.has_child_of_supertype("transcript"))\n'
            '    it("children in range", gene.overlaps_all_children())\n'
            '    it("longer than 10000nt (should fail)",'
            ' gene.range_length() > 10000)\n')
        g = "/root/reference/testdata/Scaffold_102.gff3"
        r = _run_raw(["speck", "-specfile", str(spec), g], tmp_path)
        assert r.returncode == 0
        assert "failures" in r.stdout
        assert 'failure: "gene"' in r.stdout   # the >10000nt rule
        r2 = _run_raw(["speck", "-specfile", str(spec), "-failhard", g],
                      tmp_path)
        assert r2.returncode == 1


class TestCondenseqCLI:
    def test_compress_extract_info_search(self, tmp_path):
        import numpy as np
        rng = np.random.default_rng(4)
        base = "".join(rng.choice(list("acgt"), 400))
        mut = list(base)
        for p in rng.choice(400, 10, replace=False):
            mut[p] = "acgt"[(("acgt".index(mut[p])) + 1) % 4]
        (tmp_path / "set.fna").write_text(
            f">s0\n{base}\n>s1\n{''.join(mut)}\n")
        _run(["condenseq", "compress", "-indexname", "arch", "set.fna"],
             tmp_path)
        info = _run(["condenseq", "info", "arch"], tmp_path)
        assert "links: 1" in info
        out = _run(["condenseq", "extract", "arch"], tmp_path)
        seqs = {}
        cur = None
        for l in out.splitlines():
            if l.startswith(">"):
                cur = l[1:]
                seqs[cur] = ""
            else:
                seqs[cur] += l
        assert seqs["s0"] == base and seqs["s1"] == "".join(mut)
        (tmp_path / "q.fna").write_text(f">q\n{base[50:90]}\n")
        hits = _run(["condenseq", "search", "-query", "q.fna", "arch"],
                    tmp_path)
        assert "0\t0\t50\t40" in hits
