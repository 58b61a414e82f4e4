"""Byte-exact CLI tests for the sequence/annotation long-tail tools
against goldens the reference gt binary generated (testdata/*).

ref: testsuite/gt_{shredder,sequniq,seqfilter,extractseq,fingerprint,
chseqids,mergefeat,id_to_md5,md5_to_id}_include.rb
"""

import io
import sys
from contextlib import redirect_stderr, redirect_stdout
from pathlib import Path

import pytest

from genometools_tpu.cli import main

TD = Path("/root/reference/testdata")


def run_cli(*argv, stdin: str | None = None):
    out, err = io.StringIO(), io.StringIO()
    old_stdin = sys.stdin
    if stdin is not None:
        sys.stdin = io.StringIO(stdin)
    try:
        with redirect_stdout(out), redirect_stderr(err):
            rc = main(list(argv))
    except SystemExit as exc:
        rc = exc.code if isinstance(exc.code, int) else 1
    finally:
        sys.stdin = old_stdin
    return rc, out.getvalue(), err.getvalue()


def golden(name: str) -> str:
    return (TD / name).read_text()


class TestShredder:
    def test_fixed_length_golden(self):
        rc, out, _ = run_cli("shredder", "-minlength", "30",
                             "-maxlength", "30", str(TD / "Duplicate.fna"))
        assert rc == 0 and out == golden("Duplicate.shreddered")

    def test_minlength_gt_maxlength(self):
        rc, _, err = run_cli("shredder", "-maxlength", "15",
                             str(TD / "Duplicate.fna"))
        assert rc == 1 and "-minlength must be <= than -maxlength" in err


class TestSequniq:
    @pytest.mark.parametrize("infile,expect", [
        ("foofoo.fas", "foo.fas"),
        ("foofoofoo.fas", "foo.fas"),
        ("foorcfoo.fas", "foorcfoo.fas"),
    ])
    def test_golden(self, infile, expect):
        rc, out, err = run_cli("sequniq", str(TD / infile))
        assert rc == 0 and out == golden(expect)
        assert "sequences have been removed" in err

    def test_rev(self):
        rc, out, _ = run_cli("sequniq", "-rev", str(TD / "foorcfoo.fas"))
        assert rc == 0 and out == golden("foo.fas")
        rc, out, _ = run_cli("sequniq", "-rev", str(TD / "foorcfoofoo.fas"))
        assert rc == 0 and out == golden("foo.fas")

    def test_rev_palindrome_kept(self):
        rc, out, _ = run_cli("sequniq",
                             str(TD / "gt_sequniq_rev_bug.fas"))
        assert rc == 0 and out == golden("gt_sequniq_rev_bug.fas")


class TestSeqfilter:
    @pytest.mark.parametrize("args,expect", [
        (("-minlength", "1000"), "nGASP/protein_long.fas"),
        (("-maxlength", "499"), "nGASP/protein_short.fas"),
        (("-maxseqnum", "10"), "nGASP/protein_10.fas"),
        (("-step", "10"), "nGASP/protein_10th.fas"),
    ])
    def test_golden(self, args, expect):
        rc, out, err = run_cli("seqfilter", *args,
                               str(TD / "nGASP/protein_100.fas"))
        assert rc == 0 and out == golden(expect)
        assert "sequences have been removed" in err

    def test_nowildcards_dna(self):
        rc, out, _ = run_cli("seqfilter", "-nowildcards",
                             str(TD / "U89959_ests.fas"))
        assert rc == 0 and out == golden("U89959_ests_no_wildcards.fas")

    def test_nowildcards_protein(self):
        rc, out, _ = run_cli("seqfilter", "-nowildcards",
                             str(TD / "seqfilter_prot_wildcard.fas"))
        assert rc == 0 and \
            out == golden("seqfilter_prot_wildcard_no_wildcards.fas")


class TestExtractseq:
    def test_match(self):
        rc, out, _ = run_cli("extractseq", "-match", "foo",
                             str(TD / "foo.fas"))
        assert rc == 0 and out == golden("foo.fas")

    def test_match_width(self):
        rc, out, _ = run_cli("extractseq", "-match", "foo", "-width", "4",
                             str(TD / "foo.fas"))
        assert rc == 0 and out == golden("foo_width4.fas")

    def test_match_multi(self):
        rc, out, _ = run_cli("extractseq", "-match", "foo|bar",
                             str(TD / "foo.fas"), str(TD / "bar.fas"))
        assert rc == 0 and out == golden("foobar.fas")

    def test_frompos(self):
        rc, out, _ = run_cli("extractseq", "-frompos", "5", "-topos", "12",
                             str(TD / "foobar.fas"))
        assert rc == 0 and out == golden("frompos.fas")

    def test_frompos_too_large(self):
        rc, _, err = run_cli("extractseq", "-frompos", "5", "-topos", "17",
                             str(TD / "foobar.fas"))
        assert rc == 1 and "larger than" in err

    def test_frompos_order(self):
        rc, _, err = run_cli("extractseq", "-frompos", "18", "-topos", "17",
                             str(TD / "foobar.fas"))
        assert rc == 1 and "must be <= argument" in err

    def test_keys(self):
        rc, out, _ = run_cli("extractseq", "-keys",
                             str(TD / "U89959_ginums.txt"),
                             str(TD / "U89959_ests.fas"))
        assert rc == 0 and out == golden("U89959_ginums.out")

    def test_keys_roundtrip_at1MB(self):
        keys = "\n".join(
            line[4:].split("|")[0]
            for line in (TD / "at1MB").read_text().splitlines()
            if line.startswith(">"))
        import tempfile
        with tempfile.NamedTemporaryFile("w", suffix=".txt") as tf:
            tf.write(keys + "\n")
            tf.flush()
            rc, out, _ = run_cli("extractseq", "-keys", tf.name,
                                 "-width", "70", str(TD / "at1MB"))
        assert rc == 0 and out == (TD / "at1MB").read_text()


class TestFingerprint:
    def test_checklist_uniq(self):
        rc, out, _ = run_cli("fingerprint", str(TD / "U89959_ests.fas"))
        assert rc == 0
        mine = sorted(set(out.splitlines()))
        assert "\n".join(mine) + "\n" == golden("U89959_ests.checklist_uniq")

    def test_case_insensitive(self):
        rc, out, _ = run_cli(
            "fingerprint",
            str(TD / "U89959_ests_gi_8690080_soft_masked.fas"))
        assert rc == 0 and \
            out == golden("U89959_ests_gi_8690080_unmasked.checklist")

    def test_check_success(self):
        rc, _, _ = run_cli("fingerprint", "-check",
                           str(TD / "U89959_ests.checklist"),
                           str(TD / "U89959_ests.fas"))
        assert rc == 0

    def test_check_failure(self):
        rc, _, err = run_cli("fingerprint", "-check",
                             str(TD / "U89959_ests.checklist_uniq"),
                             str(TD / "U89959_ests.fas"))
        assert rc == 1 and "fingerprint comparison failed" in err

    def test_duplicates(self):
        rc, _, err = run_cli("fingerprint", "-duplicates",
                             str(TD / "U89959_ests.fas"))
        assert rc == 1 and "duplicates found" in err


class TestChseqids:
    @pytest.mark.parametrize("n", [1, 2])
    def test_golden(self, n):
        rc, out, _ = run_cli("chseqids",
                             str(TD / f"gt_chseqids_test_{n}.chseqids"),
                             str(TD / f"gt_chseqids_test_{n}.gff3"))
        assert rc == 0 and out == golden(f"gt_chseqids_test_{n}.out")

    def test_empty_mapping(self):
        rc, _, err = run_cli("chseqids", str(TD / "empty_file"),
                             str(TD / "gt_chseqids_test_1.gff3"))
        assert rc == 1 and "not defined" in err


class TestMergefeat:
    def test_merge(self):
        rc, out, _ = run_cli("mergefeat", str(TD / "mergefeat.gff3"))
        assert rc == 0 and out == golden("mergefeat.out")

    def test_no_merge(self):
        rc, out, _ = run_cli("mergefeat",
                             str(TD / "mergefeat_no_merge.gff3"))
        assert rc == 0 and out == golden("mergefeat_no_merge.gff3")


class TestMD5Translate:
    @pytest.mark.parametrize("stem", ["U89959_sas", "U89959_csas"])
    def test_id_to_md5(self, stem):
        rc, out, _ = run_cli(
            "id_to_md5", "-seqfiles", str(TD / "U89959_genomic.fas"),
            str(TD / "U89959_ests_unique.fas"), "-matchdesc",
            str(TD / f"{stem}.gff3"))
        assert rc == 0 and out == golden(f"{stem}.gff3md5")

    @pytest.mark.parametrize("stem", ["U89959_sas", "U89959_csas"])
    def test_md5_to_id_new_format(self, stem):
        rc, out, _ = run_cli("md5_to_id", str(TD / f"{stem}.gff3md5"))
        assert rc == 0 and out == golden(f"{stem}.gff3")

    def test_md5_to_id_old_format(self):
        rc, out, _ = run_cli(
            "md5_to_id", "-seqfiles", str(TD / "U89959_genomic.fas"),
            str(TD / "U89959_ests.fas"), "--",
            str(TD / "U89959_sas.gff3md5old"))
        assert rc == 0 and out == golden("U89959_sas.gff3")

    def test_ambiguous_matchdesc(self):
        rc, _, err = run_cli(
            "id_to_md5", "-seqfiles", str(TD / "U89959_genomic.fas"),
            str(TD / "U89959_ests.fas"), "-matchdesc",
            str(TD / "U89959_csas.gff3"))
        assert rc == 1 and "could match more than one" in err


class TestSeqtranslate:
    def test_frames(self):
        import tempfile
        with tempfile.NamedTemporaryFile("w", suffix=".fas") as tf:
            tf.write(">t\natggcctaa\n")
            tf.flush()
            rc, out, _ = run_cli("seqtranslate", tf.name)
        assert rc == 0
        assert ">t (1+)\nMA*" in out
        assert ">t (1-)\nLGH" in out
