"""Driver script mode + gt namespace (ref: src/gtr.c:462-507 script
fallback, src/gtlua/ exports)."""

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
ENV = {"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin", "HOME": "/root"}
GFF = "/root/reference/testdata/standard_gene_as_tree.gff3"


def test_script_mode_runs_with_gt_namespace(tmp_path):
    sc = tmp_path / "count.py"
    sc.write_text(
        "fi = gt.feature_index_memory_new()\n"
        "nodes = list(gt.feature_stream_new("
        "gt.gff3_in_stream_new_sorted(arg[1]), fi))\n"
        "genes = sum(1 for n in nodes "
        "for f in (n.traverse() if hasattr(n, 'traverse') else []) "
        "if f.type == 'gene')\n"
        "print(genes, fi.seqids()[0])\n"
        "print(gt.translate_dna('atggcctaa'))\n")
    r = subprocess.run(
        [sys.executable, "-m", "genometools_tpu", str(sc), GFF],
        capture_output=True, text=True, env=ENV)
    assert r.returncode == 0, r.stderr[-500:]
    assert r.stdout.splitlines() == ["1 ctg123", "MA*"]


def test_unknown_tool_error_matches_gt(tmp_path):
    r = subprocess.run(
        [sys.executable, "-m", "genometools_tpu", "nosuchtool"],
        capture_output=True, text=True, env=ENV)
    assert r.returncode == 1
    assert "neither tool nor script 'nosuchtool' found; option " \
           "-help lists possible tools" in r.stderr


def test_script_gff3_roundtrip(tmp_path):
    sc = tmp_path / "echo.py"
    sc.write_text(
        "nodes = list(gt.gff3_in_stream_new_sorted(arg[1]))\n"
        "import sys\n"
        "sys.stdout.write(gt.write_gff3(nodes))\n")
    r = subprocess.run(
        [sys.executable, "-m", "genometools_tpu", str(sc), GFF],
        capture_output=True, text=True, env=ENV)
    assert r.returncode == 0, r.stderr[-500:]
    assert "##gff-version 3" in r.stdout and "\tgene\t" in r.stdout
