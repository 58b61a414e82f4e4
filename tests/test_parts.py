"""Memory-bounded code-range parts engine (index/parts.py) — the
framework's -parts/-memlimit + int64 path (ref: src/match/sfx-partssuf.c).

The reference's own invariance bar: output is byte-identical no matter
the part count (testsuite checksfx runs -parts 1..3 and cmp's)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from genometools_tpu.core.encseq import Encseq
from genometools_tpu.index.parts import (build_suftab_parts,
                                         iter_suftab_parts, plan_parts)
from genometools_tpu.index.suffix import build_suffix_array

REPO = Path(__file__).resolve().parent.parent
TESTDATA = Path("/root/reference/testdata")


def _ref_sa(e):
    return np.asarray(build_suffix_array(e.suffix_keys(),
                                         with_lcp=False)[0])


class TestPartsEngine:
    @pytest.mark.parametrize("budget", [37, 500, 10 ** 9])
    def test_matches_doubling_random_with_specials(self, budget):
        rng = np.random.default_rng(3)
        s = "".join(rng.choice(list("acgtn"), 4000,
                               p=[0.235] * 4 + [0.06]))
        e = Encseq.from_string(s[:1500] + "|" + s[1500:])
        got = build_suftab_parts(e.codes, budget)
        assert (got == _ref_sa(e)).all()

    def test_repetitive_deep_lcp(self):
        e = Encseq.from_string("acg" * 2000 + "t")
        got = build_suftab_parts(e.codes, 173)
        assert (got == _ref_sa(e)).all()

    def test_part_count_invariance(self):
        e = Encseq.from_files([str(TESTDATA / "Atinsert.fna")])
        ref = build_suftab_parts(e.codes, 10 ** 9)   # one part
        for budget in (977, 12345):
            assert (build_suftab_parts(e.codes, budget) == ref).all()
        assert (ref == _ref_sa(e)).all()

    def test_planner_respects_budget(self):
        rng = np.random.default_rng(5)
        s = "".join(rng.choice(list("acgt"), 20000))
        e = Encseq.from_string(s)
        plan = plan_parts(e.codes, 1000)
        # single over-full buckets may exceed; none here at depth 8
        assert (plan.counts <= 1000).all()
        assert int(plan.counts.sum()) == plan.num_regular

    def test_streaming_segments_are_bounded(self):
        rng = np.random.default_rng(6)
        s = "".join(rng.choice(list("acgt"), 30000))
        e = Encseq.from_string(s)
        segs = list(iter_suftab_parts(e.codes, 2000))
        assert max(x.size for x in segs[:-2]) <= 2000
        assert (np.concatenate(segs) == _ref_sa(e)).all()


class TestPartsCLI:
    def test_suffixerator_parts_byte_identical(self, tmp_path):
        env = {"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
               "HOME": "/root"}
        sufs = {}
        for parts in (1, 2, 3):
            d = tmp_path / f"p{parts}"
            d.mkdir()
            r = subprocess.run(
                [sys.executable, "-m", "genometools_tpu", "suffixerator",
                 "-db", str(TESTDATA / "Random.fna"), "-indexname", "idx",
                 "-suf", "-tis", "-parts", str(parts), "--cpu"],
                cwd=d, capture_output=True, text=True, env=env)
            assert r.returncode == 0, r.stderr[-1500:]
            sufs[parts] = (d / "idx.suf").read_bytes()
        assert sufs[1] == sufs[2] == sufs[3]
        # cross-engine: parts output == in-memory engine output
        d = tmp_path / "mem"
        d.mkdir()
        r = subprocess.run(
            [sys.executable, "-m", "genometools_tpu", "suffixerator",
             "-db", str(TESTDATA / "Random.fna"), "-indexname", "idx",
             "-suf", "-tis", "--cpu"],
            cwd=d, capture_output=True, text=True, env=env)
        assert r.returncode == 0, r.stderr[-1500:]
        assert (d / "idx.suf").read_bytes() == sufs[1]


class TestPartsFullSurface:
    """-parts with -lcp/-bwt/-bck on every readmode: byte-identical to
    the in-memory engine at any part count (the reference's checksfx
    discipline, ref: testsuite/gt_suffixerator_include.rb:17-57)."""

    @pytest.mark.parametrize("rm", [0, 1, 2, 3])
    def test_stream_parts_all_outputs_byte_identical(self, rm, tmp_path):
        from genometools_tpu.index.esa import build_esa, write_esa
        from genometools_tpu.index.parts import stream_esa_parts
        e = Encseq.from_files([str(TESTDATA / "Atinsert.fna")])
        esa = build_esa(e, rm, with_lcp=True, with_bck=True)
        mem = tmp_path / "mem"
        write_esa(esa, str(mem), suf=True, lcp=True, bwt=True, bck=True)
        for budget in (10 ** 9, 4000, 701):
            out = tmp_path / f"b{budget}"
            nparts = stream_esa_parts(
                e, rm, str(out), budget, suf=True, lcp=True, bwt=True,
                bck=True, prefixlength=esa.prefixlength)
            assert budget > 10 ** 6 or nparts > 1
            for ext in (".suf", ".lcp", ".llv", ".bwt", ".bck", ".prj"):
                assert (out.parent / (out.name + ext)).read_bytes() == \
                    (mem.parent / (mem.name + ext)).read_bytes(), \
                    f"{ext} differs at rm={rm} budget={budget}"
