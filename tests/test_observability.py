"""Spacepeak ledger, progressbar, manpage generation, GT_ENV_OPTIONS.

Reference surfaces: src/core/spacepeak.c + ma.c:279 (peak lines),
src/core/progressbar.c (bar layout), src/gtr.c:294-357 -createman,
src/core/init.c:52-112 GT_ENV_OPTIONS parsing.
"""

import io
import os
import subprocess
import sys

import pytest

from genometools_tpu.utils import progressbar, spacepeak
from genometools_tpu.utils.spacepeak import Spacepeak


class TestSpacepeak:
    def test_ledger_tracks_peak(self):
        sp = Spacepeak()
        sp.add(10 << 20)
        sp.add(5 << 20)
        sp.free(10 << 20)
        sp.add(2 << 20)
        assert sp.max == 15 << 20
        assert sp.current == 7 << 20
        assert sp.events == 3

    def test_show_format_matches_reference(self):
        # ref: ma.c:279 "# space peak in megabytes: %.2f (in N events)"
        #      spacepeak.c "# combined space peak in megabytes: %.2f"
        sp = Spacepeak()
        sp._base_kb = 1 << 60          # suppress RSS feed for the test
        sp.add(int(3.5 * (1 << 20)))
        buf = io.StringIO()
        sp.show(buf)
        lines = buf.getvalue().splitlines()
        assert lines[0] == "# space peak in megabytes: 3.50 (in 1 events)"
        assert lines[1] == "# combined space peak in megabytes: 3.50"

    def test_rss_highwater_feeds_peak(self):
        sp = Spacepeak()
        assert sp.peak_bytes() >= 0
        sp._base_kb = 0                # whole-process HWM counts now
        assert sp.peak_bytes() > 1 << 20

    def test_global_hooks_noop_when_disabled(self):
        spacepeak.add(123)             # must not raise when not enabled
        spacepeak.free(123)


class TestProgressbar:
    def test_render_layout(self):
        # ref layout: "\r 27% |*** ...   |    MM:SS ETA", bar = win-22
        frame = progressbar.render(27, 100, elapsed=7.0, window=81)
        assert frame.startswith("\r 27% |")
        bar = frame[6:6 + 61]          # 59 cells + 2 pipes
        assert bar[0] == "|" and bar[-1] == "|"
        assert bar.count("*") == int(0.27 * 59)
        assert frame.endswith(" ETA")

    def test_render_complete_shows_elapsed(self):
        frame = progressbar.render(100, 100, elapsed=3670.0, window=81)
        assert frame.startswith("\r100% |")
        assert frame.endswith("  1:01:10")       # h:mm:ss, no ETA
        assert "ETA" not in frame

    def test_render_zero_total(self):
        assert progressbar.render(0, 0, 0.0, window=81).startswith(
            "\r100%")

    def test_for_range_passthrough_no_tty(self):
        out = io.StringIO()            # not a tty -> no drawing
        assert list(progressbar.for_range(range(5), 5, out=out)) == \
            [0, 1, 2, 3, 4]
        assert out.getvalue() == ""

    def test_forced_bar_draws_frames(self):
        out = io.StringIO()
        progressbar.start(lambda: 3, 10, out=out, force=True)
        progressbar.stop()
        text = out.getvalue()
        assert text.startswith("\r 30% |") and text.endswith("\n")


class TestManpages(object):
    def test_createman_writes_tool_pages(self, tmp_path):
        r = subprocess.run(
            [sys.executable, "-m", "genometools_tpu", "-createman",
             str(tmp_path)], capture_output=True, text=True,
            cwd="/root/repo")
        assert r.returncode == 0, r.stderr
        files = sorted(p.name for p in tmp_path.iterdir())
        assert "gt-tpu.mansrc" in files
        assert "gt-tpu_suffixerator.mansrc" in files
        # nested toolbox tools get prefixed names (gtr.c prefix logic)
        assert any(f.startswith("gt-tpu_dev_") for f in files)
        assert len(files) > 80
        src = (tmp_path / "gt-tpu_suffixerator.mansrc").read_text()
        # ref: option.c:552 upper-cased dashed title + (1) section
        assert src.splitlines()[0] == "GT-TPU-SUFFIXERATOR(1)"
        assert "NAME\n----" in src
        assert "SYNOPSIS\n--------" in src
        assert "*gt-tpu suffixerator*" in src
        assert "*-db* " in src
        # bool options render ['yes|no'] with a default tail
        assert "*-suf* ['yes|no']::" in src
        assert "(default: no)" in src

    def test_env_options_spacepeak(self, tmp_path):
        env = dict(os.environ, GT_ENV_OPTIONS="-spacepeak",
                   GT_MEM_BOOKKEEPING="on", JAX_PLATFORMS="cpu")
        fa = tmp_path / "t.fna"
        fa.write_text(">s\nACGTACGTAC\n")
        r = subprocess.run(
            [sys.executable, "-m", "genometools_tpu", "suffixerator",
             "-db", str(fa), "-suf", "-indexname",
             str(tmp_path / "idx"), "--cpu"],
            capture_output=True, text=True, env=env, cwd="/root/repo")
        assert r.returncode == 0, r.stderr
        assert "# space peak in megabytes: " in r.stdout
        assert "# combined space peak in megabytes: " in r.stdout

    def test_env_options_warning_without_bookkeeping(self, tmp_path):
        env = dict(os.environ, GT_ENV_OPTIONS="-spacepeak",
                   JAX_PLATFORMS="cpu")
        env.pop("GT_MEM_BOOKKEEPING", None)
        r = subprocess.run(
            [sys.executable, "-m", "genometools_tpu", "-createman",
             str(tmp_path)], capture_output=True, text=True, env=env,
            cwd="/root/repo")
        assert "warning: GT_ENV_OPTIONS=-spacepeak used without " \
            "GT_MEM_BOOKKEEPING=on" in r.stderr

    def test_env_options_unknown_reports(self, tmp_path):
        env = dict(os.environ, GT_ENV_OPTIONS="-nosuch",
                   JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, "-m", "genometools_tpu", "-createman",
             str(tmp_path)], capture_output=True, text=True, env=env,
            cwd="/root/repo")
        assert 'unknown option: "-nosuch"' in r.stderr
        assert r.returncode == 0
