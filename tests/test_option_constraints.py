"""Option implications/exclusions + logger/showtime (ref:
src/core/option.c:784-880, logger.c, timer.c:208; per-tool
declarations ref: gt_repfind.c:458-477, gt_seed_extend.c, sfx-run.c).
Error texts must match the compiled gt binary byte for byte."""

import io
import time

import pytest

from genometools_tpu.cli import main
from genometools_tpu.utils.options import Constraints, Logger, Showtime


def _err_of(argv, capsys):
    with pytest.raises(SystemExit):
        main(argv)
    return capsys.readouterr().err


class TestConstraints:
    def test_exclusion_text_matches_gt(self, capsys):
        err = _err_of(["suffixerator", "-db", "x", "-parts", "2",
                       "-memlimit", "1MB"], capsys)
        assert 'option "-parts" and option "-memlimit" exclude ' \
               'each other' in err

    def test_imply_either_text_matches_gt(self, capsys):
        err = _err_of(["repfind", "-l", "14", "-ii", "x",
                       "-minidentity", "85"], capsys)
        assert 'option "-minidentity" requires option ' \
               '"-extendxdrop" or "-extendgreedy"' in err

    def test_greedy_xdrop_exclusion(self, capsys):
        err = _err_of(["repfind", "-l", "14", "-ii", "x",
                       "-extendgreedy", "-extendxdrop"], capsys)
        assert 'option "-extendgreedy" and option "-extendxdrop" ' \
               'exclude each other' in err

    def test_pick_implies_parts(self, capsys):
        err = _err_of(["seed_extend", "-ii", "x", "-pick", "0,0"],
                      capsys)
        assert 'option "-pick" requires option "-parts"' in err

    def test_mandatory(self):
        c = Constraints().mandatory("db")
        msgs = []
        c.check(["-indexname", "x"], msgs.append)
        assert msgs == ['option "-db" is mandatory']


class TestLoggerShowtime:
    def test_logger_prefix(self):
        buf = io.StringIO()
        Logger(True, out=buf).log("indexname=\"idx\"")
        assert buf.getvalue() == '# indexname="idx"\n'
        buf2 = io.StringIO()
        Logger(False, out=buf2).log("nope")
        assert buf2.getvalue() == ""

    def test_showtime_format(self):
        buf = io.StringIO()
        st = Showtime(True, out=buf)
        time.sleep(0.02)
        st.phase("sorting the suffixes")
        line = buf.getvalue().strip()
        assert line.startswith("# TIME sorting the suffixes ")
        sec = line.rsplit(" ", 1)[1]
        whole, cc = sec.split(".")
        assert whole.isdigit() and len(cc) == 2
