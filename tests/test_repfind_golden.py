"""repfind vs the reference's golden outputs (testdata/repfind-result)."""

import numpy as np
import pytest

from genometools_tpu.core.encseq import Encseq
from genometools_tpu.match.repfind import (canonical_sort, parse_result_file,
                                           repfind_palindromic,
                                           repfind_reverse, repfind_self)


class TestGolden:
    def test_duplicate_forward(self, testdata):
        """gt repfind -l 8 -ii <Duplicate.fna index> golden comparison."""
        e = Encseq.from_files([str(testdata / "Duplicate.fna")])
        rows = repfind_self(e, 8)
        ref_rows, ref_dirs = parse_result_file(
            str(testdata / "repfind-result" / "Duplicate.fna.result"))
        assert all(d == "F" for d in ref_dirs)
        got = canonical_sort(rows)
        want = canonical_sort(ref_rows)
        assert got.tolist() == want.tolist()

    def test_atinsert_forward(self, testdata):
        """gt repfind -l 8 on Atinsert.fna vs repfind-result/Atinsert-8-8."""
        e = Encseq.from_files([str(testdata / "Atinsert.fna")])
        rows = repfind_self(e, 8)
        ref_rows, ref_dirs = parse_result_file(
            str(testdata / "repfind-result" / "Atinsert-8-8"))
        got = canonical_sort(rows)
        want = canonical_sort(ref_rows)
        assert got.shape == want.shape
        assert got.tolist() == want.tolist()

    def test_duplicate_reverse(self, testdata):
        """gt repfind -l 8 -r golden comparison (reverse matches)."""
        e = Encseq.from_files([str(testdata / "Duplicate.fna")])
        rows = repfind_reverse(e, 8)
        ref_rows, ref_dirs = parse_result_file(
            str(testdata / "repfind-result" / "Duplicate.fna-r.result"))
        assert all(d == "R" for d in ref_dirs)
        got = canonical_sort(rows)
        want = canonical_sort(ref_rows)
        assert got.tolist() == want.tolist()

    def test_palindromic_selfcheck(self, testdata):
        """-p mode property check: every reported pair really is a
        reverse-complement match with exact maximal length."""
        e = Encseq.from_files([str(testdata / "Duplicate.fna")])
        rows = repfind_palindromic(e, 10)
        assert rows.shape[0] > 0
        comp = e.alphabet.complement_table()
        for l, s1, r1, _, s2, r2 in rows[:100].tolist():
            p1 = int(e.seq_startpos(s1) + r1)
            p2 = int(e.seq_startpos(s2) + r2)
            a = e.codes[p1:p1 + l]
            b = e.codes[p2:p2 + l]
            assert (a == comp[b[::-1]]).all()
