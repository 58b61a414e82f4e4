"""Suffix array + LCP construction tests vs brute force."""

import numpy as np
import pytest

from genometools_tpu.core.encseq import FWD, RCL, Encseq
from genometools_tpu.index.suffix import (build_suffix_array, check_suftab_order,
                                          kasai_lcp, lcp_bruteforce,
                                          suffix_array_bruteforce)


def _check(seqstr):
    e = Encseq.from_string(seqstr)
    keys = e.suffix_keys()
    sa, lcp = build_suffix_array(keys)
    sa = np.asarray(sa)
    lcp = np.asarray(lcp)
    ref_sa = suffix_array_bruteforce(keys)
    assert sa.tolist() == ref_sa.tolist(), seqstr
    ref_lcp = lcp_bruteforce(keys, sa)
    assert lcp.tolist() == ref_lcp.tolist(), seqstr
    assert check_suftab_order(keys, sa)


class TestSmall:
    def test_trivial(self):
        _check("a")
        _check("acgt")
        _check("aaaa")

    def test_banana_like(self):
        _check("atataat")
        _check("cgcgcgcgcg")

    def test_specials(self):
        _check("an|g")
        _check("nnn")
        _check("acgt|acgt|acgt")
        _check("nacgtn|nn|acg")

    def test_repetitive(self):
        _check("a" * 100)
        _check("acg" * 40)

    @pytest.mark.parametrize("seed", range(8))
    def test_random(self, seed):
        rng = np.random.default_rng(seed)
        chars = np.array(list("acgtn"))
        probs = [0.24, 0.24, 0.24, 0.24, 0.04]
        s = "".join(rng.choice(chars, 200, p=probs))
        # split into 1-3 sequences
        k = rng.integers(1, 4)
        if k > 1:
            cuts = sorted(rng.integers(1, len(s), size=k - 1))
            parts, last = [], 0
            for c in cuts:
                parts.append(s[last:c])
                last = c
            parts.append(s[last:])
            s = "|".join(p for p in parts if p)
        _check(s)


class TestSpecialOrdering:
    def test_specials_sort_by_position_ascending(self):
        """Reference: two special-starting suffixes compare by position
        (encseq.c:7419-7436): smaller position => smaller suffix."""
        e = Encseq.from_string("an|g")  # specials at 1 (n) and 2 (sep)
        sa, _ = build_suffix_array(e.suffix_keys())
        sa = np.asarray(sa).tolist()
        # suffixes: 0:"an|g" 1:"n|g" 2:"|g" 3:"g" 4:""(sentinel)
        # a < g < special@1 < special@2 < sentinel@4
        assert sa == [0, 3, 1, 2, 4]

    def test_sentinel_is_largest(self):
        e = Encseq.from_string("acgt")
        sa, _ = build_suffix_array(e.suffix_keys())
        assert int(np.asarray(sa)[-1]) == 4


class TestKasaiCrosscheck:
    def test_kasai_matches_doubling(self):
        rng = np.random.default_rng(42)
        s = "".join(rng.choice(list("acgt"), 500))
        e = Encseq.from_string(s)
        keys = e.suffix_keys()
        sa, lcp = build_suffix_array(keys)
        k = kasai_lcp(keys, np.asarray(sa))
        assert np.asarray(lcp).tolist() == k.tolist()


class TestMediumScale:
    def test_atinsert(self, testdata):
        e = Encseq.from_files([str(testdata / "Atinsert.fna")])
        keys = e.suffix_keys()
        sa, lcp = build_suffix_array(keys)
        sa = np.asarray(sa)
        lcp_np = np.asarray(lcp)
        n1 = keys.size
        # permutation check
        assert np.sort(sa).tolist() == list(range(n1))
        # kasai crosscheck
        assert (kasai_lcp(keys, sa) == lcp_np).all()
        # spot-check order on sampled adjacent pairs
        rng = np.random.default_rng(0)
        for i in rng.integers(1, n1, size=50):
            a, b = int(sa[i - 1]), int(sa[i])
            ka, kb = keys[a:a + 64].tolist(), keys[b:b + 64].tolist()
            assert ka < kb or (ka == kb)

    def test_readmodes_consistent(self, testdata):
        e = Encseq.from_files([str(testdata / "Duplicate.fna")])
        for rm in (FWD, RCL):
            keys = e.suffix_keys(rm)
            sa, lcp = build_suffix_array(keys)
            # full order check is O(n^2); verify permutation + kasai instead
            sa_np = np.asarray(sa)
            assert np.sort(sa_np).tolist() == list(range(keys.size))
            assert (kasai_lcp(keys, sa_np) == np.asarray(lcp)).all()


class TestSAIS:
    """SA-IS independent constructor (ref: src/match/sfx-sain.c:1577)."""

    def test_sais_vs_bruteforce_fuzz(self):
        from genometools_tpu.core.native import sais_native
        from genometools_tpu.index.suffix import suffix_array_bruteforce
        rng = np.random.default_rng(7)
        for trial in range(50):
            n = int(rng.integers(1, 60))
            keys = rng.integers(0, 5, n).astype(np.int32)
            if trial % 3 == 0:   # unique-special style keys
                sp = rng.random(n) < 0.2
                keys[sp] = 4 + np.arange(n, dtype=np.int32)[sp]
            sa = sais_native(keys)
            if sa is None:
                import pytest
                pytest.skip("native lib unavailable")
            assert np.array_equal(sa, suffix_array_bruteforce(keys))

    def test_sais_equals_doubling_on_testdata(self, testdata):
        from genometools_tpu.core.encseq import Encseq
        from genometools_tpu.core.native import sais_native
        from genometools_tpu.index.suffix import build_suffix_array
        for db in ["Duplicate.fna", "Random159.fna", "TTT-small.fna",
                   "at1MB"]:
            enc = Encseq.from_files([str(testdata / db)])
            keys = enc.suffix_keys()
            sa = sais_native(keys)
            if sa is None:
                import pytest
                pytest.skip("native lib unavailable")
            sa2, _ = build_suffix_array(keys, with_lcp=False)
            assert np.array_equal(sa, np.asarray(sa2)), db


def test_wide_lane_delegation(monkeypatch):
    """GT_TPU_WIDE_FORCE routes the single-chip build through the
    pair-lane sharded engine; result must equal the int32 engine."""
    import numpy as np

    from genometools_tpu.core.encseq import Encseq
    from genometools_tpu.index.suffix import build_suffix_array
    rng = np.random.default_rng(9)
    s = "".join(rng.choice(list("acgtn"), 3001, p=[0.24] * 4 + [0.04]))
    keys = Encseq.from_string(s).suffix_keys()
    ref_sa, ref_lcp = build_suffix_array(keys, with_lcp=True)
    monkeypatch.setenv("GT_TPU_WIDE_FORCE", "1")
    sa, lcp = build_suffix_array(keys, with_lcp=True)
    assert np.asarray(sa).tolist() == np.asarray(ref_sa).tolist()
    assert np.asarray(lcp).tolist() == np.asarray(ref_lcp).tolist()
