"""repfind maxpairs + tallymer engine tests vs brute-force oracles."""

import numpy as np
import pytest

from genometools_tpu.core.encseq import Encseq
from genometools_tpu.index.esa import build_esa
from genometools_tpu.match.maxpairs import (MaxPairs, enumerate_maxpairs,
                                            maxpairs_bruteforce, _maxpairs_py,
                                            left_context_classes)
from genometools_tpu.match.tallymer import (MerIndex, mkindex,
                                            mkindex_bruteforce,
                                            occurrence_distribution, search,
                                            _revcomp_codes)


def _mp_check(seqstr, searchlength):
    e = Encseq.from_string(seqstr)
    esa = build_esa(e)
    got = enumerate_maxpairs(esa, searchlength)
    ref = maxpairs_bruteforce(e, searchlength)
    assert got.canonical().tolist() == ref.canonical().tolist(), seqstr


class TestMaxpairs:
    def test_simple_repeat(self):
        _mp_check("acgtacgt", 3)

    def test_tandem(self):
        _mp_check("aaaa", 1)
        _mp_check("abab".replace("b", "c") * 3, 2)

    def test_with_specials(self):
        _mp_check("acgtnacgt", 3)
        _mp_check("acgt|acgt", 3)

    @pytest.mark.parametrize("seed", range(6))
    def test_random(self, seed):
        rng = np.random.default_rng(seed)
        s = "".join(rng.choice(list("acgtn"), 120, p=[0.24] * 4 + [0.04]))
        _mp_check(s, 4)

    @pytest.mark.parametrize("seed", range(3))
    def test_random_repetitive(self, seed):
        rng = np.random.default_rng(100 + seed)
        # low-entropy: many repeats
        s = "".join(rng.choice(list("ac"), 80))
        _mp_check(s, 3)

    def test_native_matches_python(self):
        rng = np.random.default_rng(7)
        s = "".join(rng.choice(list("acgt"), 200))
        e = Encseq.from_string(s)
        esa = build_esa(e)
        cls = left_context_classes(esa)
        py = MaxPairs(*_maxpairs_py(esa.suftab, esa.lcptab, cls, 4, 4))
        nat = enumerate_maxpairs(esa, 4)
        assert nat.canonical().tolist() == py.canonical().tolist()

    def test_atinsert_count_stable(self, testdata):
        e = Encseq.from_files([str(testdata / "Atinsert.fna")])
        esa = build_esa(e)
        mp = enumerate_maxpairs(esa, 14)
        # all reported pairs must really match with exact length
        codes = e.codes
        for p1, p2, l in zip(mp.pos1[:200], mp.pos2[:200], mp.length[:200]):
            assert (codes[p1:p1 + l] == codes[p2:p2 + l]).all()
            assert (codes[p1:p1 + l] < 4).all()
            # right-maximality
            if p1 + l < codes.size and p2 + l < codes.size:
                assert (codes[p1 + l] != codes[p2 + l]
                        or codes[p1 + l] >= 4 or codes[p2 + l] >= 4)
            # left-maximality
            if p1 > 0 and p2 > 0:
                assert (codes[p1 - 1] != codes[p2 - 1]
                        or codes[p1 - 1] >= 4 or codes[p2 - 1] >= 4)


class TestTallymer:
    def test_mkindex_matches_bruteforce(self):
        rng = np.random.default_rng(3)
        s = "".join(rng.choice(list("acgtn"), 400, p=[0.24] * 4 + [0.04]))
        e = Encseq.from_string(s)
        esa = build_esa(e)
        for k in (2, 5, 11):
            got = mkindex(esa, k)
            ref = mkindex_bruteforce(e, k)
            assert got.mer_codes.tolist() == ref.mer_codes.tolist()
            assert got.counts.tolist() == ref.counts.tolist()

    def test_minocc_maxocc(self):
        e = Encseq.from_string("aaaaacgcg")
        esa = build_esa(e)
        mi = mkindex(esa, 2, minocc=2)
        # aa x4, cg x2, others once
        d = {c: n for c, n in zip(mi.mer_codes.tolist(), mi.counts.tolist())}
        assert d[0] == 4      # aa
        assert d[0b0110] == 2  # cg
        assert len(d) == 2

    def test_distribution(self):
        e = Encseq.from_string("aaaaacgcg")
        esa = build_esa(e)
        mi = mkindex(esa, 2)
        dist = occurrence_distribution(mi)
        assert dist[4] == 1  # aa
        assert dist[2] == 1  # cg
        assert dist[1] == 2  # ac, gc

    def test_save_load_roundtrip(self, tmp_path):
        rng = np.random.default_rng(5)
        s = "".join(rng.choice(list("acgt"), 500))
        e = Encseq.from_string(s)
        esa = build_esa(e)
        mi = mkindex(esa, 19)
        # force a large count
        mi.counts[0] = 300
        mi.save(str(tmp_path / "tyr"))
        mi2 = MerIndex.load(str(tmp_path / "tyr"))
        assert mi2.mersize == 19
        assert mi2.mer_codes.tolist() == mi.mer_codes.tolist()
        assert mi2.counts.tolist() == mi.counts.tolist()

    def test_revcomp_codes(self):
        # acg (k=3) -> cgt : 0b000110 -> 0b011011
        assert _revcomp_codes(np.array([0b000110]), 3)[0] == 0b011011

    def test_search(self):
        db = Encseq.from_string("acgtacgtttt")
        esa = build_esa(db)
        mi = mkindex(esa, 4)
        q = Encseq.from_string("acgt")
        res = search(mi, q, forward=True, reverse=True)
        # forward hit acgt (count 2); reverse hit revcomp(acgt)=acgt same
        fwd = res.counts[res.strand == ord("+")]
        assert fwd.tolist() == [2]
        rev = res.counts[res.strand == ord("-")]
        assert rev.tolist() == [2]

    def test_search_bucket_directory(self):
        rng = np.random.default_rng(9)
        s = "".join(rng.choice(list("acgt"), 300))
        e = Encseq.from_string(s)
        mi = mkindex(build_esa(e), 8)
        pl, bounds = mi.bucket_directory(2)
        for c in range(16):
            lo, hi = bounds[c], bounds[c + 1]
            if lo < hi:
                assert ((mi.mer_codes[lo:hi] >> (2 * 6)) == c).all()


class TestOccratio:
    def test_unique_nonunique(self):
        e = Encseq.from_string("aaaaacgcg")
        esa = build_esa(e)
        from genometools_tpu.match.tallymer import occratio
        d = occratio(esa, 2, 3)
        uniq2, nonuniq2, total2 = d[2]
        assert (uniq2, nonuniq2) == (2, 2)  # ac,gc unique; aa,cg repeated
        assert total2 == 4
