"""k-mer scan + ESA driver/IO tests."""

import numpy as np

from genometools_tpu.core.encseq import Encseq
from genometools_tpu.index.esa import (build_esa, load_esa, read_prj,
                                       write_esa)
from genometools_tpu.ops.kmer import (kmer_codes, kmer_codes_np,
                                      pack_mers_2bit, words_to_int)


class TestKmer:
    def test_simple(self):
        e = Encseq.from_string("acgtacgt")
        words, valid = kmer_codes(e.device_codes(), 2)
        assert words.shape == (1, 7)
        # ac=0*4+1=1 cg=6 gt=11 ta=12
        assert np.asarray(words)[0].tolist() == [1, 6, 11, 12, 1, 6, 11]
        assert np.asarray(valid).all()

    def test_specials_masked(self):
        e = Encseq.from_string("acn|gt")
        words, valid = kmer_codes(e.device_codes(), 2)
        assert np.asarray(valid).tolist() == [True, False, False, False, True]

    def test_matches_numpy(self):
        rng = np.random.default_rng(1)
        s = "".join(rng.choice(list("acgtn"), 300, p=[0.24] * 4 + [0.04]))
        e = Encseq.from_string(s)
        for k in (1, 3, 8, 15):
            words, valid = kmer_codes(e.device_codes(), k)
            ref_code, ref_valid = kmer_codes_np(e.codes, k)
            got = words_to_int(np.asarray(words), k)
            assert np.asarray(valid).tolist() == ref_valid.tolist()
            assert (got[ref_valid] == ref_code[ref_valid]).all()

    def test_multiword_k19(self):
        rng = np.random.default_rng(2)
        s = "".join(rng.choice(list("acgt"), 100))
        e = Encseq.from_string(s)
        words, valid = kmer_codes(e.device_codes(), 19)
        assert words.shape[0] == 2
        ref_code, _ = kmer_codes_np(e.codes, 19)
        got = words_to_int(np.asarray(words), 19)
        assert (got == ref_code).all()

    def test_pack_mers(self):
        # acgt -> 0b00011011 = 0x1B
        codes = np.array([0b00011011], np.int64)
        packed = pack_mers_2bit(codes, 4)
        assert packed.tolist() == [[0x1B]]
        # k=3: acg -> 0b000110 << 2 = 0b00011000
        packed = pack_mers_2bit(np.array([0b000110], np.int64), 3)
        assert packed.tolist() == [[0b00011000]]


class TestESA:
    def test_build_and_save_load(self, tmp_path, testdata):
        e = Encseq.from_files([str(testdata / "Duplicate.fna")])
        esa = build_esa(e, with_bck=True)
        idx = str(tmp_path / "dup")
        e.save(idx)
        write_esa(esa, idx, suf=True, lcp=True, bwt=True, bck=True)
        esa2 = load_esa(idx)
        assert (esa2.suftab == esa.suftab).all()
        assert (esa2.lcptab == esa.lcptab).all()
        prj = read_prj(idx)
        assert int(prj["totallength"]) == e.total_length
        assert int(prj["numofsequences"]) == e.num_sequences
        assert int(prj["longest"]) == esa.longest

    def test_lcp_overflow_roundtrip(self, tmp_path):
        # long repeat => lcp values > 255
        e = Encseq.from_string("ac" * 300)
        esa = build_esa(e)
        assert esa.lcptab.max() >= 255
        idx = str(tmp_path / "rep")
        e.save(idx)
        write_esa(esa, idx)
        esa2 = load_esa(idx)
        assert (esa2.lcptab == esa.lcptab).all()

    def test_bwt(self):
        e = Encseq.from_string("acgt")
        esa = build_esa(e)
        bwt = esa.bwt()
        # suftab = [0,1,2,3,4]; bwt[rank of suffix p] = codes[p-1];
        # UNDEFBWTCHAR (254) for the position-0 suffix (ref: chardef.h:65)
        for r, p in enumerate(esa.suftab):
            if p == 0:
                assert bwt[r] == 254
            else:
                assert bwt[r] == e.codes[p - 1]

    def test_bcktab(self, testdata):
        e = Encseq.from_files([str(testdata / "Duplicate.fna")])
        esa = build_esa(e, prefixlength=2, with_bck=True)
        b = esa.bcktab
        assert b.numofallcodes == 16
        # reference semantics (byte-parity-pinned by test_esa_refparity):
        # leftborder counts every suffix NOT starting at a special char;
        # suffixes whose window hits a special/end at offset j>=1 count at
        # maxcode; countspecialcodes is indexed by specialcode (code>>2)
        # and applies to codes with rightchar == sigma-1 (code % 4 == 3)
        from genometools_tpu.core.chardef import is_special
        from genometools_tpu.ops.kmer import kmer_codes_np
        ncounted = int((~is_special(e.codes)).sum())
        assert int(b.leftborder[-1]) == ncounted
        code, valid = kmer_codes_np(e.codes, 2)
        for c in range(16):
            lo = int(b.leftborder[c])
            hi = int(b.leftborder[c + 1])
            spec = int(b.countspecialcodes[c >> 2]) if c % 4 == 3 else 0
            for r in range(lo, hi - spec):
                p = int(esa.suftab[r])
                assert p < code.size and valid[p] and code[p] == c
            # specials tail of the region: window has a special / sentinel
            for r in range(hi - spec, hi):
                p = int(esa.suftab[r])
                assert p >= code.size or not valid[p]


class TestMergeESA:
    def test_merge_two(self, testdata):
        from genometools_tpu.index.esa import merge_esas
        e1 = Encseq.from_files([str(testdata / "Duplicate.fna")])
        e2 = Encseq.from_string("acgtacgtnacc|ttagc")
        merged = merge_esas([e1, e2])
        enc = merged.encseq
        assert enc.num_sequences == e1.num_sequences + e2.num_sequences
        assert enc.total_length == e1.total_length + e2.total_length + 1
        # the merged suftab is a valid ESA of the combined set
        keys = enc.suffix_keys()
        import numpy as np
        from genometools_tpu.index.suffix import kasai_lcp
        assert np.sort(merged.suftab).tolist() == list(range(keys.size))
        assert (kasai_lcp(keys, merged.suftab) == merged.lcptab).all()
