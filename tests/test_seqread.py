"""SequentialSuffixArrayReader + streamed consumers.

Reference model: src/match/esa-seqread.h:27-42 (streamed suftab/lcptab
consumption) — outputs must equal the in-memory engines exactly, and
the parts-backed source must keep the resident suffix count bounded.
"""

import numpy as np
import pytest

from genometools_tpu.core.encseq import Encseq
from genometools_tpu.index.esa import build_esa, write_esa
from genometools_tpu.index.seqread import (SequentialSuffixArrayReader,
                                           lcp_pairwise)
from genometools_tpu.match.maxpairs import (enumerate_maxpairs,
                                            enumerate_maxpairs_stream)
from genometools_tpu.match.tallymer import mkindex, mkindex_stream


def _random_encseq(seed, n=1500, wild=0.03):
    rng = np.random.default_rng(seed)
    s = "".join(rng.choice(list("acgtn"), n,
                           p=[(1 - wild) / 4] * 4 + [wild]))
    return Encseq.from_string(s)


class TestReaderSources:
    @pytest.mark.parametrize("chunk", [7, 64, 100000])
    def test_from_esa_chunks_concat_to_tables(self, chunk):
        e = _random_encseq(1, 800)
        esa = build_esa(e)
        rd = SequentialSuffixArrayReader.from_esa(esa, chunk=chunk)
        sufs, lcps = [], []
        for s, l in rd.chunks():
            sufs.append(s)
            lcps.append(l)
        assert np.concatenate(sufs).tolist() == \
            np.asarray(esa.suftab).tolist()
        assert np.concatenate(lcps).tolist() == \
            np.asarray(esa.lcptab).tolist()

    @pytest.mark.parametrize("chunk", [13, 1 << 16])
    def test_from_files_streams_disk_tables(self, chunk, tmp_path):
        e = _random_encseq(2, 700)
        esa = build_esa(e)
        idx = str(tmp_path / "idx")
        write_esa(esa, idx, suf=True, lcp=True)
        rd = SequentialSuffixArrayReader.from_files(idx, chunk=chunk)
        sufs, lcps = [], []
        for s, l in rd.chunks():
            sufs.append(s)
            lcps.append(l)
        assert np.concatenate(sufs).tolist() == \
            np.asarray(esa.suftab).tolist()
        assert np.concatenate(lcps).tolist() == \
            np.asarray(esa.lcptab).tolist()

    @pytest.mark.parametrize("memlimit", [64, 300])
    def test_from_parts_matches_esa(self, memlimit):
        e = _random_encseq(3, 900)
        esa = build_esa(e)
        rd = SequentialSuffixArrayReader.from_parts(e.codes, memlimit)
        sufs, lcps = [], []
        maxres = 0
        for s, l in rd.chunks():
            maxres = max(maxres, s.size)
            sufs.append(s)
            lcps.append(l)
        assert np.concatenate(sufs).tolist() == \
            np.asarray(esa.suftab).tolist()
        assert np.concatenate(lcps).tolist() == \
            np.asarray(esa.lcptab).tolist()
        # bounded residency: no segment exceeds the part limit (the
        # special tail is position-ordered and streams in one piece)
        assert maxres <= max(memlimit,
                             int(np.sum(e.codes >= 253)) + 1)

    def test_lcp_pairwise_special_contract(self):
        e = Encseq.from_string("acgnacgt")
        codes = e.codes
        # suffix 0 = acgn..., suffix 4 = acgt: lcp stops at the wildcard
        assert lcp_pairwise(codes, [0], [4])[0] == 3
        # identical prefixes ending at specials never cross them
        e2 = Encseq.from_string("aana|aanc")
        l = lcp_pairwise(e2.codes, [0], [5])
        assert l[0] == 2


class TestStreamedConsumers:
    @pytest.mark.parametrize("seed", range(3))
    def test_maxpairs_stream_equals_inmemory(self, seed):
        e = _random_encseq(seed, 1200)
        esa = build_esa(e)
        mp = enumerate_maxpairs(esa, 8)
        rd = SequentialSuffixArrayReader.from_esa(esa, chunk=97)
        mps = enumerate_maxpairs_stream(rd, e, 8)
        assert mps.pos1.tolist() == mp.pos1.tolist()
        assert mps.pos2.tolist() == mp.pos2.tolist()
        assert mps.length.tolist() == mp.length.tolist()

    def test_maxpairs_via_parts_no_index_in_ram(self):
        e = _random_encseq(9, 2000)
        esa = build_esa(e)
        mp = enumerate_maxpairs(esa, 10)
        rd = SequentialSuffixArrayReader.from_parts(e.codes, 128)
        mps = enumerate_maxpairs_stream(rd, e, 10)
        assert mps.canonical().tolist() == mp.canonical().tolist()
        # emission order must ALSO match (repfind output is order-exact)
        assert mps.pos1.tolist() == mp.pos1.tolist()

    def test_repfind_parts_equals_inmemory(self):
        from genometools_tpu.match.repfind import repfind_self
        e = _random_encseq(5, 1500)
        full = repfind_self(e, 12)
        parts = repfind_self(e, 12, parts_memlimit=200)
        assert parts.tolist() == full.tolist()

    @pytest.mark.parametrize("chunk", [53, 1 << 16])
    def test_tallymer_stream_equals_inmemory(self, chunk):
        e = _random_encseq(4, 1500)
        esa = build_esa(e)
        mi = mkindex(esa, 11, minocc=1)
        rd = SequentialSuffixArrayReader.from_esa(esa, chunk=chunk)
        mis = mkindex_stream(rd, e, 11, minocc=1)
        assert mis.mer_codes.tolist() == mi.mer_codes.tolist()
        assert mis.counts.tolist() == mi.counts.tolist()

    def test_tallymer_via_parts(self):
        e = _random_encseq(6, 1000)
        esa = build_esa(e)
        mi = mkindex(esa, 9, minocc=2)
        rd = SequentialSuffixArrayReader.from_parts(e.codes, 150)
        mis = mkindex_stream(rd, e, 9, minocc=2)
        assert mis.mer_codes.tolist() == mi.mer_codes.tolist()
        assert mis.counts.tolist() == mi.counts.tolist()
