"""Multi-device pipeline tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from genometools_tpu.core.encseq import Encseq
from genometools_tpu.index.suffix import build_suffix_array
from genometools_tpu.parallel.dist_esa import (make_mesh,
                                               sharded_kmer_histogram,
                                               sharded_suffix_sort)


def _keys_padded(seqstr, ndev=8):
    import jax.numpy as jnp
    e = Encseq.from_string(seqstr)
    keys = e.suffix_keys()
    n1 = keys.size
    npad = ((n1 + ndev - 1) // ndev) * ndev
    pad = keys.max() + 1 + np.arange(npad - n1, dtype=np.int32)
    return np.concatenate([keys, pad]).astype(np.int32), n1, npad


class TestShardedPipeline:
    def test_histogram(self):
        import jax.numpy as jnp
        mesh = make_mesh(8)
        keys, n1, npad = _keys_padded("acgtacgtnn|ggg")
        hist = sharded_kmer_histogram(jnp.asarray(keys), npad, mesh)
        assert int(np.asarray(hist).sum()) == npad

    def test_sharded_sort_matches_single(self):
        import jax.numpy as jnp
        mesh = make_mesh(8)
        rng = np.random.default_rng(0)
        s = "".join(rng.choice(list("acgtn"), 301, p=[0.24] * 4 + [0.04]))
        keys, n1, npad = _keys_padded(s)
        sa, hist = sharded_suffix_sort(jnp.asarray(keys), npad, 32, mesh)
        ref, _ = build_suffix_array(keys, with_lcp=False)
        assert np.asarray(sa).tolist() == np.asarray(ref)[:npad].tolist()


class TestDistributedDoubling:
    @pytest.mark.parametrize("seed", range(3))
    def test_matches_single_chip(self, seed):
        import jax.numpy as jnp
        from genometools_tpu.parallel.dist_doubling import \
            distributed_build_sa
        mesh = make_mesh(8)
        rng = np.random.default_rng(seed)
        s = "".join(rng.choice(list("acgtn"), 500, p=[0.24] * 4 + [0.04]))
        keys, n1, npad = _keys_padded(s)
        sa = distributed_build_sa(jnp.asarray(keys), npad, mesh)
        ref, _ = build_suffix_array(keys, with_lcp=False)
        assert np.asarray(sa).tolist() == np.asarray(ref)[:npad].tolist()

    def test_repetitive(self):
        import jax.numpy as jnp
        from genometools_tpu.parallel.dist_doubling import \
            distributed_build_sa
        mesh = make_mesh(8)
        keys, n1, npad = _keys_padded("acg" * 120)
        sa = distributed_build_sa(jnp.asarray(keys), npad, mesh)
        ref, _ = build_suffix_array(keys, with_lcp=False)
        assert np.asarray(sa).tolist() == np.asarray(ref)[:npad].tolist()


class TestShardedDoubling:
    """Position-sharded engine: O(n/P) per-device memory and traffic
    (parallel/dist_doubling_sharded.py)."""

    @pytest.mark.parametrize("n", [16, 253, 1000, 4096])
    def test_matches_single_chip(self, n):
        from genometools_tpu.parallel.dist_doubling_sharded import \
            sharded_suffix_array
        mesh = make_mesh(8)
        rng = np.random.default_rng(n)
        s = "".join(rng.choice(list("acgtn"), n, p=[0.24] * 4 + [0.04]))
        e = Encseq.from_string(s)
        keys = e.suffix_keys()
        sa = sharded_suffix_array(keys, mesh)
        ref, _ = build_suffix_array(keys, with_lcp=False)
        assert sa.tolist() == np.asarray(ref).tolist()

    def test_repetitive_no_skew_sensitivity(self):
        # heavy rank duplication: the block-bitonic network has no
        # value-range routing, so repetitive inputs cannot overflow
        from genometools_tpu.parallel.dist_doubling_sharded import \
            sharded_suffix_array
        mesh = make_mesh(8)
        e = Encseq.from_string("acg" * 1000 + "t")
        keys = e.suffix_keys()
        sa = sharded_suffix_array(keys, mesh)
        ref, _ = build_suffix_array(keys, with_lcp=False)
        assert sa.tolist() == np.asarray(ref).tolist()

    @pytest.mark.parametrize("ndev", [1, 2, 4])
    def test_smaller_meshes(self, ndev):
        from genometools_tpu.parallel.dist_doubling_sharded import \
            sharded_suffix_array
        mesh = make_mesh(ndev)
        e = Encseq.from_string("mississippimississippi|acgtacgt")
        keys = e.suffix_keys()
        sa = sharded_suffix_array(keys, mesh)
        ref, _ = build_suffix_array(keys, with_lcp=False)
        assert sa.tolist() == np.asarray(ref).tolist()


class TestSampleSortExchange:
    """Sample-sort exchange engine (splitter broadcast + bucketed
    all_to_all, overflow-checked; ~1/P per-device traffic per round)."""

    @pytest.mark.parametrize("seed", range(4))
    def test_sample_engine_no_overflow_on_random(self, seed):
        import jax.numpy as jnp
        from genometools_tpu.parallel.dist_doubling_sharded import \
            sharded_build_sa_sample
        mesh = make_mesh(8)
        rng = np.random.default_rng(seed)
        n = int(rng.integers(300, 3000))
        s = "".join(rng.choice(list("acgtn"), n, p=[0.24] * 4 + [0.04]))
        e = Encseq.from_string(s)
        keys = e.suffix_keys()
        n1 = keys.size
        npad = 1 << max(3, (n1 - 1).bit_length())
        pad = keys.max() + 1 + np.arange(npad - n1, dtype=np.int32)
        keysp = np.concatenate([keys, pad]).astype(np.int32)
        sa, ovf = sharded_build_sa_sample(jnp.asarray(keysp), npad, mesh)
        assert int(np.asarray(ovf)) == 0, \
            "random DNA must not overflow the sample-sort buckets"
        ref, _ = build_suffix_array(keys, with_lcp=False)
        assert np.asarray(sa)[:n1].tolist() == np.asarray(ref).tolist()

    def test_bitonic_engine_still_exact(self):
        from genometools_tpu.parallel.dist_doubling_sharded import \
            sharded_suffix_array
        mesh = make_mesh(8)
        rng = np.random.default_rng(11)
        s = "".join(rng.choice(list("acgt"), 700))
        keys = Encseq.from_string(s).suffix_keys()
        sa = sharded_suffix_array(keys, mesh, engine="bitonic")
        ref, _ = build_suffix_array(keys, with_lcp=False)
        assert sa.tolist() == np.asarray(ref).tolist()

    @pytest.mark.parametrize("text", ["a" * 1200, "acg" * 500,
                                      "a" * 600 + "c" * 600])
    def test_pathological_skew_no_overflow(self, text):
        # worst-case skew (rank plateaus, sorted pad tail): the two-hop
        # balanced routing bounds every per-pair bucket by construction,
        # so even these inputs must route without overflow AND be exact
        import jax.numpy as jnp
        from genometools_tpu.parallel.dist_doubling_sharded import \
            sharded_build_sa_sample
        mesh = make_mesh(8)
        keys = Encseq.from_string(text).suffix_keys()
        n1 = keys.size
        npad = 1 << max(3, (n1 - 1).bit_length())
        pad = keys.max() + 1 + np.arange(npad - n1, dtype=np.int32)
        keysp = np.concatenate([keys, pad]).astype(np.int32)
        sa, ovf = sharded_build_sa_sample(jnp.asarray(keysp), npad, mesh)
        assert int(np.asarray(ovf)) == 0
        ref, _ = build_suffix_array(keys, with_lcp=False)
        assert np.asarray(sa)[:n1].tolist() == np.asarray(ref).tolist()


class TestDistSeedGrid:
    def test_grid_counts_match_host(self):
        from collections import Counter

        from genometools_tpu.match.seed_extend import (enumerate_kmers,
                                                       sequence_ranges)
        from genometools_tpu.parallel.dist_seed_grid import grid_mlistlen
        rng = np.random.default_rng(2)
        pieces = ["".join(rng.choice(list("acgt"), rng.integers(80, 300)))
                  for _ in range(9)]
        e = Encseq.from_string("|".join(pieces))
        k = 8
        alist = enumerate_kmers(e, k, revcomp=False)
        aranges = sequence_ranges(e, 3)
        blists = []
        for lo, hi in aranges:
            m = (alist[1] >= lo) & (alist[1] <= hi)
            blists.append((alist[0][m], alist[1][m], alist[2][m]))
        mesh = make_mesh(8)
        got = grid_mlistlen(alist, blists, aranges, mesh, selfcomp=True)
        # host mirror
        want = []
        for ai, (alo, ahi) in enumerate(aranges):
            for bi in range(ai, len(aranges)):
                cb = Counter(blists[bi][0].tolist())
                am = (alist[1] >= alo) & (alist[1] <= ahi)
                want.append(sum(cb[c] for c in alist[0][am].tolist()))
        assert got.tolist() == want
