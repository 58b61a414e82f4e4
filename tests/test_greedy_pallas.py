"""Pallas greedy-front kernel: bit-exactness vs the XLA twin and the
scalar engine (interpret mode on the CPU backend)."""

import numpy as np
import pytest

from genometools_tpu.ops import greedy_batch as gb
from genometools_tpu.ops.greedy import PolishingInfo, greedy_extend
from genometools_tpu.ops.greedy_pallas import (greedy_chunk_pallas,
                                               greedy_full_pallas)


@pytest.fixture()
def pallas_chunk(monkeypatch):
    def shim(*a, **kw):
        return greedy_chunk_pallas(*a, **kw, interpret=True)
    monkeypatch.setattr(gb, "greedy_chunk_impl", shim)


def _random_pairs(rng, n, err, length):
    us, vs = [], []
    for _ in range(n):
        u = rng.integers(0, 4, length).astype(np.uint8)
        v = u.copy()
        nmut = int(err * length)
        for p in rng.integers(0, length, nmut):
            v[p] = rng.integers(0, 4)
        # occasional specials and indels
        if rng.random() < 0.3:
            v = np.delete(v, rng.integers(0, len(v), 2))
        if rng.random() < 0.3:
            u[rng.integers(0, len(u))] = 254
        us.append(u)
        vs.append(v)
    return us, vs


class TestGreedyPallasLockstep:
    @pytest.mark.parametrize("err", [0.02, 0.15, 0.4])
    def test_matches_scalar_engine(self, pallas_chunk, err):
        rng = np.random.default_rng(int(err * 100))
        us, vs = _random_pairs(rng, 48, err, 300)
        pol = PolishingInfo.new(20.0, 60)
        res = gb.greedy_extend_batch(
            us, vs, seedlengths=14, perc_mat_history=55,
            maxalignedlendifference=30, pol_info=pol, history=60)
        for i in range(len(us)):
            if res["fallback"][i]:
                continue
            _, best = greedy_extend(
                us[i], vs[i], max_history=60, perc_mat_history=55,
                maxalignedlendifference=30, seedlength=14, pol_info=pol)
            assert res["alignedlen"][i] == best.alignedlen, i
            assert res["row"][i] == best.row, i
            assert res["distance"][i] == best.distance, i
            assert res["mismatches"][i] == best.max_mismatches, i

    @pytest.mark.parametrize("err", [0.02, 0.15, 0.4])
    def test_single_shot_matches_scalar(self, monkeypatch, err):
        # the fast path: gen-0 built in-kernel, whole task in one call;
        # undone lanes must fall through to the chunked path untouched
        def full_shim(*a, **kw):
            return greedy_full_pallas(*a, **kw, interpret=True)
        monkeypatch.setattr(gb, "greedy_full_impl", full_shim)
        rng = np.random.default_rng(17 + int(err * 100))
        us, vs = _random_pairs(rng, 48, err, 300)
        pol = PolishingInfo.new(20.0, 60)
        res = gb.greedy_extend_batch(
            us, vs, seedlengths=14, perc_mat_history=55,
            maxalignedlendifference=30, pol_info=pol, history=60)
        assert not res["fallback"].any()
        for i in range(len(us)):
            _, best = greedy_extend(
                us[i], vs[i], max_history=60, perc_mat_history=55,
                maxalignedlendifference=30, seedlength=14, pol_info=pol)
            assert res["alignedlen"][i] == best.alignedlen, i
            assert res["row"][i] == best.row, i
            assert res["distance"][i] == best.distance, i
            assert res["mismatches"][i] == best.max_mismatches, i

    def test_matches_xla_chunk_on_long_extensions(self, monkeypatch):
        # long near-identical pair exercises window rebasing + pause
        rng = np.random.default_rng(7)
        u = rng.integers(0, 4, 2000).astype(np.uint8)
        v = u.copy()
        for p in rng.integers(0, 2000, 60):
            v[p] = rng.integers(0, 4)
        pol = PolishingInfo.new(20.0, 60)
        kw = dict(seedlengths=14, perc_mat_history=55,
                  maxalignedlendifference=30, pol_info=pol, history=60)
        ref = gb.greedy_extend_batch([u] * 3, [v] * 3, **kw)

        def shim(*a, **kws):
            return greedy_chunk_pallas(*a, **kws, interpret=True)
        monkeypatch.setattr(gb, "greedy_chunk_impl", shim)
        got = gb.greedy_extend_batch([u] * 3, [v] * 3, **kw)
        for key in ("alignedlen", "row", "distance", "mismatches",
                    "died", "fallback"):
            assert np.array_equal(ref[key], got[key]), key
