"""Pallas xdrop kernel vs the scalar mirror (interpret mode on CPU).

The scalar engine ops/xdrop.xdrop_extend is the golden oracle (itself
verified against the reference semantics, ref: src/match/xdrop.c:224).
Every lane the kernel reports as safe must match it bit for bit; unsafe
lanes are re-run on the host by the dispatcher, which is also checked.
"""

import numpy as np
import pytest

from genometools_tpu.ops.xdrop import XdropBest, xdrop_extend
from genometools_tpu.ops.xdrop_pallas import (pack_xdrop_tasks,
                                              xdrop_full_pallas)


def _random_tasks(rng, n, maxlen, identity=0.85):
    """Homology-shaped task pairs: v is a mutated copy of u, so the
    front actually extends (uniform random pairs die at d~3)."""
    us, vs = [], []
    for _ in range(n):
        lu = int(rng.integers(5, maxlen))
        u = rng.integers(0, 4, lu).astype(np.uint8)
        v = []
        i = 0
        while i < lu:
            r = rng.random()
            if r < identity:
                v.append(u[i])
                i += 1
            elif r < identity + 0.05:
                v.append(rng.integers(0, 4))
                i += 1
            elif r < identity + 0.10:
                i += 1                      # deletion in v
            else:
                v.append(rng.integers(0, 4))  # insertion in v
        v = np.asarray(v, np.uint8)[:maxlen]
        if v.size == 0:
            v = rng.integers(0, 4, 3).astype(np.uint8)
        us.append(u)
        vs.append(v)
    return us, vs


@pytest.mark.parametrize("belowscore", [4, 7])
def test_pallas_matches_scalar(belowscore):
    rng = np.random.default_rng(7)
    W, D, GENS = 128, 16, 96
    us, vs = _random_tasks(rng, 64, W - 2)
    # pad the lane count so every length-sorted block is full
    n = len(us)
    PK = pack_xdrop_tasks(us, vs, W)
    out = xdrop_full_pallas(PK, belowscore, W, D=D, GENS=GENS,
                            interpret=True)
    bi, bj, bs, unsafe = out[0][:n], out[1][:n], out[2][:n], out[3][:n]
    n_safe = 0
    for t in range(n):
        ref = xdrop_extend(us[t], vs[t], belowscore)
        if unsafe[t]:
            continue
        n_safe += 1
        assert (bi[t], bj[t], bs[t]) == \
            (ref.ivalue, ref.jvalue, ref.score), f"task {t}"
    assert n_safe >= n // 2, "kernel must finish most homology tasks"


def test_pallas_specials_and_tiny():
    """Wildcards never match; zero-ish tasks terminate instantly."""
    rng = np.random.default_rng(3)
    W, D = 128, 16
    us, vs = _random_tasks(rng, 30, 100)
    for i in range(0, 30, 3):       # sprinkle wildcard codes
        u = us[i].copy()
        u[rng.integers(0, len(u))] = 254
        us[i] = u
    us.append(np.array([1, 2, 3], np.uint8))
    vs.append(np.array([1, 2, 3], np.uint8))
    us.append(np.array([0], np.uint8))
    vs.append(np.array([3, 3], np.uint8))
    PK = pack_xdrop_tasks(us, vs, W)
    out = xdrop_full_pallas(PK, 7, W, D=D, GENS=96, interpret=True)
    for t in range(len(us)):
        if out[3][t]:
            continue
        ref = xdrop_extend(us[t], vs[t], 7)
        assert (out[0][t], out[1][t], out[2][t]) == \
            (ref.ivalue, ref.jvalue, ref.score), f"task {t}"


def test_dispatcher_pallas_path_exact(monkeypatch):
    """xdrop_extend_batch_exact with the Pallas engine forced on must
    equal the pure host result on every lane (unsafe lanes re-routed)."""
    from genometools_tpu.ops import xdrop_batch as xb
    monkeypatch.setenv("GT_TPU_PALLAS_XDROP", "interpret")
    rng = np.random.default_rng(11)
    us, vs = _random_tasks(rng, 48, 300)
    iv, jv, sv = xb.xdrop_extend_batch_exact(us, vs, 7)
    for t in range(len(us)):
        ref = xdrop_extend(us[t], vs[t], 7)
        assert (iv[t], jv[t], sv[t]) == \
            (ref.ivalue, ref.jvalue, ref.score), f"task {t}"


def test_pool_resident_batch_exact():
    """Pool-descriptor batch == scalar engine on random lanes."""
    import os

    import numpy as np

    from genometools_tpu.ops.xdrop import xdrop_extend
    from genometools_tpu.ops.xdrop_batch import xdrop_extend_batch_pool
    os.environ["GT_TPU_PALLAS_XDROP"] = "interpret"
    try:
        rng = np.random.default_rng(17)
        pool = rng.integers(0, 4, 3000).astype(np.uint8)
        N = 24
        uo = rng.integers(0, 2500, N)
        ul = rng.integers(1, 200, N)
        vo = rng.integers(0, 2500, N)
        vl = rng.integers(1, 200, N)
        rv = rng.integers(0, 2, N).astype(bool)
        iv, jv, sv = xdrop_extend_batch_pool(pool, uo, ul, vo, vl, rv, 7)
        for i in range(N):
            u = pool[uo[i]:uo[i] + ul[i]]
            v = pool[vo[i]:vo[i] + vl[i]]
            if rv[i]:
                u, v = u[::-1], v[::-1]
            b = xdrop_extend(u, v, 7)
            assert (iv[i], jv[i], sv[i]) == \
                (b.ivalue, b.jvalue, b.score)
    finally:
        del os.environ["GT_TPU_PALLAS_XDROP"]
