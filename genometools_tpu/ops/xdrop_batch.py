"""Batched xdrop extension on device (JAX/XLA).

The device counterpart of ops/xdrop.py: thousands of seed extensions run
as lanes of one fixed-shape front recurrence (semantics equivalent of
ref: src/match/xdrop.c:224, matching the scalar mirror bit for bit —
verified by tests against ops/xdrop.xdrop_extend).

Design per the survey's "batched extension with per-seed lanes" plan:
  * windows: U, V are uint8[N, W] (clipped extension windows, padded with
    255); per-seed true lengths ulen/vlen
  * match-run table: R[n, k, i] = length of the exact match run starting
    at u-position i on diagonal k (j = i - k), built with one reverse
    lax.scan — this replaces the sequential lcp() calls inside the front
    loop with a gather
  * the d-generation loop is a lax.fori_loop over fixed D_MAX
    generations; fronts are int32[N, K] with -inf for invalid diagonals,
    lbound/ubound tracked per lane, termination by masks
  * the X-drop prune tests EVAL against the best score dback generations
    back (big_t ring), exactly like the reference

Unit distances (scores mat=2 mis=-1 ins=-2 del=-2 => all distance 1,
gcd 3) — the combination every reference pipeline uses.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEGINF = jnp.int32(-(2 ** 30))


def _match_run_table(U, V, W: int, D: int):
    """R[n, k, i]: match-run length at (i, j=i-(k-D)) for diagonal index
    k in [0, 2D]; 0 where out of bounds or mismatch."""
    N = U.shape[0]
    K = 2 * D + 1
    i_idx = jnp.arange(W)[None, None, :]                 # (1,1,W)
    k_off = (jnp.arange(K) - D)[None, :, None]           # (1,K,1)
    j_idx = i_idx - k_off                                # (1,K,W)
    j_ok = (j_idx >= 0) & (j_idx < W)
    j_safe = jnp.clip(j_idx, 0, W - 1)
    u = U[:, None, :]                                    # (N,1,W)
    v = jnp.take_along_axis(
        jnp.broadcast_to(V[:, None, :], (N, K, W)),
        jnp.broadcast_to(j_safe, (N, K, W)), axis=2)
    m = (u == v) & (u < 4) & j_ok                        # (N,K,W) bool
    # reverse scan: run[i] = m[i] ? run[i+1]+1 : 0

    def step(carry, mcol):
        run = jnp.where(mcol, carry + 1, 0)
        return run, run

    m_t = jnp.moveaxis(m, 2, 0)                          # (W,N,K)
    _, runs = jax.lax.scan(step, jnp.zeros((N, K), jnp.int32), m_t[::-1])
    R = jnp.moveaxis(runs[::-1], 0, 2)                   # (N,K,W)
    return R


@partial(jax.jit, static_argnames=("W", "D"))
def xdrop_extend_batch_impl(U, V, ulen, vlen, belowscore, W: int, D: int):
    """Returns (ivalue, jvalue, score, unsafe) int32/bool[N] per pair.

    unsafe marks lanes whose result is NOT provably equal to the
    unbounded scalar engine: a front cell reached the u/v window end
    (meaningful when the caller clipped the window) or the front was
    still alive at generation D."""
    N = U.shape[0]
    K = 2 * D + 1
    karr = jnp.arange(K, dtype=jnp.int32) - D            # diagonal values
    R = _match_run_table(U, V, W, D)

    gcd = jnp.int32(3)
    dback = (belowscore + 1) // gcd + 1

    def EVAL(ij, d):
        return ij - 3 * d

    w_iota = jnp.arange(W, dtype=jnp.int32)[None, None, :]

    def lcp_at(row_i):
        """R[n, k, i] via one-hot multiply-reduce — per-lane gathers are
        slow on TPU; an elementwise select + reduction over W rides the
        VPU instead."""
        onehot = (row_i[:, :, None] == w_iota)
        vals = jnp.sum(jnp.where(onehot, R, 0), axis=2)
        return jnp.where((row_i >= 0) & (row_i < W), vals, 0)

    # phase 0
    init_lcp = R[:, D, 0]
    row0 = jnp.full((N, K), NEGINF, jnp.int32).at[:, D].set(init_lcp)
    finished0 = (init_lcp >= ulen) | (init_lcp >= vlen)
    lb0 = jnp.where(finished0, jnp.int32(1), jnp.int32(0))
    ub0 = jnp.where(finished0, jnp.int32(-1), jnp.int32(0))
    best0 = jnp.stack([init_lcp, init_lcp, EVAL(2 * init_lcp, 0)], axis=1)
    bigt0 = jnp.full((N, D + 2), NEGINF, jnp.int32).at[:, 0].set(best0[:, 2])

    kk = karr[None, :]

    def gen(d, carry):
        row, lb, ub, best, bigt, touched, capped = carry
        active = lb <= ub
        dd = d - 1
        # candidate rows from previous front
        del_row = jnp.pad(row, ((0, 0), (1, 0)),
                          constant_values=int(NEGINF))[:, :K]   # from k-1
        ins_row = jnp.pad(row, ((0, 0), (0, 1)),
                          constant_values=int(NEGINF))[:, 1:]   # from k+1
        in_prev = (kk >= -dd) & (kk <= dd)
        in_prev_m1 = (kk - 1 >= -dd) & (kk - 1 <= dd)
        in_prev_p1 = (kk + 1 >= -dd) & (kk + 1 <= dd)

        cand_del = jnp.where((lb[:, None] < kk) & in_prev_m1,
                             del_row + 1, NEGINF)
        cand_mis = jnp.where((lb[:, None] <= kk) & (kk <= ub[:, None])
                             & in_prev, row + 1, NEGINF)
        cand_ins = jnp.where((kk < ub[:, None]) & in_prev_p1,
                             ins_row, NEGINF)
        # priority DEL, then MIS if strictly greater, then INS if strictly
        # greater (reference order: del, replacement, insertion)
        i_new = cand_del
        i_new = jnp.where(cand_mis > i_new, cand_mis, i_new)
        i_new = jnp.where(cand_ins > i_new, cand_ins, i_new)
        i_new = jnp.where((lb[:, None] - 1 <= kk)
                          & (kk <= ub[:, None] + 1), i_new, NEGINF)
        has = i_new >= 0

        j_new = i_new - kk
        # X-drop prune
        prevd = d - dback
        tref = jnp.sum(jnp.where(
            jnp.arange(D + 2)[None, :] == jnp.clip(prevd, 0, D + 1),
            bigt, 0), axis=1)
        pruned = (prevd > 0) & has & \
            (EVAL(i_new + j_new, d) < tref[:, None] - belowscore)
        i_new = jnp.where(pruned, NEGINF, i_new)
        has = i_new >= 0

        # update-condition: k outside previous window always updates;
        # else requires prevrow < i <= min(ulen, vlen+k)
        minuv = jnp.minimum(ulen[:, None], vlen[:, None] + kk)
        cond_edge = (kk <= -d) | (kk >= d)
        cond_mid = (row < i_new) & (i_new <= minuv)
        takes = has & (cond_edge | cond_mid)
        keeps = has & ~takes                      # keep previous row value

        # lcp extension for taken cells with room left
        j_tmp = i_new - kk
        can_ext = takes & (i_new < ulen[:, None]) & (j_tmp < vlen[:, None])
        ext = jnp.where(can_ext, lcp_at(i_new), 0)
        i_ext = i_new + ext

        new_row = jnp.where(takes, i_ext, jnp.where(keeps, row, NEGINF))
        new_row = jnp.where(active[:, None], new_row, row)

        # best update
        j_ext = i_ext - kk
        sc = EVAL(i_ext + j_ext, d)
        sc = jnp.where(takes & active[:, None], sc, NEGINF)
        kbest = jnp.argmax(sc, axis=1)
        scbest = jnp.take_along_axis(sc, kbest[:, None], axis=1)[:, 0]
        better = scbest > best[:, 2]
        ib = jnp.take_along_axis(i_ext, kbest[:, None], axis=1)[:, 0]
        jb = jnp.take_along_axis(j_ext, kbest[:, None], axis=1)[:, 0]
        best = jnp.where(better[:, None],
                         jnp.stack([ib, jb, scbest], axis=1), best)
        bigt = jnp.where(active[:, None],
                         jax.lax.dynamic_update_slice(
                             bigt, best[:, 2][:, None],
                             (0, jnp.clip(d, 0, D + 1))),
                         bigt)

        # termination: reached end diagonal with full row
        end_k = ulen - vlen
        end_idx = jnp.clip(end_k + D, 0, K - 1)
        row_at_end = jnp.take_along_axis(new_row, end_idx[:, None],
                                         axis=1)[:, 0]
        done_align = (jnp.abs(end_k) <= d) & (row_at_end == ulen)

        # bounds pruning
        has_row = new_row > NEGINF
        first_k = jnp.argmax(has_row, axis=1)
        last_k = K - 1 - jnp.argmax(has_row[:, ::-1], axis=1)
        any_row = has_row.any(axis=1)
        new_lb = jnp.where(any_row, first_k - D, jnp.int32(1))
        new_ub = jnp.where(any_row, last_k - D, jnp.int32(-1))
        # boundary handling: largest k<=0 with row == vlen+k -> lbound
        hit_v = has_row & (new_row == vlen[:, None] + kk) & (kk <= 0) & \
            (kk >= new_lb[:, None])
        anyv = hit_v.any(axis=1)
        kv = K - 1 - jnp.argmax(hit_v[:, ::-1], axis=1) - D
        new_lb = jnp.where(anyv, jnp.maximum(new_lb, kv), new_lb)
        # smallest k>=0 with row == ulen -> ubound
        hit_u = has_row & (new_row == ulen[:, None]) & (kk >= 0) & \
            (kk <= new_ub[:, None])
        anyu = hit_u.any(axis=1)
        ku = jnp.argmax(hit_u, axis=1) - D
        new_ub = jnp.where(anyu, jnp.minimum(new_ub, ku), new_ub)

        stop = done_align | ~any_row | (d >= D)
        new_lb = jnp.where(active & ~stop, new_lb, jnp.int32(1))
        new_ub = jnp.where(active & ~stop, new_ub, jnp.int32(-1))
        new_lb = jnp.where(active, new_lb, lb)
        new_ub = jnp.where(active, new_ub, ub)
        # window-edge contact: any taken cell reaching i == ulen or
        # j == vlen (only meaningful for clipped lanes; the caller
        # combines this with its clip mask)
        edge = takes & ((i_ext >= ulen[:, None]) |
                        (j_ext >= vlen[:, None]))
        touched = touched | (active & edge.any(axis=1))
        # still alive at the generation cap: result unverified
        capped = capped | ((d >= D) & active & ~done_align & any_row)
        return new_row, new_lb, new_ub, best, bigt, touched, capped

    row, lb, ub, best, bigt, touched, capped = jax.lax.fori_loop(
        1, D + 1, gen, (row0, lb0, ub0, best0, bigt0,
                        jnp.zeros(N, jnp.bool_), jnp.zeros(N, jnp.bool_)))
    # phase-0 full-window hits count as edge contact too
    touched = touched | (init_lcp >= ulen) | (init_lcp >= vlen)
    return best[:, 0], best[:, 1], best[:, 2], touched, capped


def xdrop_extend_batch(us, vs, belowscore: int, W: int = 128, D: int = 48):
    """Host-friendly wrapper: list of uint8 arrays -> (i, j, score) arrays.

    Windows are clipped to W; D bounds the explored distance (front
    generations). With the default X-drop thresholds (<= 7) the front
    dies long before 48 generations, so results equal the unbounded
    scalar engine whenever ulen, vlen <= W.
    """
    i, j, s, _ = _run_device(us, vs, belowscore, W, D)
    return i, j, s


def _run_device(us, vs, belowscore: int, W: int, D: int):
    N = len(us)
    U = np.full((N, W), 255, np.uint8)
    V = np.full((N, W), 255, np.uint8)
    ulen = np.zeros(N, np.int32)
    vlen = np.zeros(N, np.int32)
    clipped = np.zeros(N, bool)
    for i, (u, v) in enumerate(zip(us, vs)):
        lu = min(len(u), W)
        lv = min(len(v), W)
        U[i, :lu] = u[:lu]
        V[i, :lv] = v[:lv]
        ulen[i] = lu
        vlen[i] = lv
        clipped[i] = len(u) > W or len(v) > W
    i, j, s, touched, capped = xdrop_extend_batch_impl(
        jnp.asarray(U), jnp.asarray(V), jnp.asarray(ulen),
        jnp.asarray(vlen), jnp.int32(belowscore), W, D)
    unsafe = (np.asarray(touched) & clipped) | np.asarray(capped)
    return np.asarray(i), np.asarray(j), np.asarray(s), unsafe


def _use_pallas_xdrop():
    """Pallas is the bulk engine on TPU; "interpret" forces the
    interpret-mode kernel (tests); "0"/"off" disables."""
    import os
    env = os.environ.get("GT_TPU_PALLAS_XDROP")
    if env is not None:
        if env == "interpret":
            return "interpret"
        return env not in ("0", "off", "no")
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _host_exact(us, vs, belowscore):
    """Exact host engine: C++ batch if built, else the scalar mirror."""
    from ..core.native import xdrop_batch_native
    res = xdrop_batch_native(us, vs, belowscore)
    if res is not None:
        return (res[:, 0].astype(np.int64), res[:, 1].astype(np.int64),
                res[:, 2].astype(np.int64))
    from .xdrop import xdrop_extend
    iv = np.zeros(len(us), np.int64)
    jv = np.zeros(len(us), np.int64)
    sv = np.zeros(len(us), np.int64)
    for t, (u, v) in enumerate(zip(us, vs)):
        best = xdrop_extend(u, v, belowscore)
        iv[t], jv[t], sv[t] = best.ivalue, best.jvalue, best.score
    return iv, jv, sv


def _pallas_tiered(us, vs, belowscore: int, interpret: bool):
    """VMEM-resident Pallas bulk engine with exact-host cleanup.

    Lanes are routed per tier window (256/512); lanes too long, with an
    out-of-band end diagonal, or flagged unsafe by the kernel
    (slot-edge contact / generation cap) re-run on the host engine, so
    the merged result is bit-equal to the scalar mirror everywhere."""
    from .xdrop_pallas import (_block_lanes, pack_xdrop_tasks,
                               xdrop_full_pallas)
    D = 32    # K=65: half the vector width of D=64; the rare lane
    #           whose front leaves the band falls back exactly anyway
    N = len(us)
    iv = np.zeros(N, np.int64)
    jv = np.zeros(N, np.int64)
    sv = np.zeros(N, np.int64)
    lens = np.array([max(len(u), len(v)) for u, v in zip(us, vs)])
    dif = np.array([abs(len(u) - len(v)) for u, v in zip(us, vs)])
    host_mask = (lens > 512) | (dif > D)
    pending = []                # device waves in flight (async fetch)
    for W in (256, 512):
        tier = np.flatnonzero(~host_mask & (lens <= W))
        host_mask[tier] = True  # claimed
        if tier.size == 0:
            continue
        # length-sorted lanes keep each block's generation count
        # homogeneous (blocks exit as soon as all their lanes die)
        tier = tier[np.argsort(lens[tier], kind="stable")]
        BLK = _block_lanes(2 * D + 1, int(tier.size))
        npad = -(-tier.size // BLK) * BLK
        tu = [us[t] for t in tier] + [np.zeros(0, np.uint8)] * \
            (npad - tier.size)
        tv = [vs[t] for t in tier] + [np.zeros(0, np.uint8)] * \
            (npad - tier.size)
        PK = pack_xdrop_tasks(tu, tv, W)
        out = xdrop_full_pallas(PK, belowscore, W, D=D, GENS=512,
                                interpret=interpret, sync=False)
        pending.append((tier, out))
    bad_idx = []
    for tier, out in pending:
        out = np.asarray(out)
        n = tier.size
        iv[tier] = out[0][:n]
        jv[tier] = out[1][:n]
        sv[tier] = out[2][:n]
        bad_idx.append(tier[out[3][:n] != 0])
    redo = np.concatenate(
        [np.flatnonzero((lens > 512) | (dif > D))] + bad_idx) \
        if bad_idx else np.flatnonzero((lens > 512) | (dif > D))
    if redo.size:
        hi, hj, hs = _host_exact([us[t] for t in redo],
                                 [vs[t] for t in redo], belowscore)
        iv[redo] = hi
        jv[redo] = hj
        sv[redo] = hs
    return iv, jv, sv


def xdrop_extend_batch_exact(us, vs, belowscore: int, max_w: int = 512,
                             D: int = 64):
    """Product-path batch: Pallas VMEM kernel for the bulk on TPU, exact
    host engine for lanes the device cannot verify (window clipped AND
    a front cell reached the clip edge, or the front outlived the
    generation cap). Output is bit-equal to running the scalar engine
    (ref: src/match/xdrop.c:224) on every pair.

    Returns (ivalue, jvalue, score) int arrays of length len(us)."""
    N = len(us)
    if N == 0:
        z = np.zeros(0, np.int64)
        return z, z, z
    pall = _use_pallas_xdrop()
    if pall:
        return _pallas_tiered(us, vs, belowscore,
                              interpret=(pall == "interpret"))
    # the C++ batch is the fast exact host engine for this front shape
    # (measured ~170k ext/s vs ~3k for the lax device batch, which is
    # gather-bound); use the lax device kernel only when no native lib
    from ..core.native import xdrop_batch_native
    res = xdrop_batch_native(us, vs, belowscore)
    if res is not None:
        return (res[:, 0].astype(np.int64), res[:, 1].astype(np.int64),
                res[:, 2].astype(np.int64))
    maxlen = max(max(len(u), len(v)) for u, v in zip(us, vs))
    W = 64
    while W < maxlen and W < max_w:
        W *= 2
    iv, jv, sv, unsafe = _run_device(us, vs, belowscore, W, D)
    iv = iv.astype(np.int64)
    jv = jv.astype(np.int64)
    sv = sv.astype(np.int64)
    bad = np.flatnonzero(unsafe)
    if bad.size:
        from ..core.native import xdrop_batch_native
        res = xdrop_batch_native([us[b] for b in bad],
                                 [vs[b] for b in bad], belowscore)
        if res is not None:
            iv[bad] = res[:, 0]
            jv[bad] = res[:, 1]
            sv[bad] = res[:, 2]
        else:
            from .xdrop import xdrop_extend
            for b in bad:
                best = xdrop_extend(us[b], vs[b], belowscore)
                iv[b], jv[b], sv[b] = best.ivalue, best.jvalue, best.score
    return iv, jv, sv


@partial(jax.jit, static_argnames=("W0",))
def _xdrop_pk_from_pool(gp, desc, W0: int):
    """Device window builder for the xdrop PK layout: the greedy pool
    gather (ops.greedy_batch._pk_from_pool) minus its seedlen column —
    per-lane upload is the 12-byte descriptor, windows never touch the
    host."""
    from .greedy_batch import _pk_from_pool
    W32 = W0 // 32
    pk = _pk_from_pool(gp, desc, W0)
    return jnp.concatenate([pk[:, :6 * W32], pk[:, 6 * W32 + 1:]],
                           axis=1)


def xdrop_extend_batch_pool(pool, u_off, u_len, v_off, v_len, rev,
                            belowscore: int):
    """Pool-resident exact xdrop batch: the packed pool uploads once,
    waves send int32 descriptors, Pallas tiers compute, and unverified
    lanes re-run on the exact host engine — bit-equal to the scalar
    engine everywhere (device-resident task descriptors; the transfer
    cost drops from packed windows to 12 B/lane)."""
    N = int(np.asarray(u_off).size)
    if N == 0:
        z = np.zeros(0, np.int64)
        return z, z, z
    u_off = np.asarray(u_off, np.int64)
    u_len = np.asarray(u_len, np.int64)
    v_off = np.asarray(v_off, np.int64)
    v_len = np.asarray(v_len, np.int64)
    rev = np.asarray(rev, bool)

    def materialize(idx):
        us, vs = [], []
        for i in idx:
            u = pool[u_off[i]:u_off[i] + u_len[i]]
            v = pool[v_off[i]:v_off[i] + v_len[i]]
            if rev[i]:
                u, v = u[::-1], v[::-1]
            us.append(u)
            vs.append(v)
        return us, vs

    pall = _use_pallas_xdrop()
    if not pall or pool.size >= 1 << 31:
        us, vs = materialize(np.arange(N))
        return xdrop_extend_batch_exact(us, vs, belowscore)

    from .greedy_batch import _pack_desc, pack_pool
    from .xdrop_pallas import _block_lanes, xdrop_full_pallas

    D = 32
    lens = np.maximum(u_len, v_len)
    dif = np.abs(u_len - v_len)
    host_mask = (lens > 512) | (dif > D)
    iv = np.zeros(N, np.int64)
    jv = np.zeros(N, np.int64)
    sv = np.zeros(N, np.int64)
    gp = jnp.asarray(pack_pool(pool))
    T = pool.size
    us_ = np.where(rev, T - u_off - u_len, u_off).astype(np.int32)
    vs_ = np.where(rev, T - v_off - v_len, v_off).astype(np.int32)
    desc_all = np.stack(
        [us_, u_len.astype(np.int32), vs_, v_len.astype(np.int32),
         rev.astype(np.int32), np.zeros(N, np.int32)], axis=1)
    pending = []
    for W in (256, 512):
        tier = np.flatnonzero(~host_mask & (lens <= W))
        host_mask[tier] = True
        if tier.size == 0:
            continue
        tier = tier[np.argsort(lens[tier], kind="stable")]
        BLK = _block_lanes(2 * D + 1, int(tier.size))
        npad = -(-tier.size // BLK) * BLK
        desc = np.zeros((npad, 3), np.int32)
        desc[:tier.size] = _pack_desc(desc_all[tier])
        pk = _xdrop_pk_from_pool(gp, jnp.asarray(desc), W)
        out = xdrop_full_pallas(pk, belowscore, W, D=D, GENS=512,
                                interpret=(pall == "interpret"),
                                sync=False)
        pending.append((tier, out))
    bad_idx = []
    for tier, out in pending:
        out = np.asarray(out)
        n = tier.size
        iv[tier] = out[0][:n]
        jv[tier] = out[1][:n]
        sv[tier] = out[2][:n]
        bad_idx.append(tier[out[3][:n] != 0])
    redo = np.concatenate(
        [np.flatnonzero((lens > 512) | (dif > D))] + bad_idx)
    if redo.size:
        us, vs = materialize(redo)
        hi, hj, hs = _host_exact(us, vs, belowscore)
        iv[redo] = hi
        jv[redo] = hj
        sv[redo] = hs
    return iv, jv, sv
