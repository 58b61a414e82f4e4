"""Pallas TPU kernel for batched xdrop extension.

The VMEM-resident device engine for ops.xdrop_batch (the front
recurrence mirroring ref: src/match/xdrop.c:224-430 with unit
distances): each program keeps its block's whole front plus the match
bitmask in VMEM across all generations, so HBM sees each lane's state
once in, once out.

Single-shot design (the greedy_full_pallas treatment from
ops/greedy_pallas.py): tasks whose u and v windows both fit one
W-window run generation 0 (initial lcp) and the whole d-generation
loop inside the kernel.  Lanes the kernel cannot finish exactly —
a live front cell on the diagonal-slot edge, or the GENS cap —
come back `unsafe` and are re-run by the caller on the exact host
engine, so combined results stay bit-equal to ops/xdrop.xdrop_extend.

Layout identical to the greedy kernel: state travels as (K, BLK) with
the diagonal-slot axis on sublanes and the 128-lane axis minor;
per-lane scalars as (1, BLK) rows.  The run-length extension (the
reference's sequential lcp() calls) reads a precomputed per-diagonal
match bitmask with a count-trailing-zeros loop — no gathers.

Kernel-safe rewrites (verified bit-exact by tests/test_xdrop_pallas.py
against the scalar mirror):
  * bool while-loop carries travel as int32 masks;
  * argmax/take_along_axis become one-hot min/max reductions;
  * the big_t generation ring is a fixed (dback, BLK) buffer rolled one
    row per generation (dback is static because belowscore is);
  * the generation loop is a while_loop that exits as soon as every
    lane in the block is inactive, unrolled 2 generations per iteration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .greedy_batch import (_U32, _ctz32, _match_from_planes,
                           _planes_from_bits, pack_codes)

NEGINF = -(2 ** 30)
UNROLL = 4


def _block_lanes(K: int, N: int) -> int:
    if K <= 80:
        blk = 512
    elif K <= 160:
        blk = 256
    else:
        blk = 128
    return min(blk, N)


def _make_kernel(W: int, D: int, GENS: int, belowscore: int):
    """Unit-distance xdrop front kernel (scores mat=2 mis=-1 ins/del=-2
    => all distances 1, gcd 3, EVAL(i+j, d) = i+j - 3d — the
    combination every reference pipeline uses; the caller asserts it)."""
    K = 2 * D + 1
    W32 = W // 32
    dback = (belowscore + 1) // 3 + 1

    def kernel(M_ref, ulen_ref, vlen_ref,
               bi_o, bj_o, bs_o, unsafe_o):
        M = M_ref[:]                        # (W32, K, BLK)
        ulen = ulen_ref[:]                  # (1, BLK)
        vlen = vlen_ref[:]
        BLK = ulen.shape[1]
        sidx = jax.lax.broadcasted_iota(jnp.int32, (K, BLK), 0)
        kk = sidx - D

        def fetch_word(w):
            acc = jnp.zeros((K, BLK), _U32)
            for wi in range(W32):
                acc = jnp.where(w == wi, M[wi], acc)
            return jnp.where((w >= 0) & (w < W32), acc, _U32(0))

        def run_extend(row, valid):
            """Advance row by the exact-match run length on its diagonal
            (the bitmask is zero at mismatches, specials and beyond the
            padded window, so runs stop exactly where _lcp does)."""
            def cond(st):
                return jnp.sum(st[0]) > 0

            def body(st):
                cont_i, row = st
                cont = cont_i != 0
                wi = row >> 5
                off = (row & 31).astype(_U32)
                w0 = fetch_word(wi)
                w1 = fetch_word(wi + 1)
                hi_sh = jnp.clip(32 - off.astype(jnp.int32), 1, 31) \
                    .astype(_U32)
                bits = (w0 >> off) | jnp.where(off > 0, w1 << hi_sh,
                                               _U32(0))
                c = jnp.where(cont, _ctz32(~bits), 0)
                row = row + c
                return ((cont & (c == 32)).astype(jnp.int32), row)

            cont0 = valid & (row >= 0) & (row < W)
            _, row = jax.lax.while_loop(
                cond, body, (cont0.astype(jnp.int32), row))
            return row

        def pick_first(mask, a):
            """a at the lowest slot where mask, per lane (argmax rule)."""
            fidx = jnp.min(jnp.where(mask, sidx, K), axis=0,
                           keepdims=True)
            return jnp.sum(jnp.where(sidx == fidx, a, 0), axis=0,
                           keepdims=True)

        # ---- generation 0: initial lcp on the centre diagonal
        center = sidx == D
        row0 = run_extend(jnp.where(center, 0, NEGINF), center)
        init_lcp = jnp.sum(jnp.where(center, row0, 0), axis=0,
                           keepdims=True)                     # (1, BLK)
        finished0 = (init_lcp >= ulen) | (init_lcp >= vlen)
        lb = jnp.where(finished0, 1, 0)
        ub = jnp.where(finished0, -1, 0)
        row = jnp.where(center, init_lcp, NEGINF)
        best_i = init_lcp
        best_j = init_lcp
        best_s = 2 * init_lcp
        btq = jnp.broadcast_to(best_s, (dback, BLK)) + \
            jnp.zeros((dback, BLK), jnp.int32)
        unsafe = jnp.zeros((1, BLK), jnp.int32)

        def gen(d, row, lb, ub, best_i, best_j, best_s, btq, unsafe):
            active = lb <= ub                                 # (1, BLK)
            dd = d - 1
            # candidates from the previous front (priority del, mis, ins
            # — value-identical to max since only the row is kept)
            del_row = jnp.where(sidx == 0, NEGINF,
                                jnp.roll(row, 1, axis=0))     # row[k-1]
            ins_row = jnp.where(sidx == K - 1, NEGINF,
                                jnp.roll(row, -1, axis=0))    # row[k+1]
            in_prev = (kk >= -dd) & (kk <= dd)
            in_prev_m1 = (kk - 1 >= -dd) & (kk - 1 <= dd)
            in_prev_p1 = (kk + 1 >= -dd) & (kk + 1 <= dd)
            cand_del = jnp.where((lb < kk) & in_prev_m1,
                                 del_row + 1, NEGINF)
            cand_mis = jnp.where((lb <= kk) & (kk <= ub) & in_prev,
                                 row + 1, NEGINF)
            cand_ins = jnp.where((kk < ub) & in_prev_p1,
                                 ins_row, NEGINF)
            i_new = cand_del
            i_new = jnp.where(cand_mis > i_new, cand_mis, i_new)
            i_new = jnp.where(cand_ins > i_new, cand_ins, i_new)
            i_new = jnp.where((lb - 1 <= kk) & (kk <= ub + 1),
                              i_new, NEGINF)
            has = i_new >= 0

            # X-drop prune against the best score dback generations back
            j_new = i_new - kk
            tref = btq[0:1]                                   # (1, BLK)
            pruned = (d > dback) & has & \
                (i_new + j_new - 3 * d < tref - belowscore)
            i_new = jnp.where(pruned, NEGINF, i_new)
            has = i_new >= 0

            # update-condition (ref xdrop.c: edge diagonals always
            # update; interior needs prevrow < i <= min(ulen, vlen+k))
            minuv = jnp.minimum(ulen, vlen + kk)
            cond_edge = (kk <= -d) | (kk >= d)
            cond_mid = (row < i_new) & (i_new <= minuv)
            takes = has & (cond_edge | cond_mid)
            keeps = has & ~takes

            j_tmp = i_new - kk
            can_ext = takes & (i_new < ulen) & (j_tmp < vlen)
            i_ext = run_extend(jnp.where(can_ext, i_new, NEGINF),
                               can_ext)
            i_ext = jnp.where(can_ext, i_ext, i_new)

            new_row = jnp.where(takes, i_ext,
                                jnp.where(keeps, row, NEGINF))
            new_row = jnp.where(active, new_row, row)

            # best update (first slot at the max, strictly-greater rule)
            j_ext = i_ext - kk
            sc = jnp.where(takes & active, i_ext + j_ext - 3 * d, NEGINF)
            scbest = jnp.max(sc, axis=0, keepdims=True)
            ismax = sc == scbest
            better = scbest > best_s
            best_i = jnp.where(better, pick_first(ismax, i_ext), best_i)
            best_j = jnp.where(better, pick_first(ismax, j_ext), best_j)
            best_s = jnp.where(better, scbest, best_s)
            btq = jnp.concatenate([btq[1:], best_s], axis=0)

            # alignment complete on the end diagonal?
            end_k = ulen - vlen
            eidx = jnp.clip(end_k + D, 0, K - 1)
            row_at_end = jnp.sum(jnp.where(sidx == eidx, new_row, 0),
                                 axis=0, keepdims=True)
            done_align = (jnp.abs(end_k) <= jnp.minimum(d, D)) & \
                (row_at_end == ulen)

            # bounds pruning
            has_row = new_row > NEGINF
            first_k = jnp.min(jnp.where(has_row, sidx, K), axis=0,
                              keepdims=True)
            last_k = jnp.max(jnp.where(has_row, sidx, -1), axis=0,
                             keepdims=True)
            any_row = last_k >= 0
            new_lb = jnp.where(any_row, first_k - D, 1)
            new_ub = jnp.where(any_row, last_k - D, -1)
            hit_v = has_row & (new_row == vlen + kk) & (kk <= 0) & \
                (kk >= new_lb)
            kv = jnp.max(jnp.where(hit_v, sidx, -1), axis=0,
                         keepdims=True)
            new_lb = jnp.where(kv >= 0, jnp.maximum(new_lb, kv - D),
                               new_lb)
            hit_u = has_row & (new_row == ulen) & (kk >= 0) & \
                (kk <= new_ub)
            ku = jnp.min(jnp.where(hit_u, sidx, K), axis=0,
                         keepdims=True)
            new_ub = jnp.where(ku < K, jnp.minimum(new_ub, ku - D),
                               new_ub)

            # a live cell on the slot edge: the true front may extend
            # beyond the band — result unverifiable, host re-runs it
            edge = (has_row & ((sidx == 0) | (sidx == K - 1))) \
                .any(axis=0).reshape(1, BLK)
            unsafe = unsafe | (active & edge).astype(jnp.int32)

            stop = done_align | ~any_row | edge
            new_lb = jnp.where(active & ~stop, new_lb, 1)
            new_ub = jnp.where(active & ~stop, new_ub, -1)
            new_lb = jnp.where(active, new_lb, lb)
            new_ub = jnp.where(active, new_ub, ub)
            return new_row, new_lb, new_ub, best_i, best_j, best_s, \
                btq, unsafe

        def loop_cond(carry):
            t, _, lb, ub = carry[0], carry[1], carry[2], carry[3]
            nactive = jnp.sum((lb <= ub).astype(jnp.int32))
            return (t < GENS) & (nactive > 0)

        def loop_body(carry):
            t, row, lb, ub, best_i, best_j, best_s, btq, unsafe = carry
            for u in range(UNROLL):
                row, lb, ub, best_i, best_j, best_s, btq, unsafe = gen(
                    t + 1 + u, row, lb, ub, best_i, best_j, best_s,
                    btq, unsafe)
            return (t + UNROLL, row, lb, ub, best_i, best_j, best_s,
                    btq, unsafe)

        carry = (jnp.zeros((), jnp.int32), row, lb, ub, best_i, best_j,
                 best_s, btq, unsafe)
        carry = jax.lax.while_loop(loop_cond, loop_body, carry)
        _, row, lb, ub, best_i, best_j, best_s, btq, unsafe = carry
        # lanes still active at the GENS cap are unverified too
        unsafe = unsafe | (lb <= ub).astype(jnp.int32)
        bi_o[:] = best_i
        bj_o[:] = best_j
        bs_o[:] = best_s
        unsafe_o[:] = unsafe

    return kernel


def _lane_block_spec(a, BLK):
    nd = a.ndim
    return pl.BlockSpec(a.shape[:-1] + (BLK,),
                        partial(lambda n, i: (0,) * (n - 1) + (i,), nd))


@partial(jax.jit, static_argnames=("W", "D", "GENS", "belowscore",
                                   "interpret"))
def _xdrop_pallas(PK, *, W: int, D: int, GENS: int, belowscore: int,
                  interpret: bool):
    """PK: (N, 6*W32+2) uint32 — six pack_codes planes + ulen/vlen."""
    N = PK.shape[0]
    W32 = W // 32
    K = 2 * D + 1
    BLK = _block_lanes(K, N)
    assert N % BLK == 0
    parts = [PK[:, i * W32:(i + 1) * W32] for i in range(6)]
    # greedy's bitmask slot s holds diagonal j = i + (s - D); xdrop's
    # k convention is j = i - k, so flip the slot axis: after the flip
    # slot s holds j = i - (s - D) = run positions for xdrop diag s-D
    M = jnp.transpose(
        _match_from_planes(_planes_from_bits(*parts[:3]),
                           _planes_from_bits(*parts[3:]), W, D),
        (2, 1, 0))[:, ::-1, :]                                # (W32,K,N)
    rowv = lambda i: PK[:, 6 * W32 + i].astype(jnp.int32).reshape(1, N)
    ins = [M, rowv(0), rowv(1)]
    in_specs = [_lane_block_spec(a, BLK) for a in ins]
    outs = [jax.ShapeDtypeStruct((1, N), jnp.int32)] * 4
    out_specs = [_lane_block_spec(o, BLK) for o in outs]
    kern = _make_kernel(W, D, GENS, belowscore)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024)
    out = pl.pallas_call(
        kern,
        grid=(N // BLK,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=outs,
        interpret=interpret,
        **kwargs,
    )(*ins)
    return jnp.concatenate(out, axis=0)                       # (4, N)


def xdrop_full_pallas(PK, belowscore: int, W: int, D: int = 64,
                      GENS: int = 512, interpret: bool | None = None,
                      sync: bool = True):
    """Single-shot whole-task xdrop for tasks with ulen, vlen <= W.

    PK: (N, 6*W32+2) uint32 — pack_codes planes for the padded U and V
    windows plus ulen/vlen columns (one array = one host->device
    transfer).  Returns (4, N) int32: best ivalue/jvalue/score, unsafe.
    `unsafe` lanes (band-edge contact or GENS exhaustion) must be
    re-run on the exact host engine."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out = _xdrop_pallas(PK, W=W, D=D, GENS=GENS,
                        belowscore=int(belowscore),
                        interpret=bool(interpret))
    return np.asarray(out) if sync else out


def pack_xdrop_tasks(us, vs, W: int):
    """Host packing: (N, 6*W32+2) uint32 for xdrop_full_pallas.
    Windows are padded with 255 (special — never matches); the window
    fill runs through the C++ memcpy kernel when available."""
    from ..core.native import fill_windows_native
    N = len(us)
    ulen = np.fromiter((len(u) for u in us), np.uint32, N)
    vlen = np.fromiter((len(v) for v in vs), np.uint32, N)
    sel = np.arange(N, dtype=np.int64)

    def windows(seqs, lens):
        flat = np.concatenate(seqs) if seqs else np.zeros(1, np.uint8)
        lens64 = lens.astype(np.int64)
        off = np.cumsum(lens64) - lens64
        out = np.empty((N, W), np.uint8)
        if fill_windows_native(np.ascontiguousarray(flat, np.uint8),
                               off, lens64, sel, W, 255, out):
            return out
        out[:] = 255
        for i, s in enumerate(seqs):
            out[i, :len(s)] = s
        return out

    U = windows(us, ulen)
    V = windows(vs, vlen)
    pu = pack_codes(U)
    pv = pack_codes(V)
    return np.concatenate(
        [*pu, *pv, ulen[:, None], vlen[:, None]],
        axis=1).astype(np.uint32)
