"""Pallas TPU kernels for the batched greedy (front-prune) extension.

Semantics-identical device engines for ops.greedy_batch (the front
recurrence mirroring ref: src/match/ft-front-prune.c:633
front_prune_edist_inplace + ft-polish.c), VMEM-resident: each program
keeps its block's whole front state plus the match bitmask in VMEM
across all generations, so HBM sees each lane's state at most twice
(load, store) per call.

Two entry points:

  * greedy_full_pallas — the single-shot fast path: tasks whose u and v
    both fit one W-window build generation 0 *inside* the kernel (seed
    history + initial match run) and run to completion, so the host
    uploads only U/V and downloads four result rows per lane.  Lanes
    that touch the diagonal-slot edge (or exhaust GENS) come back
    `undone` and rejoin the chunked path.
  * greedy_chunk_pallas — signature-compatible twin of
    greedy_batch.greedy_chunk_impl for the windowed/rebased long-task
    path.

Layout: state travels as (K, BLK) — the diagonal-slot axis on sublanes,
the 128-lane axis minor — so a K=33 front costs ceil(33/8) vector
registers per op, slot-axis shifts/reductions are cheap sublane ops,
and narrow fronts run with BLK up to 512 lanes per program.  Per-lane
scalars travel as (1, BLK) rows.

Kernel-safe rewrites vs the XLA twin (verified bit-exact by
tests/test_greedy_pallas.py):

  * bool state travels as int32 masks (converted at the kernel edges);
    while_loop carries must be int32 — Mosaic cannot legalize
    vector<i1> scf.yield operands;
  * `argmax`/`take_along_axis` along the slot axis become one-hot /
    min-max reductions (no gathers on the VPU);
  * the slot-axis shifts use jnp.roll + edge masks instead of pad+slice;
  * the match bitmask arrives as (W32, K, BLK) so the word index is a
    cheap major-dim slice in the run-extension loop;
  * the two 15-bit polishing walks run stacked as one (2, K, BLK) walk
    (the walk is a serial dependency chain; halving its op count
    matters more than per-op width);
  * the generation loop is a while_loop that exits as soon as every
    lane in the block is done or paused, unrolled 4 generations per
    iteration to amortize the scalar exit reduction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .greedy_batch import (_U32, _ctz32, _match_bitmask,
                           _match_from_planes, _ones64, _planes_from_bits,
                           _polish_walk, _popcount64, _shl64)

# Python-int twin of greedy_batch.NEGINF: a module-level jnp scalar would
# be a captured constant inside the Pallas kernel, which pallas_call
# rejects; a weak-typed int folds into each op instead.
NEGINF = -(2 ** 30)

UNROLL = 4


def _block_lanes(K: int, N: int) -> int:
    """Lanes per program: the kernel body is op-issue-bound (measured
    ~0.14us per vector op almost independent of operand width up to
    ~30 vregs), so pack as many lanes per op as the scoped-VMEM stack
    allows — roughly K*BLK <= 33k elements per state array."""
    if K <= 40:
        blk = 1024
    elif K <= 80:
        blk = 512
    elif K <= 160:
        blk = 256
    else:
        blk = 128       # K=257 straggler pass (mm is W32*K*BLK words;
    return min(blk, N)  # the lane dim must stay a multiple of 128)


def _make_kernel(W: int, D: int, GENS: int, cut_depth: int, mmp128: int,
                 mad: int, match_score: int, difference_score: int,
                 hist_cap: int, single_shot: bool):
    K = 2 * D + 1
    W32 = W // 32
    pol_size = 2 * cut_depth
    hmask = (1 << hist_cap) - 1 if hist_cap < 64 else (1 << 64) - 1
    hmask_lo, hmask_hi = hmask & 0xFFFFFFFF, hmask >> 32

    def body(M, row, hlo, hhi, hsize, mm, valid, d_lane, done, died,
             best_al, best_row, best_d, best_mm, urem, vrem, kbase,
             rowbase):
        BLK = row.shape[1]
        karr = (jax.lax.broadcasted_iota(jnp.int32, (K, BLK), 0) - D)
        sidx = jax.lax.broadcasted_iota(jnp.int32, (K, BLK), 0)

        ulen_c = jnp.minimum(urem, W)      # (1, BLK)
        vlen_c = jnp.minimum(vrem, W)
        u_more = urem > W
        v_more = vrem > W
        albase = 2 * rowbase + kbase
        mlo = jnp.uint32(hmask_lo)
        mhi = jnp.uint32(hmask_hi)

        def fetch_word(w):
            """M[w[s, n], s, n], clamp+mask; unrolled one-hot over W32."""
            acc = jnp.zeros((K, BLK), _U32)
            for wi in range(W32):
                acc = jnp.where(w == wi, M[wi], acc)
            return jnp.where((w >= 0) & (w < W32), acc, _U32(0))

        def add_matches(row, hlo, hhi, hsize, valid):
            # while_loop carries travel as int32 — Mosaic cannot
            # legalize vector<i1> block arguments in scf.while yields.
            def cond(st):
                return jnp.sum(st[0]) > 0

            def wbody(st):
                cont_i, row, hlo, hhi, hsize = st
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
                olo, ohi = _ones64(c)
                slo, shi = _shl64(hlo, hhi, c)
                hlo = jnp.where(cont, slo | olo, hlo)
                hhi = jnp.where(cont, shi | ohi, hhi)
                hsize = jnp.where(cont,
                                  jnp.minimum(hsize + c, hist_cap), hsize)
                row = row + c
                return ((cont & (c == 32)).astype(jnp.int32), row, hlo,
                        hhi, hsize)

            cont0 = valid & (row >= 0) & (row < W)
            _, row, hlo, hhi, hsize = jax.lax.while_loop(
                cond, wbody, (cont0.astype(jnp.int32), row, hlo, hhi,
                              hsize))
            return row, hlo, hhi, hsize

        def trim_and_score(row, hlo, hhi, hsize, mm, valid, d, best_al,
                           best_row, best_d, best_mm, done):
            rsafe = jnp.maximum(row, 0)
            alignedlen = jnp.where(valid, 2 * rsafe + karr + albase,
                                   NEGINF)
            maxal = jnp.max(alignedlen, axis=0, keepdims=True)
            minlen = jnp.maximum(maxal - mad, 0)
            need = (hsize * mmp128) >> 7
            keep = valid & (row <= ulen_c) & (row + karr <= vlen_c) & \
                (alignedlen >= minlen) & \
                (_popcount64(hlo & mlo, hhi & mhi) >= need)
            anyk = keep.any(axis=0, keepdims=True)
            first = jnp.min(jnp.where(keep, sidx, K), axis=0,
                            keepdims=True)
            last = jnp.max(jnp.where(keep, sidx, -1), axis=0,
                           keepdims=True)
            inwin = (sidx >= first) & (sidx <= last)
            valid = valid & inwin & anyk
            died_now = ~anyk & ~done

            fill = jnp.maximum(pol_size - hsize, 0)
            flo, fhi = _ones64(fill)
            slo, _ = _shl64(flo, fhi, jnp.minimum(hsize, 64))
            filled_lo = hlo | slo
            p_lo = (filled_lo & _U32(0x7FFF)).astype(jnp.int32)
            p_hi = ((filled_lo >> _U32(cut_depth)) & _U32(0x7FFF)) \
                .astype(jnp.int32)
            # one stacked walk for both 15-bit halves (serial chain)
            dfm, ss = _polish_walk(jnp.stack([p_lo, p_hi]), match_score,
                                   difference_score, cut_depth)
            polished = (dfm[0] >= 0) & (ss[0] + dfm[1] >= 0)
            cand = jnp.where(valid & polished & ~done, alignedlen, NEGINF)
            cbest = jnp.max(cand, axis=0, keepdims=True)
            ismax = cand == cbest
            # first occurrence along the slot axis (argmax tie rule)
            fidx = jnp.min(jnp.where(ismax, sidx, K), axis=0,
                           keepdims=True)
            pickmask = sidx == fidx

            def pick(a):
                return jnp.sum(jnp.where(pickmask, a, 0), axis=0,
                               keepdims=True)

            better = cbest > best_al
            best_al = jnp.where(better, cbest, best_al)
            best_row = jnp.where(better, pick(rsafe) + rowbase, best_row)
            best_d = jnp.where(better, d, best_d)
            best_mm = jnp.where(better, pick(mm), best_mm)

            e_rel = vrem - urem                       # (1, BLK)
            eidx = jnp.clip(e_rel + D, 0, K - 1)
            oh = sidx == eidx

            def take1(a, zero):
                return jnp.sum(jnp.where(oh, a, zero), axis=0,
                               keepdims=True)

            ok_k = (jnp.abs(e_rel + kbase) <= d) & (jnp.abs(e_rel) <= D) \
                & (take1(valid.astype(jnp.int32), 0) > 0) & \
                (take1(row, 0) == jnp.where(
                    (e_rel >= -D) & (e_rel <= D), urem, NEGINF))
            complete_now = ok_k & ~done
            return (valid, best_al, best_row, best_d, best_mm, died_now,
                    complete_now)

        if single_shot:
            # in-kernel generation 0: the seed's all-match history at
            # the centre slot, then the initial match run — identical
            # to greedy_extend_batch's host gen-0 (its window skip by
            # the run length is a no-op here because the whole task is
            # inside this window)
            row, hlo, hhi, hsize = add_matches(row, hlo, hhi, hsize,
                                               valid)

        (valid, best_al, best_row, best_d, best_mm, died_now,
         complete_now) = trim_and_score(
            row, hlo, hhi, hsize, mm, valid, d_lane, best_al, best_row,
            best_d, best_mm, done)
        died = died | died_now
        done = done | died_now | complete_now
        paused = jnp.zeros_like(done)

        def sh(a, fillval, off):
            """Shift along the slot axis: off=+1 reads slot s-1."""
            if a.dtype == jnp.bool_:
                # Mosaic can't roll/select i1 vectors — shift as i32
                return sh(a.astype(jnp.int32), int(fillval), off) != 0
            r = jnp.roll(a, off, axis=0)
            if off == 1:
                return jnp.where(sidx == 0, fillval, r)
            return jnp.where(sidx == K - 1, fillval, r)

        def gen_cond(carry):
            t = carry[0]
            done_i, paused_i = carry[8], carry[10]
            nactive = jnp.sum(((done_i | paused_i) == 0)
                              .astype(jnp.int32))
            return (t < GENS) & (nactive > 0)

        def gen(carry):
            (t, row, hlo, hhi, hsize, mm, valid_i, best4, done_i, died_i,
             paused_i, d_lane) = carry
            valid = valid_i != 0
            done = done_i != 0
            died = died_i != 0
            paused = paused_i != 0
            best_al, best_row, best_d, best_mm = best4
            act = ~done & ~paused

            v_ins = sh(valid, False, 1)
            v_del = sh(valid, False, -1)
            r_ins = jnp.where(v_ins, sh(row, 0, 1), NEGINF)
            r_mis = jnp.where(valid, row + 1, NEGINF)
            r_del = jnp.where(v_del, sh(row, 0, -1) + 1, NEGINF)
            r_new = jnp.maximum(jnp.maximum(r_ins, r_mis), r_del)
            anyc = r_new > NEGINF
            use_ins = v_ins & (r_ins == r_new)
            use_mis = valid & (r_mis == r_new) & ~use_ins
            use_del = v_del & (r_del == r_new) & ~use_ins & ~use_mis

            def pick3(a_ins, a_mis, a_del, zero):
                return jnp.where(use_ins, a_ins,
                                 jnp.where(use_mis, a_mis,
                                           jnp.where(use_del, a_del,
                                                     zero)))

            hlo_n = pick3(sh(hlo, _U32(0), 1), hlo, sh(hlo, _U32(0), -1),
                          _U32(0))
            hhi_n = pick3(sh(hhi, _U32(0), 1), hhi,
                          sh(hhi, _U32(0), -1), _U32(0))
            hs_n = pick3(sh(hsize, 0, 1), hsize, sh(hsize, 0, -1), 0)
            mm_ins = jnp.where(v_ins & (r_ins == r_new), sh(mm, 0, 1),
                               NEGINF)
            mm_mis = jnp.where(valid & (r_mis == r_new), mm + 1, NEGINF)
            mm_del = jnp.where(v_del & (r_del == r_new), sh(mm, 0, -1),
                               NEGINF)
            # deletion mm only when it wins outright (ref tie rule)
            mm_im = jnp.maximum(mm_ins, mm_mis)
            mm_n = jnp.where(mm_im > NEGINF, mm_im, mm_del)

            hs_n = jnp.minimum(hs_n + 1, hist_cap)
            hlo_n, hhi_n = _shl64(hlo_n, hhi_n, jnp.ones((), jnp.int32))
            row_n = jnp.where(anyc, r_new, NEGINF)
            row_n, hlo_n, hhi_n, hs_n = add_matches(
                row_n, hlo_n, hhi_n, hs_n, anyc)

            contact = (anyc & (
                (u_more & (row_n >= W))
                | (v_more & (row_n + karr >= W))
                | (sidx <= 0) | (sidx >= K - 1))).any(axis=0,
                                                      keepdims=True)
            pause_now = act & contact
            commit = act & ~contact

            d_next = jnp.where(commit, d_lane + 1, d_lane)
            (valid_n, bal_n, brow_n, bd_n, bmm_n, died_now,
             complete_now) = trim_and_score(
                row_n, hlo_n, hhi_n, hs_n, mm_n, anyc, d_next, best_al,
                best_row, best_d, best_mm, done | pause_now | ~act)

            row = jnp.where(commit, row_n, row)
            hlo = jnp.where(commit, hlo_n, hlo)
            hhi = jnp.where(commit, hhi_n, hhi)
            hsize = jnp.where(commit, hs_n, hsize)
            mm = jnp.where(commit, mm_n, mm)
            # select i32 masks, not i1 vectors (Mosaic trunci limitation)
            valid = jnp.where(commit, valid_n.astype(jnp.int32),
                              valid.astype(jnp.int32)) != 0
            best_al = jnp.where(commit, bal_n, best_al)
            best_row = jnp.where(commit, brow_n, best_row)
            best_d = jnp.where(commit, bd_n, best_d)
            best_mm = jnp.where(commit, bmm_n, best_mm)
            died = died | (commit & died_now)
            done = done | (commit & (died_now | complete_now))
            paused = paused | pause_now
            return (t + 1, row, hlo, hhi, hsize, mm,
                    valid.astype(jnp.int32),
                    (best_al, best_row, best_d, best_mm),
                    done.astype(jnp.int32), died.astype(jnp.int32),
                    paused.astype(jnp.int32), d_next)

        def gen_unrolled(carry):
            for _ in range(UNROLL):
                carry = gen(carry)
            return carry

        carry = (jnp.zeros((), jnp.int32), row, hlo, hhi, hsize, mm,
                 valid.astype(jnp.int32),
                 (best_al, best_row, best_d, best_mm),
                 done.astype(jnp.int32), died.astype(jnp.int32),
                 paused.astype(jnp.int32), d_lane)
        carry = jax.lax.while_loop(gen_cond, gen_unrolled, carry)
        (_, row, hlo, hhi, hsize, mm, valid_i,
         (best_al, best_row, best_d, best_mm), done_i, died_i, paused_i,
         d_lane) = carry
        return (row, hlo, hhi, hsize, mm, valid_i, best_al, best_row,
                best_d, best_mm, done_i, died_i, paused_i, d_lane)

    if single_shot:
        def kernel(M_ref, seed_ref, urem_ref, vrem_ref,
                   bal_o, brow_o, bd_o, bmm_o, done_o, died_o, undone_o):
            M = M_ref[:]
            seedl = seed_ref[:]              # (1, BLK)
            urem = urem_ref[:]
            vrem = vrem_ref[:]
            BLK = seedl.shape[1]
            sidx0 = jax.lax.broadcasted_iota(jnp.int32, (K, BLK), 0)
            center = sidx0 == D
            z = jnp.zeros((K, BLK), jnp.int32)
            slo, shi = _ones64(jnp.broadcast_to(seedl, (K, BLK)))
            row0 = jnp.where(center, 0, NEGINF)
            hlo0 = jnp.where(center, slo, _U32(0))
            hhi0 = jnp.where(center, shi, _U32(0))
            hs0 = jnp.where(center, jnp.minimum(seedl, hist_cap), 0)
            zrow = jnp.zeros((1, BLK), jnp.int32)
            false_row = zrow != 0
            out = body(M, row0, hlo0, hhi0, hs0, z, center, zrow,
                       false_row, false_row, zrow, zrow, zrow,
                       zrow, urem, vrem, zrow, zrow)
            (_, _, _, _, _, _, best_al, best_row, best_d, best_mm,
             done_i, died_i, paused_i, _) = out
            bal_o[:] = best_al
            brow_o[:] = best_row
            bd_o[:] = best_d
            bmm_o[:] = best_mm
            done_o[:] = done_i
            died_o[:] = died_i & done_i
            undone_o[:] = 1 - done_i
        return kernel

    def kernel(M_ref, row_ref, hlo_ref, hhi_ref, hs_ref, mm_ref, val_ref,
               d_ref, done_ref, died_ref, bal_ref, brow_ref, bd_ref,
               bmm_ref, urem_ref, vrem_ref, kbase_ref, rowbase_ref,
               row_o, hlo_o, hhi_o, hs_o, mm_o, val_o, bal_o, brow_o,
               bd_o, bmm_o, done_o, died_o, paused_o, d_o):
        out = body(M_ref[:], row_ref[:], hlo_ref[:], hhi_ref[:],
                   hs_ref[:], mm_ref[:], val_ref[:] != 0, d_ref[:],
                   done_ref[:] != 0, died_ref[:] != 0, bal_ref[:],
                   brow_ref[:], bd_ref[:], bmm_ref[:], urem_ref[:],
                   vrem_ref[:], kbase_ref[:], rowbase_ref[:])
        (row, hlo, hhi, hsize, mm, valid_i, best_al, best_row, best_d,
         best_mm, done_i, died_i, paused_i, d_lane) = out
        row_o[:] = row
        hlo_o[:] = hlo
        hhi_o[:] = hhi
        hs_o[:] = hsize
        mm_o[:] = mm
        val_o[:] = valid_i
        bal_o[:] = best_al
        brow_o[:] = best_row
        bd_o[:] = best_d
        bmm_o[:] = best_mm
        done_o[:] = done_i
        died_o[:] = died_i
        paused_o[:] = paused_i
        d_o[:] = d_lane

    return kernel


def _lane_block_spec(a, BLK):
    nd = a.ndim
    return pl.BlockSpec(a.shape[:-1] + (BLK,),
                        partial(lambda n, i: (0,) * (n - 1) + (i,), nd))


@partial(jax.jit, static_argnames=(
    "W", "D", "GENS", "cut_depth", "mmp128", "mad", "match_score",
    "difference_score", "hist_cap", "interpret"))
def _chunk_pallas(M, row, hlo, hhi, hsize, mm, valid, d_lane, done, died,
                  best, urem, vrem, kbase, rowbase, *, W: int, D: int,
                  GENS: int, cut_depth: int, mmp128: int, mad: int,
                  match_score: int, difference_score: int, hist_cap: int,
                  interpret: bool):
    N, K = row.shape
    BLK = _block_lanes(K, N)
    assert N % BLK == 0
    rowv = lambda a: a.astype(jnp.int32).reshape(1, N)
    fronts = [jnp.transpose(a) for a in (row, hlo, hhi, hsize, mm)]
    ins = [M] + fronts + [valid.astype(jnp.int32).T,
                          rowv(d_lane), rowv(done), rowv(died),
                          rowv(best[:, 0]), rowv(best[:, 1]),
                          rowv(best[:, 2]), rowv(best[:, 3]), rowv(urem),
                          rowv(vrem), rowv(kbase), rowv(rowbase)]
    in_specs = [_lane_block_spec(a, BLK) for a in ins]
    outs = [jax.ShapeDtypeStruct((K, N), jnp.int32),    # row
            jax.ShapeDtypeStruct((K, N), jnp.uint32),   # hlo
            jax.ShapeDtypeStruct((K, N), jnp.uint32),   # hhi
            jax.ShapeDtypeStruct((K, N), jnp.int32),    # hsize
            jax.ShapeDtypeStruct((K, N), jnp.int32),    # mm
            jax.ShapeDtypeStruct((K, N), jnp.int32),    # valid
            jax.ShapeDtypeStruct((1, N), jnp.int32),    # best_al
            jax.ShapeDtypeStruct((1, N), jnp.int32),    # best_row
            jax.ShapeDtypeStruct((1, N), jnp.int32),    # best_d
            jax.ShapeDtypeStruct((1, N), jnp.int32),    # best_mm
            jax.ShapeDtypeStruct((1, N), jnp.int32),    # done
            jax.ShapeDtypeStruct((1, N), jnp.int32),    # died
            jax.ShapeDtypeStruct((1, N), jnp.int32),    # paused
            jax.ShapeDtypeStruct((1, N), jnp.int32)]    # d_lane
    out_specs = [_lane_block_spec(o, BLK) for o in outs]
    kern = _make_kernel(W, D, GENS, cut_depth, mmp128, mad, match_score,
                        difference_score, hist_cap, single_shot=False)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024)
    return pl.pallas_call(
        kern,
        grid=(N // BLK,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=outs,
        interpret=interpret,
        **kwargs,
    )(*ins)


def greedy_chunk_pallas(U, V, row, hlo, hhi, hsize, mm, valid, d_lane,
                        done, died, best, urem, vrem, kbase, rowbase,
                        minmatchpercentage128, maxalignedlendifference,
                        match_score, difference_score, hist_cap,
                        W: int, D: int, GENS: int, cut_depth: int = 15,
                        interpret: bool | None = None):
    """Signature-compatible twin of greedy_batch.greedy_chunk_impl.

    Builds the match bitmask with XLA (one-shot, bandwidth-friendly) and
    runs the VMEM-resident Pallas kernel for the generation loop.
    Returns the same 11-tuple; `best` is re-packed as (N, 4)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M = jnp.transpose(_match_bitmask(U, V, W, D), (2, 1, 0))  # (W32,K,N)
    out = _chunk_pallas(
        M, row, hlo, hhi, hsize, mm, valid, d_lane, done, died, best,
        urem, vrem, kbase, rowbase, W=W, D=D, GENS=GENS,
        cut_depth=cut_depth, mmp128=int(minmatchpercentage128),
        mad=int(maxalignedlendifference), match_score=int(match_score),
        difference_score=int(difference_score), hist_cap=int(hist_cap),
        interpret=bool(interpret))
    (row_o, hlo_o, hhi_o, hs_o, mm_o, val_o, bal, brow, bd, bmm, done_o,
     died_o, paused_o, d_o) = out
    fronts = [jnp.transpose(a) for a in
              (row_o, hlo_o, hhi_o, hs_o, mm_o)]
    best_o = jnp.concatenate([bal.T, brow.T, bd.T, bmm.T], axis=1)
    squeeze = lambda a: a.reshape(-1)
    return (*fronts, jnp.transpose(val_o).astype(jnp.bool_),
            best_o, squeeze(done_o).astype(jnp.bool_),
            squeeze(died_o).astype(jnp.bool_),
            squeeze(paused_o).astype(jnp.bool_), squeeze(d_o))


@partial(jax.jit, static_argnames=(
    "W", "D", "GENS", "cut_depth", "mmp128", "mad", "match_score",
    "difference_score", "hist_cap", "interpret"))
def _full_pallas(PK, *, W: int, D: int, GENS: int,
                 cut_depth: int, mmp128: int, mad: int, match_score: int,
                 difference_score: int, hist_cap: int, interpret: bool):
    """PK: one (N, 6*W32+3) uint32 array — the six pack_codes planes
    plus seedlen/ulen/vlen columns.  A single input array and a single
    stacked (7, N) result keep host<->device round trips to one each
    way (the dominant fixed cost on a tunneled TPU)."""
    N = PK.shape[0]
    W32 = W // 32
    K = 2 * D + 1
    BLK = _block_lanes(K, N)
    assert N % BLK == 0
    parts = [PK[:, i * W32:(i + 1) * W32] for i in range(6)]
    M = jnp.transpose(
        _match_from_planes(_planes_from_bits(*parts[:3]),
                           _planes_from_bits(*parts[3:]), W, D),
        (2, 1, 0))
    rowv = lambda i: PK[:, 6 * W32 + i].astype(jnp.int32).reshape(1, N)
    ins = [M, rowv(0), rowv(1), rowv(2)]
    in_specs = [_lane_block_spec(a, BLK) for a in ins]
    outs = [jax.ShapeDtypeStruct((1, N), jnp.int32)] * 7
    out_specs = [_lane_block_spec(o, BLK) for o in outs]
    kern = _make_kernel(W, D, GENS, cut_depth, mmp128, mad, match_score,
                        difference_score, hist_cap, single_shot=True)
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
    return jnp.concatenate(out, axis=0)                       # (7, N)


def greedy_full_pallas(PK, minmatchpercentage128,
                       maxalignedlendifference,
                       match_score, difference_score, hist_cap,
                       W: int, D: int, GENS: int, cut_depth: int = 15,
                       interpret: bool | None = None, sync: bool = True):
    """Single-shot whole-task extension for tasks with ulen, vlen <= W.

    PK: (N, 6*W32+3) uint32 — pack_codes planes for U and V plus
    seedlen/ulen/vlen columns (see greedy_batch's fast path; one array
    keeps the host->device upload to a single transfer).

    Returns (7, N) int32: best alignedlen/row/distance/mismatches,
    done, died, undone — `undone` lanes touched the diagonal-slot edge
    or exhausted GENS and must be re-run through the chunked path
    (results for them are unset).  With sync=False the device array is
    returned without materializing — callers dispatch many waves and
    fetch later, overlapping host packing, transfers and kernels."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out = _full_pallas(
        PK, W=W, D=D, GENS=GENS,
        cut_depth=cut_depth, mmp128=int(minmatchpercentage128),
        mad=int(maxalignedlendifference), match_score=int(match_score),
        difference_score=int(difference_score), hist_cap=int(hist_cap),
        interpret=bool(interpret))
    return np.asarray(out) if sync else out
