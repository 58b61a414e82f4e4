"""Batched greedy (front-prune) extension on device (JAX/XLA for TPU).

The device counterpart of ops/greedy.py: thousands of seed extensions run
as lanes of one fixed-shape front recurrence — the semantics equivalent
of the reference front-prune engine (ref: src/match/ft-front-prune.c:633
front_prune_edist_inplace + ft-polish.c), matching the scalar mirror
`ops.greedy.greedy_extend` bit for bit (lockstep-verified by
tests/test_greedy_batch.py).

Architecture (SURVEY §7 "batched extension with per-seed lanes"):

  * lanes: each seed extension is one lane; per-lane front state is a
    row of fixed-shape (N, K) arrays — rows, 64-bit match history as a
    pair of uint32 words, history size, max-mismatch counters
  * diagonal slots: slot s holds diagonal k = s - D + kbase(lane); the
    front window is recentred between chunks so K = 2D+1 slots always
    cover the live (trimmed) window plus one chunk of drift
  * match bitmasks instead of a run table: M[n, s, w] packs 32 match
    bits (U[i]==V[i+k], specials never match) per uint32 word, built
    once per chunk in O(N*K*W) bool ops.  The greedy run extension
    fetches 32 bits at the current row and counts trailing matches with
    popcount — O(N*K) per step, no O(W) one-hot per generation
  * chunked continuation: windows of W symbols slide along u and v.  A
    generation whose front touches the window edge (or the diagonal
    slot edge) is rolled back and the lane pauses; the host advances
    the window origins (du, dv), rebases rows/diagonals, and resumes
    the lane in the next chunk — so arbitrarily long extensions stay on
    device and remain bit-exact
  * polishing: the reference's 2x15-bit history test is evaluated by
    the same MSB-first score walk that fills its table
    (ref: ft-polish.c fill_polishing_info), unrolled on the VPU

Absolute vs relative bookkeeping: rows are relative to du, diagonals to
kbase; alignedlen = 2*row_rel + k_rel + albase with albase = 2*du+kbase,
so trims compare correctly in relative terms and the best polished point
is stored absolutely.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEGINF = jnp.int32(-(2 ** 30))
_U32 = jnp.uint32


# ---------------------------------------------------------------------------
# 64-bit history as a pair of uint32 words
# ---------------------------------------------------------------------------

def _shl64(hlo, hhi, c):
    """(hhi:hlo) << c with c int32 in [0, inf); bits beyond 64 drop."""
    c = jnp.clip(c, 0, 64)
    a = jnp.clip(c, 0, 31).astype(_U32)            # for the c<32 case
    ra = jnp.clip(32 - c, 1, 31).astype(_U32)      # 32-c, valid c in [1,31]
    b = jnp.clip(c - 32, 0, 31).astype(_U32)       # for the c>=32 case
    lo_lt = hlo << a
    carry = jnp.where(c > 0, hlo >> ra, _U32(0))
    hi_lt = (hhi << a) | carry
    hi_ge = hlo << b
    ge32 = c >= 32
    lo = jnp.where(c >= 64, _U32(0), jnp.where(ge32, _U32(0), lo_lt))
    hi = jnp.where(c >= 64, _U32(0), jnp.where(ge32, hi_ge, hi_lt))
    return lo, hi


def _ones64(c):
    """Low-c ones as a uint32 pair; c int32 >= 0, saturates at 64."""
    c = jnp.clip(c, 0, 64)
    a = jnp.clip(c, 0, 31).astype(_U32)
    b = jnp.clip(c - 32, 0, 31).astype(_U32)
    lo = jnp.where(c >= 32, _U32(0xFFFFFFFF), (_U32(1) << a) - _U32(1))
    hi = jnp.where(c >= 64, _U32(0xFFFFFFFF),
                   jnp.where(c >= 32, (_U32(1) << b) - _U32(1), _U32(0)))
    return lo, hi


def _popcount64(hlo, hhi):
    return (jax.lax.population_count(hlo).astype(jnp.int32)
            + jax.lax.population_count(hhi).astype(jnp.int32))


def _ctz32(x):
    """Trailing zeros of uint32; 32 for x == 0."""
    iso = x & (~x + _U32(1))
    return jax.lax.population_count(iso - _U32(1)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# polishing (ref: ft-polish.c) — score walk instead of a 32k-entry table
# ---------------------------------------------------------------------------

def _polish_walk(prefix15, match_score, difference_score, cut_depth: int):
    """diff_from_max and score_sum of a cut_depth-bit prefix, walked
    MSB-first exactly like the reference's fill_polishing_info."""
    score = jnp.zeros_like(prefix15)
    maxscore = jnp.zeros_like(prefix15)
    for b in range(cut_depth - 1, -1, -1):
        maxscore = jnp.maximum(maxscore, score)
        bit = (prefix15 >> b) & 1
        score = score + jnp.where(bit == 1, match_score, -difference_score)
    return score - maxscore, score


# ---------------------------------------------------------------------------
# per-chunk device kernel
# ---------------------------------------------------------------------------

def _base_bitmasks(X, W: int):
    """(N, 4, W32) uint32: bit i of word w of plane b is X[32w+i] == b.
    Special codes (>= 4) set no bit in any plane."""
    N = X.shape[0]
    W32 = W // 32
    weights = (_U32(1) << jnp.arange(32, dtype=_U32))[None, None, None, :]
    planes = (X[:, None, :] ==
              jnp.arange(4, dtype=X.dtype)[None, :, None])   # (N, 4, W)
    return jnp.sum(planes.reshape(N, 4, W32, 32).astype(_U32) * weights,
                   axis=3, dtype=_U32)                        # (N, 4, W32)


def pack_codes(X: np.ndarray):
    """Host-side 2.5-bit packing of a (N, W) uint8 code window: the two
    code bit-planes plus the special mask as little-endian uint32 words
    — 2.5 bits/symbol instead of 8, sized for slow host->device links."""
    def pb(bits):
        return np.packbits(bits, axis=1, bitorder="little") \
            .view(np.uint32)
    return pb(X & 1 == 1), pb(X & 2 == 2), pb(X >= 4)


def _planes_from_bits(lo, hi, spec):
    """Device twin of _base_bitmasks from pack_codes output."""
    ok = ~spec
    return jnp.stack([~lo & ~hi & ok, lo & ~hi & ok,
                      ~lo & hi & ok, lo & hi & ok], axis=1)   # (N,4,W32)


def _match_bitmask(U, V, W: int, D: int):
    """M[n, s, w]: uint32 words of match bits; bit b of word w is
    (U[i] == V[i+k]) & (U[i] < 4) at i = 32*w + b, diag k = s - D."""
    return _match_from_planes(_base_bitmasks(U, W), _base_bitmasks(V, W),
                              W, D)


def _match_from_planes(Ub, Vb, W: int, D: int):
    """Bit-parallel match bitmask from per-base one-hot bitplanes:
    each diagonal's match word is OR_b(Ub & funnel_shift(Vb, k))
    — ~10 word ops per (k, w) instead of 32 symbol compares, with the
    K shifts vectorized in groups of equal word offset k>>5."""
    W32 = W // 32
    K = 2 * D + 1
    Ub = Ub[:, :, None, :]                                    # (N,4,1,W32)
    pad = D // 32 + 1
    Vbp = jnp.pad(Vb, ((0, 0), (0, 0), (pad, pad + 1)))
    ks = np.arange(K) - D
    qs = ks >> 5                                              # word offset
    rs = (ks - (qs << 5)).astype(np.uint32)                   # bit offset
    out = []
    for q in np.unique(qs):
        sel = qs == q
        r_g = jnp.asarray(rs[sel], _U32)[None, None, :, None]
        V0 = Vbp[:, :, None, pad + int(q):pad + int(q) + W32]
        V1 = Vbp[:, :, None, pad + int(q) + 1:pad + int(q) + 1 + W32]
        hi_sh = jnp.clip(_U32(32) - r_g, 1, 31)
        hi = jnp.where(r_g > 0, V1 << hi_sh, _U32(0))
        Vsh = (V0 >> r_g) | hi                                # (N,4,Kg,W32)
        m = Ub & Vsh
        out.append(m[:, 0] | m[:, 1] | m[:, 2] | m[:, 3])     # (N,Kg,W32)
    return jnp.concatenate(out, axis=1)                       # (N,K,W32)


# single-shot whole-task provider hook (tests monkeypatch this to the
# interpret-mode Pallas kernel; None = resolve from the backend)
greedy_full_impl = None


def _use_pallas() -> bool:
    """The VMEM-resident Pallas kernel is the chunk provider on TPU; the
    XLA twin stays the provider on CPU (Pallas interpret mode is far
    slower there).  GT_TPU_PALLAS_EXTEND=0 forces the XLA twin."""
    env = os.environ.get("GT_TPU_PALLAS_EXTEND")
    if env is not None:
        return env not in ("0", "off", "no")
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def greedy_chunk_impl(U, V, row, hlo, hhi, hsize, mm, valid, d_lane,
                      done, died, best, urem, vrem, kbase, rowbase,
                      minmatchpercentage128, maxalignedlendifference,
                      match_score, difference_score, hist_cap,
                      W: int, D: int, GENS: int, cut_depth: int = 15):
    """Chunk-provider dispatcher (tests monkeypatch this symbol)."""
    if _use_pallas():
        from .greedy_pallas import greedy_chunk_pallas
        return greedy_chunk_pallas(
            U, V, row, hlo, hhi, hsize, mm, valid, d_lane, done, died,
            best, urem, vrem, kbase, rowbase, minmatchpercentage128,
            maxalignedlendifference, match_score, difference_score,
            hist_cap, W, D, GENS, cut_depth)
    return greedy_chunk_xla(
        U, V, row, hlo, hhi, hsize, mm, valid, d_lane, done, died, best,
        urem, vrem, kbase, rowbase, minmatchpercentage128,
        maxalignedlendifference, match_score, difference_score, hist_cap,
        W, D, GENS, cut_depth)


@partial(jax.jit, static_argnames=("W", "D", "GENS", "cut_depth"))
def greedy_chunk_xla(U, V, row, hlo, hhi, hsize, mm, valid,
                     d_lane, done, died, best,
                     urem, vrem, kbase, rowbase,
                     minmatchpercentage128, maxalignedlendifference,
                     match_score, difference_score, hist_cap,
                     W: int, D: int, GENS: int, cut_depth: int = 15):
    """Run up to GENS generations of the greedy front recurrence.

    State is post-generation-d_lane (raw gen-0 state from the host is
    fine: the input state is trim/polish/completion-scored first, which
    is idempotent on already-scored states).  Returns the updated state
    plus a `paused` flag for lanes that hit a window or slot edge and
    rolled back their last generation.
    """
    N, K = row.shape
    W32 = W // 32
    pol_size = 2 * cut_depth
    karr = (jnp.arange(K, dtype=jnp.int32) - D)[None, :]
    sidx = jnp.arange(K, dtype=jnp.int32)[None, :]
    M = _match_bitmask(U, V, W, D)
    w_iota = jnp.arange(W32, dtype=jnp.int32)[None, None, :]

    hmask_lo, hmask_hi = _ones64(hist_cap)
    ulen_c = jnp.minimum(urem, W)
    vlen_c = jnp.minimum(vrem, W)
    u_more = urem > W
    v_more = vrem > W
    ul = ulen_c[:, None]
    vl = vlen_c[:, None]
    albase = (2 * rowbase + kbase)[:, None]

    def fetch_word(w):
        """M[n, s, w[n, s]] with clamp+mask; one-hot over W32 words."""
        onehot = w[:, :, None] == w_iota
        vals = jnp.sum(jnp.where(onehot, M, _U32(0)), axis=2)
        return jnp.where((w >= 0) & (w < W32), vals, _U32(0))

    def add_matches(row, hlo, hhi, hsize, valid):
        """Greedy run extension: 32 match bits per step via popcount."""
        def cond(st):
            return st[0].any()

        def body(st):
            cont, row, hlo, hhi, hsize = st
            wi = row >> 5
            off = (row & 31).astype(_U32)
            w0 = fetch_word(wi)
            w1 = fetch_word(wi + 1)
            hi_sh = jnp.clip(32 - off.astype(jnp.int32), 1, 31).astype(_U32)
            bits = (w0 >> off) | jnp.where(off > 0, w1 << hi_sh, _U32(0))
            c = jnp.where(cont, _ctz32(~bits), 0)
            olo, ohi = _ones64(c)
            slo, shi = _shl64(hlo, hhi, c)
            hlo = jnp.where(cont, slo | olo, hlo)
            hhi = jnp.where(cont, shi | ohi, hhi)
            hsize = jnp.where(cont, jnp.minimum(hsize + c, hist_cap), hsize)
            row = row + c
            return cont & (c == 32), row, hlo, hhi, hsize

        cont0 = valid & (row >= 0) & (row < W)
        _, row, hlo, hhi, hsize = jax.lax.while_loop(
            cond, body, (cont0, row, hlo, hhi, hsize))
        return row, hlo, hhi, hsize

    def trim_and_score(row, hlo, hhi, hsize, mm, valid, d, best, done):
        """Flank trimming, polished-point update, completion test.
        Idempotent — safe to re-apply to an already-scored state."""
        rsafe = jnp.maximum(row, 0)
        # absolute alignedlen: the reference clamps minlen at 0 on the
        # absolute scale, so relative lengths would mis-trim once the
        # window has advanced (albase = 2*du + kbase)
        alignedlen = jnp.where(valid, 2 * rsafe + karr + albase, NEGINF)
        maxal = jnp.max(alignedlen, axis=1)
        minlen = jnp.maximum(maxal - maxalignedlendifference, 0)
        need = (hsize * minmatchpercentage128) >> 7
        keep = valid & (row <= ul) & (row + karr <= vl) & \
            (alignedlen >= minlen[:, None]) & \
            (_popcount64(hlo & hmask_lo, hhi & hmask_hi) >= need)
        anyk = keep.any(axis=1)
        first = jnp.argmax(keep, axis=1)
        last = K - 1 - jnp.argmax(keep[:, ::-1], axis=1)
        inwin = (sidx >= first[:, None]) & (sidx <= last[:, None])
        valid = valid & inwin & anyk[:, None]
        died_now = ~anyk & ~done

        # polished-point update (ref: ft_update_trace_and_polished)
        fill = jnp.maximum(pol_size - hsize, 0)
        flo, fhi = _ones64(fill)
        slo, _ = _shl64(flo, fhi, jnp.minimum(hsize, 64))
        filled_lo = hlo | slo                     # pol_size <= 30 bits
        p_lo = (filled_lo & _U32(0x7FFF)).astype(jnp.int32)
        p_hi = ((filled_lo >> _U32(cut_depth)) & _U32(0x7FFF)) \
            .astype(jnp.int32)
        dfm_lo, ss_lo = _polish_walk(p_lo, match_score, difference_score,
                                     cut_depth)
        dfm_hi, _ = _polish_walk(p_hi, match_score, difference_score,
                                 cut_depth)
        polished = (dfm_lo >= 0) & (ss_lo + dfm_hi >= 0)
        cand = jnp.where(valid & polished & ~done[:, None],
                         alignedlen, NEGINF)
        cbest = jnp.max(cand, axis=1)
        kpick = jnp.argmax(cand == cbest[:, None], axis=1)
        better = cbest > best[:, 0]
        pick = lambda a: jnp.take_along_axis(a, kpick[:, None], axis=1)[:, 0]
        newbest = jnp.stack(
            [cbest, pick(rsafe) + rowbase, d, pick(mm)], axis=1)
        best = jnp.where(better[:, None], newbest, best)

        # completion: front[end_k].row == ulen (all in relative terms;
        # end_k_rel = vrem - urem, |end_k_abs| <= d)
        e_rel = vrem - urem
        eidx = jnp.clip(e_rel + D, 0, K - 1)
        take1 = lambda a: jnp.take_along_axis(a, eidx[:, None], axis=1)[:, 0]
        ok_k = (jnp.abs(e_rel + kbase) <= d) & (jnp.abs(e_rel) <= D) & \
            take1(valid) & (take1(row) == urem)
        complete_now = ok_k & ~done
        return valid, best, died_now, complete_now

    # ---- score the input state (gen-0 raw state, or idempotent) -----
    valid, best, died_now, complete_now = trim_and_score(
        row, hlo, hhi, hsize, mm, valid, d_lane, best, done)
    died = died | died_now
    done = done | died_now | complete_now
    paused = jnp.zeros(N, jnp.bool_)

    def gen(_, carry):
        (row, hlo, hhi, hsize, mm, valid, best, done, died, paused,
         d_lane) = carry
        act = ~done & ~paused

        def sh(a, fillval, off):
            if off == 1:   # from slot s-1 (diag k-1)
                return jnp.pad(a, ((0, 0), (1, 0)),
                               constant_values=fillval)[:, :K]
            return jnp.pad(a, ((0, 0), (0, 1)),
                           constant_values=fillval)[:, 1:]

        # candidates: INS from k-1 (row same), MIS from k (row+1),
        # DEL from k+1 (row+1) — first of that order wins row ties
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
                                       jnp.where(use_del, a_del, zero)))

        hlo_n = pick3(sh(hlo, _U32(0), 1), hlo, sh(hlo, _U32(0), -1),
                      _U32(0))
        hhi_n = pick3(sh(hhi, _U32(0), 1), hhi, sh(hhi, _U32(0), -1),
                      _U32(0))
        hs_n = pick3(sh(hsize, 0, 1), hsize, sh(hsize, 0, -1), 0)
        # mismatches: max over tied ins/mis; a deletion contributes its
        # mm only when it wins outright (ref ft-front-prune.c:395-407:
        # the deletion-tie branch has no max_mismatches update)
        mm_ins = jnp.where(v_ins & (r_ins == r_new), sh(mm, 0, 1), NEGINF)
        mm_mis = jnp.where(valid & (r_mis == r_new), mm + 1, NEGINF)
        mm_del = jnp.where(v_del & (r_del == r_new), sh(mm, 0, -1), NEGINF)
        mm_im = jnp.maximum(mm_ins, mm_mis)
        mm_n = jnp.where(mm_im > NEGINF, mm_im, mm_del)

        hs_n = jnp.minimum(hs_n + 1, hist_cap)      # shift a difference in
        hlo_n, hhi_n = _shl64(hlo_n, hhi_n, jnp.ones((), jnp.int32))
        row_n = jnp.where(anyc, r_new, NEGINF)
        row_n, hlo_n, hhi_n, hs_n = add_matches(
            row_n, hlo_n, hhi_n, hs_n, anyc)

        # window/slot edge contact => roll this generation back, pause
        contact = (anyc & (
            (u_more[:, None] & (row_n >= W))
            | (v_more[:, None] & (row_n + karr >= W))
            | (sidx <= 0) | (sidx >= K - 1))).any(axis=1)
        pause_now = act & contact
        commit = act & ~contact

        d_next = jnp.where(commit, d_lane + 1, d_lane)
        valid_n, best_n, died_now, complete_now = trim_and_score(
            row_n, hlo_n, hhi_n, hs_n, mm_n, anyc, d_next, best,
            done | pause_now | ~act)

        cm = commit[:, None]
        row = jnp.where(cm, row_n, row)
        hlo = jnp.where(cm, hlo_n, hlo)
        hhi = jnp.where(cm, hhi_n, hhi)
        hsize = jnp.where(cm, hs_n, hsize)
        mm = jnp.where(cm, mm_n, mm)
        valid = jnp.where(cm, valid_n, valid)
        best = jnp.where(commit[:, None], best_n, best)
        died = died | (commit & died_now)
        done = done | (commit & (died_now | complete_now))
        paused = paused | pause_now
        return (row, hlo, hhi, hsize, mm, valid, best, done, died,
                paused, d_next)

    carry = (row, hlo, hhi, hsize, mm, valid, best, done, died, paused,
             d_lane)
    carry = jax.lax.fori_loop(0, GENS, gen, carry)
    (row, hlo, hhi, hsize, mm, valid, best, done, died, paused,
     d_lane) = carry
    return (row, hlo, hhi, hsize, mm, valid, best, done, died, paused,
            d_lane)


# ---------------------------------------------------------------------------
# host driver: windowing, rebasing, chunk loop
# ---------------------------------------------------------------------------

def _host_lcp(u, v):
    """Initial match run (wildcards never match) — one np pass."""
    m = min(len(u), len(v))
    if m == 0:
        return 0
    eq = (u[:m] == v[:m]) & (u[:m] < 4)
    bad = np.flatnonzero(~eq)
    return int(bad[0]) if bad.size else m


class _GreedyBatchConfig:
    # window tiers: a lane that cannot make progress at one tier (its
    # current match run crosses the whole window, so the generation can
    # never commit) escalates to the next, 4x larger window; only
    # exhausting the largest tier falls back to the host engine
    W_TIERS = (384, 1536, 6144, 24576)
    # diagonal-slot tiers: most fronts stay narrow (trimming holds the
    # live window near maxalignedlendifference diagonals), so lanes run
    # in a cheap K=2*16+1-slot wave and only escalate when a rebase
    # finds their live spread no longer fits
    D_TIERS = (16, 64)
    GENS = 48          # XLA twin: fori_loop always runs all GENS
    GENS_PALLAS = 384  # Pallas while_loop exits early; fewer roundtrips
    MAX_CHUNKS = 512
    MAX_WAVE = 131072  # per-device-call lane cap (bounds M + state HBM)
    # single-shot fast path (tasks fitting one window run whole inside
    # the kernel — no state upload, no rebase roundtrips).  Passes are
    # (W, D, GENS): each task runs in exactly ONE pass — the first
    # whose window holds both flanks — at full slot width and
    # generation budget, so every wave is uploaded once and all waves
    # dispatch asynchronously (no host sync until every wave is in
    # flight; transfers, host packing and kernels overlap).  Length-
    # sorted lanes keep block-level divergence low (a block runs until
    # its slowest lane).  Undone lanes (slot drift beyond D or GENS)
    # fall back to the chunked path.
    FULL_PASSES = ((256, 64, 1536), (384, 64, 1536), (768, 64, 1536),
                   (1536, 64, 1536))

    # kept for tests that pin a single diagonal window
    @property
    def D(self):
        return self.D_TIERS[-1]

    @D.setter
    def D(self, value):
        self.D_TIERS = (value,)

    # kept for tests that pin a single window size
    @property
    def W(self):
        return self.W_TIERS[0]

    @W.setter
    def W(self, value):
        self.W_TIERS = (value,)


def greedy_extend_batch(us, vs, *, seedlengths, perc_mat_history: int,
                        maxalignedlendifference: int,
                        errorpercentage: float = 0.0,
                        history: int = 64, matchscore_bias: float = 1.0,
                        pol_info=None,
                        cfg: _GreedyBatchConfig | None = None,
                        _single_shot: bool = True,
                        skip_chunked: bool = False):
    """Batched greedy extension of prefixes of us[i] vs vs[i].

    Returns a dict of int32 arrays (alignedlen, row, distance,
    mismatches) for the best polished point per lane, `died` flags, and
    `fallback` — lanes the device could not finish (slot-window
    overflow or chunk budget); callers must recompute those with the
    host engine.  All non-fallback lanes are bit-exact vs
    ops.greedy.greedy_extend.

    skip_chunked=True marks every lane the single-shot kernel could
    not finish as `fallback` instead of entering the chunked windowed
    machinery — wave-dispatch callers clean the few stragglers up with
    the C++ batch in microseconds, while a chunked subproblem costs
    seconds per wave and its own compile per lane-count shape.
    """
    if not 30 <= history <= 64:
        # cut_depth shrinks below 15 for history < 30; not mirrored here
        raise NotImplementedError("device greedy batch requires a match "
                                  "history size in [30, 64]")
    cfg = cfg or _GreedyBatchConfig()
    tiers, dtiers = cfg.W_TIERS, cfg.D_TIERS
    GENS = cfg.GENS_PALLAS if _use_pallas() else cfg.GENS
    D = dtiers[-1]                    # host state is kept at max width
    K = 2 * D + 1
    N = len(us)
    sl = np.asarray(seedlengths, np.int64)
    if sl.ndim == 0:
        sl = np.full(N, int(sl), np.int64)

    if pol_info is not None:      # exact scores from an existing
        match_score = pol_info.match_score        # PolishingInfo object
        difference_score = pol_info.difference_score
    else:
        match_score = int(20.0 * errorpercentage * matchscore_bias)
        difference_score = 1000 - match_score
    mmp128 = (perc_mat_history * 128) // 100 + \
        (0 if (perc_mat_history * 128) % 100 == 0 else 1)

    ulens = np.asarray([len(u) for u in us], np.int64)
    vlens = np.asarray([len(v) for v in vs], np.int64)
    died = np.zeros(N, bool)
    results = {k: np.zeros(N, np.int32) for k in
               ("alignedlen", "row", "distance", "mismatches")}
    todo = np.ones(N, bool)

    # ---- single-shot fast path ---------------------------------------
    full_impl = greedy_full_impl
    if full_impl is None and _use_pallas():
        from .greedy_pallas import greedy_full_pallas
        full_impl = greedy_full_pallas
    _dbg = os.environ.get("GT_TPU_EXT_DEBUG") == "1"
    if _dbg:
        import time as _time
        _t0 = _time.perf_counter()

        def _mark(label):
            print(f"  [ext] {label} {_time.perf_counter() - _t0:6.2f}s",
                  flush=True)
    else:
        def _mark(label):
            pass
    if full_impl is not None and N and _single_shot:
        # flat task pool: one concatenation up front, then C-memcpy
        # window fills per wave
        uoff = np.concatenate([[0], np.cumsum(ulens, dtype=np.int64)[:-1]])
        voff = np.concatenate([[0], np.cumsum(vlens, dtype=np.int64)[:-1]])
        uflat = np.concatenate([np.asarray(u, np.uint8) for u in us]) \
            if int(ulens.sum()) else np.zeros(1, np.uint8)
        vflat = np.concatenate([np.asarray(v, np.uint8) for v in vs]) \
            if int(vlens.sum()) else np.zeros(1, np.uint8)
        _mark("flatten")
        maxlen = np.maximum(ulens, vlens)
        assigned = ~((ulens >= 1) & (vlens >= 1))
        pending = []          # (Fs, device out, NP_) in dispatch order
        for W0, Df, Gf in cfg.FULL_PASSES:
            sel = ~assigned & (maxlen <= W0)
            assigned |= sel
            fast = np.flatnonzero(sel)
            fast = fast[np.argsort(ulens[fast] + vlens[fast],
                                   kind="stable")]
            W32 = W0 // 32
            # empirical: the W=256/D=64 kernel faults the TPU worker at
            # 131072 lanes (OK through 65536; W>=384 is fine at 131072)
            wave = min(cfg.MAX_WAVE, 65536) if W0 <= 256 else cfg.MAX_WAVE
            for s in range(0, fast.size, wave):
                Fs = fast[s:s + wave]
                NP_ = Fs.size
                # pad to a block multiple: few distinct compile shapes,
                # little dead-lane upload (pow2 padding wastes up to 2x)
                if NP_ <= 4096:
                    NP2 = max(16, 1 << (NP_ - 1).bit_length())
                else:
                    NP2 = -(-NP_ // 4096) * 4096

                def window(flat, off, lens, fill):
                    # C memcpy per lane; numpy fancy gathers are
                    # memory-bound-pathological on small hosts
                    from ..core.native import fill_windows_native
                    out = np.full((NP2, W0), fill, np.uint8)
                    if not fill_windows_native(flat, off, lens, Fs, W0,
                                               fill, out):
                        for t, i in enumerate(Fs):
                            out[t, :lens[i]] = flat[off[i]:off[i] + lens[i]]
                    return out

                U = window(uflat, uoff, ulens, 254)
                V = window(vflat, voff, vlens, 255)
                PK = np.zeros((NP2, 6 * W32 + 3), np.uint32)
                for ci, plane in enumerate(pack_codes(U) + pack_codes(V)):
                    PK[:, ci * W32:(ci + 1) * W32] = plane
                PK[:NP_, 6 * W32 + 0] = sl[Fs]
                PK[:NP_, 6 * W32 + 1] = ulens[Fs]
                PK[:NP_, 6 * W32 + 2] = vlens[Fs]

                out = full_impl(
                    jnp.asarray(PK),
                    jnp.int32(mmp128),
                    jnp.int32(maxalignedlendifference),
                    jnp.int32(match_score),
                    jnp.int32(difference_score),
                    jnp.int32(history), W0, Df, Gf, sync=False)
                pending.append((Fs, out, NP_))
                _mark(f"wave dispatched W={W0} N={NP_}")
        for wi, (Fs, out, NP_) in enumerate(pending):
            out = np.asarray(out)[:, :NP_]
            _mark(f"wave fetched {wi}")
            best_o = out[:4].T
            done_o = out[4] != 0
            died_o = out[5] != 0
            fin = Fs[done_o]
            results["alignedlen"][fin] = best_o[done_o, 0]
            results["row"][fin] = best_o[done_o, 1]
            results["distance"][fin] = best_o[done_o, 2]
            results["mismatches"][fin] = best_o[done_o, 3]
            died[fin] = died_o[done_o]
            todo[fin] = False

    # ---- host generation 0: initial run from the seed ---------------
    ntodo = int(todo.sum())
    if skip_chunked and ntodo:
        _mark(f"skip_chunked: {ntodo} lanes left to host fallback")
        return {
            "alignedlen": results["alignedlen"],
            "row": results["row"],
            "distance": results["distance"],
            "mismatches": results["mismatches"],
            "died": died,
            "fallback": todo.copy(),
        }
    if ntodo == 0:
        # the single-shot path finished every lane; skip the chunked
        # machinery entirely (its (N, K) state arrays are ~1.5GB at
        # 500k lanes — measurable seconds just to allocate)
        _mark("all lanes finished by single-shot path")
        return {
            "alignedlen": results["alignedlen"],
            "row": results["row"],
            "distance": results["distance"],
            "mismatches": results["mismatches"],
            "died": died,
            "fallback": np.zeros(N, bool),
        }
    if ntodo < N:
        # compact the leftover lanes into a subproblem so the chunked
        # state is sized by the stragglers, not the whole batch
        sub = np.flatnonzero(todo)

        class _Shim:
            pass

        shim = _Shim()
        shim.match_score = match_score
        shim.difference_score = difference_score
        sub_out = greedy_extend_batch(
            [us[i] for i in sub], [vs[i] for i in sub],
            seedlengths=sl[sub], perc_mat_history=perc_mat_history,
            maxalignedlendifference=maxalignedlendifference,
            history=history, pol_info=shim, cfg=cfg, _single_shot=False)
        for k in results:
            results[k][sub] = sub_out[k]
        died[sub] = sub_out["died"]
        fallback_all = np.zeros(N, bool)
        fallback_all[sub] = sub_out["fallback"]
        _mark(f"chunked subproblem of {ntodo} lanes merged")
        return {
            "alignedlen": results["alignedlen"],
            "row": results["row"],
            "distance": results["distance"],
            "mismatches": results["mismatches"],
            "died": died & ~fallback_all,
            "fallback": fallback_all,
        }
    du = np.zeros(N, np.int64)        # window origin in u == min live row
    dv = np.zeros(N, np.int64)
    row = np.full((N, K), -(2 ** 30), np.int32)
    hlo = np.zeros((N, K), np.uint32)
    hhi = np.zeros((N, K), np.uint32)
    hsize = np.zeros((N, K), np.int32)
    mm = np.zeros((N, K), np.int32)
    valid = np.zeros((N, K), bool)
    d_lane = np.zeros(N, np.int32)
    done = np.zeros(N, bool)
    best = np.zeros((N, 4), np.int32)
    fallback = np.zeros(N, bool)

    for i in np.flatnonzero(todo):
        c0 = _host_lcp(us[i], vs[i])
        seed = int(sl[i])
        h = ((1 << 64) - 1) if seed >= 64 else ((1 << seed) - 1)
        c_eff = min(c0, 64)
        h = ((h << c_eff) | ((1 << c_eff) - 1)) & ((1 << 64) - 1) \
            if c0 < 64 else (1 << 64) - 1
        hs = min(seed + c0, history)
        # window starts at the run end; rows/cols relative to (du, dv)
        du[i] = c0
        dv[i] = c0
        row[i, D] = 0
        hlo[i, D] = h & 0xFFFFFFFF
        hhi[i, D] = (h >> 32) & 0xFFFFFFFF
        hsize[i, D] = hs
        valid[i, D] = True

    pending = np.flatnonzero(todo)
    tier = np.zeros(N, np.int32)      # index into W tiers, per lane
    dtier = np.zeros(N, np.int32)     # index into D tiers, per lane

    for _chunk in range(cfg.MAX_CHUNKS):
        if pending.size == 0:
            break
        # one device call per (window, diag) tier pair among pending
        # lanes; lanes sorted by remaining work so the kernel's 128-lane
        # blocks are homogeneous (a block exits as soon as ALL its lanes
        # are done, so mixing short and long lanes wastes whole blocks)
        key = tier[pending] * len(dtiers) + dtier[pending]
        P = pending[key == key.min()]
        remaining = (ulens[P] - du[P]) + (vlens[P] - dv[P])
        P = P[np.argsort(remaining, kind="stable")][:cfg.MAX_WAVE]
        W = tiers[int(tier[P[0]])]
        Dw = dtiers[int(dtier[P[0]])]
        csl = slice(D - Dw, D + Dw + 1)   # wave's slot columns
        NP_ = P.size
        U = np.full((NP_, W), 254, np.uint8)
        V = np.full((NP_, W), 255, np.uint8)
        urem = np.zeros(NP_, np.int64)
        vrem = np.zeros(NP_, np.int64)
        for t, i in enumerate(P):
            u, v = us[i], vs[i]
            urem[t] = len(u) - du[i]
            vrem[t] = len(v) - dv[i]
            uw = u[du[i]:du[i] + W]
            vw = v[dv[i]:dv[i] + W]
            U[t, :len(uw)] = uw
            V[t, :len(vw)] = vw
        kbase = (dv[P] - du[P]).astype(np.int32)
        d_before = d_lane[P].copy()

        # pad the lane count to a power of two so jit compiles are
        # reused across batch sizes; pad lanes start done=True
        NP2 = max(16, 1 << (NP_ - 1).bit_length())

        def padded(a, fill=0):
            if NP_ == NP2:
                return jnp.asarray(a)
            pad = np.full((NP2 - NP_,) + a.shape[1:], fill, a.dtype)
            return jnp.asarray(np.concatenate([a, pad]))

        out = greedy_chunk_impl(
            padded(U, 254), padded(V, 255),
            padded(row[P][:, csl]), padded(hlo[P][:, csl]),
            padded(hhi[P][:, csl]), padded(hsize[P][:, csl]),
            padded(mm[P][:, csl]),
            padded(valid[P][:, csl]), padded(d_lane[P]),
            padded(done[P], True), padded(died[P]),
            padded(best[P]),
            padded(np.minimum(urem, 2 ** 30).astype(np.int32)),
            padded(np.minimum(vrem, 2 ** 30).astype(np.int32)),
            padded(kbase),
            padded(np.minimum(du[P], 2 ** 30).astype(np.int32)),
            jnp.int32(mmp128), jnp.int32(maxalignedlendifference),
            jnp.int32(match_score), jnp.int32(difference_score),
            jnp.int32(history), W, Dw, GENS)
        (row_o, hlo_o, hhi_o, hsize_o, mm_o, valid_o, best_o, done_o,
         died_o, paused_o, d_o) = (np.asarray(a)[:NP_] for a in out)

        best[P] = best_o
        done[P] = done_o
        died[P] = died_o
        d_lane[P] = d_o

        # finished lanes -> results
        fin = P[done_o]
        results["alignedlen"][fin] = best[fin, 0]
        results["row"][fin] = best[fin, 1]
        results["distance"][fin] = best[fin, 2]
        results["mismatches"][fin] = best[fin, 3]

        # continuing lanes: rebase window around the live front
        cont = P[~done_o]
        nxt = list(pending[~np.isin(pending, P)])
        for t, i in zip(np.flatnonzero(~done_o), cont):
            vs_mask = valid_o[t]
            rows = row_o[t][vs_mask].astype(np.int64)
            ks_rel = np.flatnonzero(vs_mask).astype(np.int64) - Dw
            ks = ks_rel + int(kbase[t])     # absolute diagonals
            cols = rows + ks_rel            # columns relative to dv
            rmin = int(rows.min())
            cmin = int(cols.min())
            du_n = du[i] + rmin
            dv_n = dv[i] + cmin
            # ks are absolute diagonals (relative to the extension
            # origin); the new kbase is dv_n - du_n.  Pick the smallest
            # diagonal tier whose recentred slot window holds the live
            # spread (tiers both escalate and relax here).
            off = ks - (dv_n - du_n)
            amax = int(np.abs(off).max())
            ndt = next((j for j, Dt in enumerate(dtiers)
                        if amax <= Dt - 1), None)
            if ndt is None:
                fallback[i] = True
                continue
            slots_new = off + D
            # no progress: the current match run crosses the whole
            # window (or the front spread fills it) so no generation
            # can commit — widen the slot window if the spread is the
            # limiter, else escalate to the next, larger window tier
            no_prog = (d_o[t] == d_before[t] and du_n == du[i]
                       and dv_n == dv[i])
            if no_prog and ndt < len(dtiers) - 1 and amax >= Dw - 2:
                ndt += 1
            elif no_prog or rows.max() - rmin >= W - 64:
                if tier[i] + 1 < len(tiers):
                    tier[i] += 1
                else:
                    fallback[i] = True
                    continue
            elif tier[i] > 0:
                # progress made: drop back toward the cheap tier (the
                # long run that forced the escalation has been crossed)
                tier[i] -= 1
            dtier[i] = ndt
            nrow = np.full(K, -(2 ** 30), np.int32)
            nhlo = np.zeros(K, np.uint32)
            nhhi = np.zeros(K, np.uint32)
            nhs = np.zeros(K, np.int32)
            nmm = np.zeros(K, np.int32)
            nval = np.zeros(K, bool)
            src = np.flatnonzero(vs_mask)
            nrow[slots_new] = (rows - rmin).astype(np.int32)
            nhlo[slots_new] = hlo_o[t][src]
            nhhi[slots_new] = hhi_o[t][src]
            nhs[slots_new] = hsize_o[t][src]
            nmm[slots_new] = mm_o[t][src]
            nval[slots_new] = True
            row[i], hlo[i], hhi[i] = nrow, nhlo, nhhi
            hsize[i], mm[i], valid[i] = nhs, nmm, nval
            du[i], dv[i] = du_n, dv_n
            nxt.append(i)
        pending = np.asarray(nxt, dtype=np.int64)
    else:
        fallback[pending] = True
        pending = np.zeros(0, np.int64)

    if pending.size:
        fallback[pending] = True

    return {
        "alignedlen": results["alignedlen"],
        "row": results["row"],
        "distance": results["distance"],
        "mismatches": results["mismatches"],
        "died": died & ~fallback,
        "fallback": fallback,
    }


# ---------------------------------------------------------------------------
# pool-resident fast path: upload the packed sequence pool ONCE and
# build every wave's PK windows on device from int32 descriptors —
# per-lane upload drops from ~200-600 bytes (packed windows) to 24
# bytes, and the host stops packing windows altogether
# ---------------------------------------------------------------------------

def pack_pool(pool: np.ndarray) -> np.ndarray:
    """(6, ceil(T/32)+2) uint32: lo/hi/special bitplanes of the pool and
    of the REVERSED pool (so a reversed flank is a forward window in
    rows 3..5). One trailing pad word per row stays all-special."""
    T = pool.size
    W32g = (T + 31) // 32 + 2
    out = np.zeros((6, W32g), np.uint32)

    def planes(x):
        padded = np.zeros(((T + 31) // 32) * 32, np.uint8)
        padded[:T] = x
        padded[T:] = 255
        lo = np.packbits(padded & 1 == 1, bitorder="little").view(np.uint32)
        hi = np.packbits(padded & 2 == 2, bitorder="little").view(np.uint32)
        sp = np.packbits(padded >= 4, bitorder="little").view(np.uint32)
        return lo, hi, sp

    for base, x in ((0, pool), (3, pool[::-1])):
        lo, hi, sp = planes(x)
        out[base + 0, :lo.size] = lo
        out[base + 1, :hi.size] = hi
        out[base + 2, :sp.size] = sp
        out[base + 2, sp.size:] = 0xFFFFFFFF
    return out


def _pack_desc(desc: np.ndarray) -> np.ndarray:
    """Host: squeeze (ustart, ulen, vstart, vlen, rev, seedlen) rows
    into 3 int32 words (12B/task over the tunnel instead of 24B):
    d0 = ustart | rev<<31; d1 = vstart; d2 = ulen | vlen<<12 |
    seedlen<<24. Bounds: starts < 2^31 (pool guard), lens <= W tiers
    (< 2^12), seedlen <= 63."""
    d = np.empty((desc.shape[0], 3), np.int32)
    d[:, 0] = (desc[:, 0] | (desc[:, 4] << 31)).astype(np.int64) \
        .astype(np.uint32).view(np.int32)
    d[:, 1] = desc[:, 2]
    d[:, 2] = desc[:, 1] | (desc[:, 3] << 12) | (desc[:, 5] << 24)
    return d


@jax.jit
def _pack_out(out):
    """Device: squeeze the 6 int32 result planes into 2 (8B/task down
    the tunnel): p0 = alignedlen | row<<16 (both < 2^16 at single-shot
    tiers); p1 = distance | mismatches<<15 | done<<30 | died<<31."""
    al, row, dist, mism, done, died = (out[i] for i in range(6))
    p0 = al | (row << 16)
    p1 = dist | (mism << 15) | (done << 30) | (died << 31)
    return jnp.stack([p0, p1])


def _unpack_out(pk2: np.ndarray) -> np.ndarray:
    u = pk2.view(np.uint32) if pk2.dtype != np.uint32 else pk2
    al = (u[0] & 0xFFFF).astype(np.int32)
    row = ((u[0] >> 16) & 0x7FFF).astype(np.int32)
    dist = (u[1] & 0x7FFF).astype(np.int32)
    mism = ((u[1] >> 15) & 0x7FFF).astype(np.int32)
    done = ((u[1] >> 30) & 1).astype(np.int32)
    died = ((u[1] >> 31) & 1).astype(np.int32)
    return np.stack([al, row, dist, mism, done, died])


@partial(jax.jit, static_argnames=("W0",))
def _pk_from_pool(gp, desc, W0: int):
    """Device window builder: desc int32[N, 3] = the _pack_desc layout
    (starts already in the coordinate system of the chosen plane set:
    the host maps reversed flanks to reversed-pool coordinates).
    Returns the (N, 6*W32+3) PK layout of the single-shot kernel; pad
    symbols (beyond ulen/vlen) are marked special with zero code planes
    — the kernel only consumes planes through `ok = ~spec`, so this is
    result-identical to the host's 254/255 fills."""
    W32 = W0 // 32
    N = desc.shape[0]
    d0 = desc[:, 0]
    d1 = desc[:, 1]
    d2 = desc[:, 2]
    ustart = d0 & 0x7FFFFFFF
    rev = (d0 >> 31) & 1
    vstart = d1
    ulen = d2 & 0xFFF
    vlen = (d2 >> 12) & 0xFFF
    sl = (d2 >> 24) & 63
    w = jnp.arange(W32, dtype=jnp.int32)

    def side(start, length):
        q = (start >> 5)[:, None] + w[None, :]
        r = (start & 31).astype(_U32)[:, None]
        qmax = gp.shape[1] - 2
        q = jnp.minimum(q, qmax)

        def fetch(p_fwd, p_rev):
            w0 = jnp.where(rev[:, None] == 1, gp[p_rev][q], gp[p_fwd][q])
            w1 = jnp.where(rev[:, None] == 1, gp[p_rev][q + 1],
                           gp[p_fwd][q + 1])
            hi_sh = jnp.clip(_U32(32) - r, 1, 31)
            return jnp.where(r > 0, (w0 >> r) | (w1 << hi_sh), w0)

        lo = fetch(0, 3)
        hi = fetch(1, 4)
        sp = fetch(2, 5)
        nb = jnp.clip(length[:, None] - 32 * w[None, :], 0, 32)
        live = jnp.where(nb >= 32, _U32(0xFFFFFFFF),
                         (_U32(1) << nb.astype(_U32)) - _U32(1))
        return lo & live, hi & live, sp | ~live

    ulo, uhi, usp = side(ustart, ulen)
    vlo, vhi, vsp = side(vstart, vlen)
    pk = jnp.concatenate(
        [ulo, uhi, usp, vlo, vhi, vsp,
         sl.astype(_U32)[:, None], ulen.astype(_U32)[:, None],
         vlen.astype(_U32)[:, None]], axis=1)
    return pk


def greedy_extend_batch_pool(pool: np.ndarray, u_off, u_len, v_off,
                             v_len, rev, *, seedlengths,
                             perc_mat_history: int,
                             maxalignedlendifference: int,
                             errorpercentage: float = 0.0,
                             history: int = 64,
                             matchscore_bias: float = 1.0,
                             pol_info=None,
                             cfg: _GreedyBatchConfig | None = None,
                             skip_chunked: bool = False):
    """Pool-resident batched greedy extension: task i extends
    u = pool[u_off:u_off+u_len] vs v = pool[v_off:v_off+v_len], both
    read REVERSED when rev[i] (left flanks). Single-shot waves upload
    24-byte descriptors against the once-uploaded packed pool;
    stragglers and non-TPU backends materialize their windows and take
    the array path."""
    import time as _time
    _tentry = _time.perf_counter()
    N = int(np.asarray(u_off).size)
    u_off = np.asarray(u_off, np.int64)
    u_len = np.asarray(u_len, np.int64)
    v_off = np.asarray(v_off, np.int64)
    v_len = np.asarray(v_len, np.int64)
    rev = np.asarray(rev, bool)
    sl = np.asarray(seedlengths, np.int64)
    if sl.ndim == 0:
        sl = np.full(N, int(sl), np.int64)

    def slice_task(i):
        u = pool[u_off[i]:u_off[i] + u_len[i]]
        v = pool[v_off[i]:v_off[i] + v_len[i]]
        if rev[i]:
            u = u[::-1]
            v = v[::-1]
        return u, v

    full_impl = greedy_full_impl
    if full_impl is None and _use_pallas():
        from .greedy_pallas import greedy_full_pallas
        full_impl = greedy_full_pallas
    if full_impl is None or N == 0:
        us = [slice_task(i)[0] for i in range(N)]
        vs = [slice_task(i)[1] for i in range(N)]
        return greedy_extend_batch(
            us, vs, seedlengths=sl, perc_mat_history=perc_mat_history,
            maxalignedlendifference=maxalignedlendifference,
            errorpercentage=errorpercentage, history=history,
            matchscore_bias=matchscore_bias, pol_info=pol_info, cfg=cfg)

    cfg = cfg or _GreedyBatchConfig()
    if pol_info is not None:
        match_score = pol_info.match_score
        difference_score = pol_info.difference_score
    else:
        match_score = int(20.0 * errorpercentage * matchscore_bias)
        difference_score = 1000 - match_score
    mmp128 = (perc_mat_history * 128) // 100 + \
        (0 if (perc_mat_history * 128) % 100 == 0 else 1)

    _dbg = os.environ.get("GT_TPU_EXT_DEBUG") == "1"
    if _dbg:
        _t0 = _time.perf_counter()

        def _mark(label):
            print(f"  [pool] {label} {_time.perf_counter() - _t0:6.2f}s",
                  flush=True)
        _mark(f"entry overhead was {_t0 - _tentry:.2f}s")
    else:
        def _mark(label):
            pass
    T = pool.size
    gp = jnp.asarray(pack_pool(pool))
    _mark("pool packed+uploaded")
    # start in the chosen plane set's coordinates: reversed flanks are
    # forward windows of the reversed pool at T - off - len
    us_ = np.where(rev, T - u_off - u_len, u_off).astype(np.int32)
    vs_ = np.where(rev, T - v_off - v_len, v_off).astype(np.int32)
    desc_all = np.stack(
        [us_, u_len.astype(np.int32), vs_, v_len.astype(np.int32),
         rev.astype(np.int32), sl.astype(np.int32)], axis=1)
    if pool.size >= 1 << 31 or int(sl.max(initial=0)) > 63:
        # descriptor packing bounds exceeded: take the array path
        us = [slice_task(i)[0] for i in range(N)]
        vs = [slice_task(i)[1] for i in range(N)]
        return greedy_extend_batch(
            us, vs, seedlengths=sl, perc_mat_history=perc_mat_history,
            maxalignedlendifference=maxalignedlendifference,
            errorpercentage=errorpercentage, history=history,
            matchscore_bias=matchscore_bias, pol_info=pol_info, cfg=cfg)

    results = {k: np.zeros(N, np.int32) for k in
               ("alignedlen", "row", "distance", "mismatches")}
    died = np.zeros(N, bool)
    todo = np.ones(N, bool)
    maxlen = np.maximum(u_len, v_len)
    assigned = ~((u_len >= 1) & (v_len >= 1))
    # plan every wave first, upload ALL padded descriptors in ONE
    # transfer and slice per wave on device: each extra host->device
    # transfer costs a full tunnel round trip on remote backends, which
    # dominated the old per-wave dispatch (~0.3s/wave)
    plan = []
    for W0, Df, Gf in cfg.FULL_PASSES:
        sel = ~assigned & (maxlen <= W0)
        assigned |= sel
        fast = np.flatnonzero(sel)
        fast = fast[np.argsort(u_len[fast] + v_len[fast], kind="stable")]
        wave = min(cfg.MAX_WAVE, 65536) if W0 <= 256 else cfg.MAX_WAVE
        for s in range(0, fast.size, wave):
            Fs = fast[s:s + wave]
            NP_ = Fs.size
            if NP_ <= 4096:
                NP2 = max(16, 1 << (NP_ - 1).bit_length())
            else:
                NP2 = -(-NP_ // 4096) * 4096
            plan.append((W0, Df, Gf, Fs, NP_, NP2))
    total_rows = sum(NP2 for *_x, NP2 in plan)
    all_desc = np.zeros((total_rows, 3), np.int32)
    off = 0
    offs = []
    for W0, Df, Gf, Fs, NP_, NP2 in plan:
        all_desc[off:off + NP_] = _pack_desc(desc_all[Fs])
        offs.append(off)
        off += NP2
    big_desc = jnp.asarray(all_desc)
    sc = (jnp.int32(mmp128), jnp.int32(maxalignedlendifference),
          jnp.int32(match_score), jnp.int32(difference_score),
          jnp.int32(history))
    pending = []
    for (W0, Df, Gf, Fs, NP_, NP2), off in zip(plan, offs):
        pk = _pk_from_pool(gp, big_desc[off:off + NP2], W0)
        out = full_impl(pk, *sc, W0, Df, Gf, sync=False)
        pending.append((Fs, _pack_out(out), NP_))
        _mark(f"wave dispatched W={W0} N={NP_}")
    for wi, (Fs, out, NP_) in enumerate(pending):
        out = _unpack_out(np.asarray(out))[:, :NP_]
        _mark(f"wave fetched {wi}")
        done_o = out[4] != 0
        fin = Fs[done_o]
        results["alignedlen"][fin] = out[0][done_o]
        results["row"][fin] = out[1][done_o]
        results["distance"][fin] = out[2][done_o]
        results["mismatches"][fin] = out[3][done_o]
        died[fin] = out[5][done_o] != 0
        todo[fin] = False

    if todo.any():
        # rescue wave: lanes undone at their tier (slot drift beyond
        # D=64) get one wide-slot single-shot retry before the chunked
        # machinery — typically a handful of lanes, one cheap call
        Fs = np.flatnonzero(todo)
        Wr, Dr, Gr = 1536, 128, 6144
        if int(maxlen[Fs].max()) <= Wr:
            NP_ = Fs.size
            NP2 = max(16, 1 << (NP_ - 1).bit_length()) if NP_ <= 4096 \
                else -(-NP_ // 4096) * 4096
            desc = np.zeros((NP2, 3), np.int32)
            desc[:NP_] = _pack_desc(desc_all[Fs])
            pk = _pk_from_pool(gp, jnp.asarray(desc), Wr)
            out = _unpack_out(np.asarray(_pack_out(full_impl(
                pk, *sc, Wr, Dr, Gr))))[:, :NP_]
            done_o = out[4] != 0
            fin = Fs[done_o]
            results["alignedlen"][fin] = out[0][done_o]
            results["row"][fin] = out[1][done_o]
            results["distance"][fin] = out[2][done_o]
            results["mismatches"][fin] = out[3][done_o]
            died[fin] = out[5][done_o] != 0
            todo[fin] = False
            _mark(f"rescue wave: {NP_} lanes, "
                  f"{NP_ - int(todo.sum())} finished")

    fallback = np.zeros(N, bool)
    if todo.any() and skip_chunked:
        # wave-dispatch callers clean stragglers up with the C++ batch
        fallback[todo] = True
        todo[:] = False
    if todo.any():
        sub = np.flatnonzero(todo)

        class _Shim:
            pass

        shim = _Shim()
        shim.match_score = match_score
        shim.difference_score = difference_score
        sub_out = greedy_extend_batch(
            [slice_task(i)[0] for i in sub],
            [slice_task(i)[1] for i in sub],
            seedlengths=sl[sub], perc_mat_history=perc_mat_history,
            maxalignedlendifference=maxalignedlendifference,
            history=history, pol_info=shim, cfg=cfg, _single_shot=False)
        for k in results:
            results[k][sub] = sub_out[k]
        died[sub] = sub_out["died"]
        fallback[sub] = sub_out["fallback"]
    _mark("return")
    return {
        "alignedlen": results["alignedlen"],
        "row": results["row"],
        "distance": results["distance"],
        "mismatches": results["mismatches"],
        "died": died & ~fallback,
        "fallback": fallback,
    }
