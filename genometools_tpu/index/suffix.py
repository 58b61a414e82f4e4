"""TPU-native suffix array + LCP construction.

This replaces the reference's scalar bucket pipeline (Sfxiterator +
Bentley-Sedgewick multikey quicksort, ref: src/match/sfx-suffixer.c,
src/match/sfx-bentsedg.c) with a data-parallel **prefix-doubling** design:

* One `lax.sort` bootstraps dense ranks from the int32 suffix keys
  (see Encseq.suffix_keys for the key mapping that encodes the reference's
  special-character ordering exactly).
* Each doubling round sorts (rank[i], rank[i+h]) pairs with a two-key
  `lax.sort` — XLA maps this onto the TPU sort network; there is no
  per-bucket recursion, no data-dependent control flow, and every round is
  a fixed-shape O(n) kernel. ceil(log2 n) rounds worst case, with early
  exit via `lax.while_loop` once ranks are dense.
* The per-round rank tables double as a longest-common-prefix oracle: LCP
  of adjacent suffixes is computed by descending the rank levels
  (standard doubling-LCP), fully vectorized over all n adjacent pairs.
  This replaces the sequential Kasai scan (ref: src/match/sfx-linlcp.c:31)
  on the hot path; Kasai is kept host-side as a cross-check.

Uniqueness guarantee: every special character and the sentinel map to a
unique key, so no two distinct suffixes ever share a full-prefix rank,
which (a) makes the final rank a permutation == inverse suffix array, and
(b) makes rank-table equality at level t equivalent to "first 2^t symbols
equal" with no end-of-string corner cases.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _dense_rank_from_order(neq: jnp.ndarray, order: jnp.ndarray, n1: int):
    """Scatter dense ranks (cumsum of not-equal flags) back to positions."""
    r = jnp.cumsum(neq.astype(jnp.int32))
    return jnp.zeros(n1, jnp.int32).at[order].set(r)


# bootstrap width: the initial multi-key sort ranks prefixes of this many
# symbols, so doubling starts at h=BOOT instead of h=1 (saves log2(BOOT)
# sort rounds; exactness is preserved because every suffix contains the
# unique sentinel, so out-of-range pad keys can never decide an order)
_BOOT = 4


@partial(jax.jit, static_argnames=("n1", "with_rank_levels"))
def _build_sa_impl(keys: jnp.ndarray, n1: int, with_rank_levels: bool):
    levels = max(1, math.ceil(math.log2(max(n1 / _BOOT, 2)))) if n1 > 1 else 1
    idx = jnp.arange(n1, dtype=jnp.int32)

    # bootstrap: rank by the first _BOOT symbol keys in one multi-key sort
    ops = []
    for j in range(_BOOT):
        kj = jnp.where(idx + j < n1,
                       keys[jnp.minimum(idx + j, n1 - 1)], jnp.int32(-1))
        ops.append(kj)
    sorted_ops = jax.lax.sort(tuple(ops) + (idx,), num_keys=_BOOT)
    order = sorted_ops[-1]
    neq0 = jnp.zeros(n1, jnp.bool_)
    for j in range(_BOOT):
        sk = sorted_ops[j]
        neq0 = neq0.at[1:].set(neq0[1:] | (sk[1:] != sk[:-1]))
    rank = _dense_rank_from_order(neq0, order, n1)

    if with_rank_levels:
        ranks_all = jnp.zeros((levels + 1, n1), jnp.int32).at[0].set(rank)
    else:
        ranks_all = jnp.zeros((1, n1), jnp.int32)

    def cond(carry):
        t, rank, ranks_all, done = carry
        return jnp.logical_and(t < levels, jnp.logical_not(done))

    def body(carry):
        t, rank, ranks_all, _ = carry
        h = jnp.int32(_BOOT) << t
        nxt = jnp.minimum(idx + h, n1 - 1)
        rank2 = jnp.where(idx + h < n1, rank[nxt], jnp.int32(-1))
        srank, srank2, order = jax.lax.sort((rank, rank2, idx), num_keys=2)
        neq = jnp.concatenate(
            [jnp.zeros(1, jnp.bool_),
             (srank[1:] != srank[:-1]) | (srank2[1:] != srank2[:-1])])
        newrank = _dense_rank_from_order(neq, order, n1)
        if with_rank_levels:
            ranks_all = jax.lax.dynamic_update_slice(
                ranks_all, newrank[None, :], (t + 1, jnp.int32(0)))
        done = newrank[order[-1]] == n1 - 1  # max dense rank == n1-1
        return t + 1, newrank, ranks_all, done

    t_final, rank, ranks_all, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), rank, ranks_all, jnp.bool_(n1 <= 1)))

    sa = jnp.zeros(n1, jnp.int32).at[rank].set(idx)

    if with_rank_levels:
        # fill untouched levels with the final (permutation) rank so the LCP
        # descent can statically iterate over all rows
        lev = jnp.arange(levels + 1, dtype=jnp.int32)[:, None]
        ranks_all = jnp.where(lev > t_final, rank[None, :], ranks_all)
    return sa, rank, ranks_all


@partial(jax.jit, static_argnames=("n1",))
def _lcp_impl(keys: jnp.ndarray, sa: jnp.ndarray, ranks_all: jnp.ndarray,
              n1: int):
    levels = ranks_all.shape[0] - 1
    x = sa[:-1]
    y = sa[1:]
    l = jnp.zeros(n1 - 1, jnp.int32)
    # rank row t covers prefixes of length _BOOT * 2^t
    for t in range(levels, -1, -1):
        h = jnp.int32(_BOOT) << t
        rt = ranks_all[t]
        xs = jnp.minimum(x, n1 - 1)
        ys = jnp.minimum(y, n1 - 1)
        ok = (x < n1) & (y < n1) & (x != y) & (rt[xs] == rt[ys])
        step = jnp.where(ok, h, 0)
        l = l + step
        x = x + step
        y = y + step
    # residue below the bootstrap width: direct key comparisons
    alive = jnp.ones(n1 - 1, jnp.bool_)
    for _ in range(_BOOT - 1):
        xs = jnp.minimum(x, n1 - 1)
        ys = jnp.minimum(y, n1 - 1)
        alive = alive & (x < n1) & (y < n1) & (x != y) & \
            (keys[xs] == keys[ys])
        step = alive.astype(jnp.int32)
        l = l + step
        x = x + step
        y = y + step
    return jnp.concatenate([jnp.zeros(1, jnp.int32), l])


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def build_suffix_array(keys, with_lcp: bool = True):
    """Build (sa, lcp) from int32 suffix keys.

    ``keys`` has length totallength+1 (sentinel included), so ``sa`` is the
    full suftab with totallength+1 entries (ref: .suf layout,
    src/match/sfx-suffixgetset.c) and ``lcp[i] = lcp(sa[i-1], sa[i])``
    with lcp[0] = 0 (ref: .lcp layout, src/match/sfx-lcpvalues.c).

    Inputs are padded to the next power of two so XLA compilations are
    reused across lengths. Pad positions get strictly increasing keys
    larger than every real key, so they occupy exactly the last
    ``pad - n1`` suftab slots; slicing the first n1 entries recovers the
    exact unpadded result (pad boundary lcp is 0 by construction).
    """
    keys = np.asarray(keys, np.int32)
    n1 = int(keys.shape[0])
    if n1 == 0:
        z = jnp.zeros(0, jnp.int32)
        return (z, z) if with_lcp else (z, None)
    npad = _next_pow2(n1)
    # int32 arithmetic bounds: pad keys are maxkey+1..maxkey+(npad-n1) and
    # the doubling rounds form idx + h with idx, h < npad — both must stay
    # below 2^31. encseq's own guard (n + num_chars < 2^31) admits sizes in
    # (2^30, 2^31) that would overflow silently here, so reject them too.
    if npad > 2 ** 30 or int(keys.max()) + (npad - n1) >= 2 ** 31 - 1:
        raise NotImplementedError(
            "int64 index path not yet wired (n1 > 2^30 needs it)")
    if npad > n1:
        maxkey = int(keys.max())
        pad = maxkey + 1 + np.arange(npad - n1, dtype=np.int32)
        keys_p = np.concatenate([keys, pad])
    else:
        keys_p = keys
    keys_j = jnp.asarray(keys_p)
    sa, rank, ranks_all = _build_sa_impl(keys_j, npad, with_lcp)
    sa = sa[:n1]
    if not with_lcp:
        return sa, None
    lcp = _lcp_impl(keys_j, sa, ranks_all, n1)
    return sa, lcp


# ---------------------------------------------------------------------------
# host-side reference implementations (cross-checks, mirror of the
# reference's internal verifiers sfx-lwcheck.c / sfx-suftaborder.c)
# ---------------------------------------------------------------------------

def suffix_array_bruteforce(keys: np.ndarray) -> np.ndarray:
    """O(n^2 log n) reference: sort suffixes of the key array directly."""
    keys = np.asarray(keys)
    n1 = keys.size
    idx = sorted(range(n1), key=lambda i: keys[i:].tolist())
    return np.asarray(idx, np.int32)


def lcp_bruteforce(keys: np.ndarray, sa: np.ndarray) -> np.ndarray:
    keys = np.asarray(keys)
    out = np.zeros(len(sa), np.int32)
    for i in range(1, len(sa)):
        a, b = sa[i - 1], sa[i]
        l = 0
        while a + l < keys.size and b + l < keys.size and keys[a + l] == keys[b + l]:
            l += 1
        out[i] = l
    return out


def kasai_lcp(keys: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai 13n LCP (ref: gt_ENCSEQ_lcp13_kasai, src/match/sfx-linlcp.c:31).

    Host-side numpy/Python; used as a cross-check for the doubling LCP.
    """
    keys = np.asarray(keys)
    n1 = len(sa)
    rank = np.empty(n1, np.int64)
    rank[sa] = np.arange(n1)
    lcp = np.zeros(n1, np.int32)
    h = 0
    for i in range(n1):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n1 and j + h < n1 and keys[i + h] == keys[j + h]:
                h += 1
            lcp[r] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


def check_suftab_order(keys: np.ndarray, sa: np.ndarray) -> bool:
    """Lightweight order check (ref: gt_suftab_lightweightcheck,
    src/match/sfx-lwcheck.c): verify adjacent suffixes strictly increase."""
    keys = np.asarray(keys)
    n1 = keys.size
    if sorted(sa.tolist()) != list(range(n1)):
        return False
    for i in range(1, n1):
        a, b = int(sa[i - 1]), int(sa[i])
        # compare suffixes
        la, lb = n1 - a, n1 - b
        m = min(la, lb)
        ka, kb = keys[a:a + m], keys[b:b + m]
        d = np.nonzero(ka != kb)[0]
        if d.size == 0:
            if la >= lb:
                return False
        else:
            j = d[0]
            if ka[j] > kb[j]:
                return False
    return True
