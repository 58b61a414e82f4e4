"""Position-sharded distributed prefix-doubling suffix sort.

The genuinely scaling engine (successor of dist_doubling.py's
replicated-rank design): every per-device array here is O(n/P) and every
per-round exchange moves O(n/P) bytes per device, so both memory and
traffic shrink with the mesh — the TPU-native answer to the reference's
`-parts`/`-memlimit` partitioner (ref: src/match/sfx-partssuf.c:172),
which bounds memory by processing code ranges sequentially; here the
"parts" run concurrently on the mesh instead.

Design:

  * the rank array lives position-sharded: device m owns ranks of
    positions [m*C, (m+1)*C), C = n/P;
  * `rank[i+h]` for a whole block is a *shifted block fetch* — two
    static `ppermute`s (h is static per unrolled round), no all_to_all;
  * the per-round (rank, rank[i+h], pos) tuple sort is a **block-bitonic
    distributed sort**: each device keeps a sorted C-block and the
    bitonic network on P blocks runs merge-split compare-exchanges
    (ppermute partner block, sort 2C, keep low/high half).  By the 0-1
    principle the block network sorts any input, so there is NO skew
    sensitivity and NO overflow path — every step moves exactly C
    items per device, log2(P)*(log2(P)+1)/2 steps;
  * dense re-ranking stitches group boundaries across devices with one
    left-neighbor ppermute + an all_gather of P scalars;
  * the new ranks ride back to their position owners as a second
    block-bitonic sort keyed on position (positions are a permutation,
    so the sorted blocks ARE the owner blocks);
  * rounds early-exit via lax.cond on the replicated distinct-count —
    skipped rounds cost one ppermute'd scalar, not a sort.

Exactness: byte-identical suffix arrays vs the single-chip doubling
engine (tests/test_parallel.py), which itself is golden-verified against
the reference `gt suffixerator` output.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

_BOOT = 4  # bootstrap prefix width (matches index.suffix._BOOT semantics)


def _block_bitonic_sort(arrs, num_keys: int, nP: int, axis: str, C: int):
    """Distributed sort of nP C-blocks of int32 tuple arrays.

    Each device holds one block; returns the globally sorted sequence's
    m-th block on device m. Merge-split bitonic network over sorted
    blocks (0-1 principle => sorts all inputs)."""
    arrs = list(jax.lax.sort(tuple(arrs), num_keys=num_keys))
    logp = nP.bit_length() - 1
    my = jax.lax.axis_index(axis)
    for k in range(1, logp + 1):
        for j in range(k - 1, -1, -1):
            perm = [(i, i ^ (1 << j)) for i in range(nP)]
            recv = [jax.lax.ppermute(a, axis, perm) for a in arrs]
            partner = my ^ (1 << j)
            low_first = my < partner
            # canonical concat order (lower device id first): both
            # partners must sort the IDENTICAL tuple sequence, or tied
            # keys resolve differently on the two sides and the
            # low/high split duplicates one payload and drops another
            merged = jax.lax.sort(
                tuple(jnp.concatenate([jnp.where(low_first, a, r),
                                       jnp.where(low_first, r, a)])
                      for a, r in zip(arrs, recv)),
                num_keys=num_keys)
            dir_up = ((my >> k) & 1) == 0
            keep_low = dir_up == low_first
            arrs = [jnp.where(keep_low, a[:C], a[C:]) for a in merged]
    return arrs


def _shifted_fetch(blk, h: int, nP: int, axis: str, C: int, fill):
    """out[j] = global_array[m*C + j + h] (fill beyond the end).

    h static => the two source blocks are static neighbors m+q, m+q+1;
    two ppermutes move exactly one block per device."""
    q, rrem = divmod(h, C)
    n1 = nP * C
    if q < nP:
        perm_a = [(i, i - q) for i in range(q, nP)]
        a = jax.lax.ppermute(blk, axis, perm_a)
    else:
        a = jnp.zeros_like(blk)
    if rrem and q + 1 < nP:
        perm_b = [(i, i - q - 1) for i in range(q + 1, nP)]
        b = jax.lax.ppermute(blk, axis, perm_b)
    else:
        b = jnp.zeros_like(blk)
    out = jnp.concatenate([a[rrem:], b[:rrem]]) if rrem else a
    my = jax.lax.axis_index(axis)
    pos = my * C + jnp.arange(C, dtype=jnp.int32)
    return jnp.where(pos + h < n1, out, fill)


def _dense_rank_stitched(sorted_keys, nP: int, axis: str, C: int):
    """Dense 0-based ranks of globally sorted tuple blocks + the global
    distinct count (replicated). sorted_keys: list of int32[C]."""
    my = jax.lax.axis_index(axis)
    start = jnp.zeros(C, jnp.bool_)
    neq = jnp.zeros(C - 1, jnp.bool_)
    for s in sorted_keys:
        neq = neq | (s[1:] != s[:-1])
    start = start.at[1:].set(neq)
    # boundary: last tuple of the left neighbor
    perm = [(i, i + 1) for i in range(nP - 1)]
    prev = [jax.lax.ppermute(s[-1], axis, perm) for s in sorted_keys]
    first_differs = jnp.zeros((), jnp.bool_)
    for s, p in zip(sorted_keys, prev):
        first_differs = first_differs | (s[0] != p)
    start = start.at[0].set((my == 0) | first_differs)
    local_cum = jnp.cumsum(start.astype(jnp.int32))
    local_total = local_cum[-1]
    totals = jax.lax.all_gather(local_total, axis)
    offset = jnp.where(jnp.arange(nP) < my, totals, 0).sum()
    return offset + local_cum - 1, jax.lax.psum(local_total, axis)


@partial(jax.jit, static_argnames=("n1", "mesh"))
def sharded_build_sa(keys: jnp.ndarray, n1: int, mesh: Mesh):
    """Position-sharded prefix doubling. keys: int32[n1] (sharded or
    replicated on entry; consumed shard-wise), n1 a multiple of the mesh
    size (pad like index.suffix.build_suffix_array). Returns the suffix
    array sharded over mesh axis 'shard'."""
    nP = mesh.devices.size
    assert n1 % nP == 0 and nP & (nP - 1) == 0
    C = n1 // nP
    levels = max(1, math.ceil(math.log2(max(n1 / _BOOT, 2))))

    def stage(keys_blk):
        keys_blk = keys_blk.reshape(C)
        my = jax.lax.axis_index("shard")
        pos = (my * C + jnp.arange(C, dtype=jnp.int32)).astype(jnp.int32)

        # bootstrap: rank by the first _BOOT symbol keys
        kcols = [keys_blk]
        for j in range(1, _BOOT):
            kcols.append(_shifted_fetch(keys_blk, j, nP, "shard", C,
                                        jnp.int32(-1)))
        srt = _block_bitonic_sort(kcols + [pos], _BOOT, nP, "shard", C)
        skeys, spos = srt[:_BOOT], srt[_BOOT]
        nr, _ = _dense_rank_stitched(skeys, nP, "shard", C)
        back = _block_bitonic_sort([spos, nr], 1, nP, "shard", C)
        rank_blk = back[1]

        done = jnp.zeros((), jnp.bool_)

        def round_body(rank_blk, h: int):
            r2 = _shifted_fetch(rank_blk, h, nP, "shard", C, jnp.int32(-1))
            s1, s2, sp = _block_bitonic_sort([rank_blk, r2, pos], 2, nP,
                                             "shard", C)
            nr, distinct = _dense_rank_stitched([s1, s2], nP, "shard", C)
            _, nrank = _block_bitonic_sort([sp, nr], 1, nP, "shard", C)
            return nrank, distinct == n1

        for t in range(levels):
            h = _BOOT << t
            if h >= n1:
                break
            rank_blk, done = jax.lax.cond(
                done,
                lambda r: (r, jnp.bool_(True)),
                lambda r: round_body(r, h),
                rank_blk)

        # SA: sort (rank, pos) by rank; rank is a permutation when done
        _, sa_blk = _block_bitonic_sort([rank_blk, pos], 1, nP, "shard", C)
        return sa_blk

    return jax.shard_map(stage, mesh=mesh, in_specs=(P("shard"),),
                         out_specs=P("shard"), check_vma=False)(keys)


def sharded_suffix_array(keys, mesh: Mesh) -> np.ndarray:
    """Host wrapper: pad to a power of two (pad keys sort last, as in
    index.suffix.build_suffix_array), run the sharded engine, return the
    unpadded suffix array as numpy."""
    keys = np.asarray(keys, np.int32)
    n1 = keys.size
    nP = mesh.devices.size
    npad = max(nP, 1 << max(0, (n1 - 1).bit_length()))
    if npad > 2 ** 30 or int(keys.max()) + (npad - n1) >= 2 ** 31 - 1:
        raise NotImplementedError("int64 path not wired for sharded build")
    if npad > n1:
        pad = int(keys.max()) + 1 + np.arange(npad - n1, dtype=np.int32)
        keys = np.concatenate([keys, pad])
    sa = np.asarray(sharded_build_sa(jnp.asarray(keys), npad, mesh))
    return sa[:n1]
