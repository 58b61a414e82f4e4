"""Distributed prefix-doubling suffix sort over a device mesh.

The scaling step beyond parallel/dist_esa.py: here the doubling *sort
itself* is distributed. Design (SURVEY §2.10's all_to_all radix
redistribution, expressed with jax.sharding collectives):

  * the int32 key array and the evolving rank array are replicated
    (mirroring the reference's replicated-encseq model per BASELINE);
  * each round, every device takes a position shard, computes its
    (rank, rank[i+h]) pairs, and routes each pair to the device owning
    that rank's value range (dest = rank * P // n — exact because rank
    is the primary sort key, so equal ranks land on one device and the
    global order is the concatenation of per-device orders);
  * one `all_to_all` exchanges the buckets, each device sorts only its
    ~n/P received pairs, dense ranks are stitched across shard
    boundaries with a `ppermute` of boundary pairs plus an exclusive
    scan of per-device distinct counts;
  * the new replicated rank materializes with a masked scatter + `psum`.

Cost note (honest): send buffers are padded to worst-case capacity
C = n1/nP per (src, dst) pair, so `all_to_all` delivers nP*C = n1 slots
to every device and the per-device `lax.sort` each round runs over n1
slots (most of them pad sentinels that sort to the front). Only the
*key computation* is n/P per device; the per-round sort/memory does not
shrink with the mesh. The genuinely position-sharded engine with ~n/P
per-device sorts and O(n/P) per-round traffic is
parallel/dist_doubling_sharded.py (block-bitonic distributed sorts); this
replicated variant is kept as the simpler cross-check path.

Exactness: verified against the single-chip doubling engine on the
virtual CPU mesh (tests/test_parallel.py).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..index.suffix import _BOOT


def _round_shardmap(keys, rank, h, n1: int, nP: int, mesh):
    """One distributed doubling round; returns the new replicated rank."""
    C = n1 // nP  # per-device positions == bucket capacity (always enough)

    def stage(pos_shard):
        # pos_shard: int32[C] positions owned by this device
        r1 = rank[pos_shard]
        nxt = jnp.minimum(pos_shard + h, n1 - 1)
        r2 = jnp.where(pos_shard + h < n1, rank[nxt], np.int32(-1))
        # rank-range partition without the r1*nP product: the full product
        # overflows int32 (and astype(int64) is silently truncated when
        # x64 is off) for n1 >= 2^31/nP. Any non-decreasing map of r1 onto
        # [0, nP) with equal ranks on one device keeps the concatenated
        # per-device orders globally sorted, so ceil-divide instead.
        per = -(-n1 // nP)  # static host int: ceil(n1 / nP)
        dest = jnp.minimum(r1 // per, nP - 1).astype(jnp.int32)
        # stable-sort local triples by dest to form contiguous buckets
        order = jnp.argsort(dest, stable=True)
        d_s, r1_s, r2_s, p_s = dest[order], r1[order], r2[order], \
            pos_shard[order]
        counts = jnp.zeros(nP, jnp.int32).at[d_s].add(1)
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                  jnp.cumsum(counts)[:-1]])
        # scatter into (nP, C) padded send buffers; pad slot marker r1=-1
        send_r1 = jnp.full((nP, C), -1, jnp.int32)
        send_r2 = jnp.full((nP, C), -1, jnp.int32)
        send_p = jnp.full((nP, C), -1, jnp.int32)
        within = jnp.arange(C, dtype=jnp.int32) - starts[d_s]
        send_r1 = send_r1.at[d_s, within].set(r1_s)
        send_r2 = send_r2.at[d_s, within].set(r2_s)
        send_p = send_p.at[d_s, within].set(p_s)

        recv_r1 = jax.lax.all_to_all(send_r1, "shard", 0, 0, tiled=True)
        recv_r2 = jax.lax.all_to_all(send_r2, "shard", 0, 0, tiled=True)
        recv_p = jax.lax.all_to_all(send_p, "shard", 0, 0, tiled=True)
        fr1 = recv_r1.reshape(-1)
        fr2 = recv_r2.reshape(-1)
        fp = recv_p.reshape(-1)
        valid = fp >= 0
        # sort: invalid (r1 == -1) first, then by (r1, r2)
        s1, s2, sp = jax.lax.sort((fr1, fr2, fp), num_keys=2)
        nvalid = valid.sum()
        npad = fp.size - nvalid

        # distinct-group flags within this device (pads excluded)
        sv = sp >= 0
        neq = jnp.zeros(fp.size, jnp.bool_)
        neq = neq.at[1:].set((s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1]))
        # boundary with previous device: fetch (last r1, last r2) of the
        # left neighbor's valid tail
        my = jax.lax.axis_index("shard")
        last_r1 = jnp.where(nvalid > 0, s1[-1], np.int32(-1))
        last_r2 = jnp.where(nvalid > 0, s2[-1], np.int32(-1))
        prev_r1 = jax.lax.ppermute(last_r1, "shard",
                                   [(i, (i + 1) % nP) for i in range(nP)])
        prev_r2 = jax.lax.ppermute(last_r2, "shard",
                                   [(i, (i + 1) % nP) for i in range(nP)])
        first_idx = npad  # first valid slot after the pad prefix
        first_differs = jnp.where(
            my == 0, True,
            (s1[jnp.minimum(first_idx, fp.size - 1)] != prev_r1) |
            (s2[jnp.minimum(first_idx, fp.size - 1)] != prev_r2))
        neq = neq.at[0].set(False)
        neq = jnp.where(
            (jnp.arange(fp.size) == first_idx) & sv,
            first_differs, neq & sv)
        # local distinct-count prefix; stitch across devices: rank of an
        # element = offset + (#group starts at or before it locally) - 1.
        # A first element continuing the left neighbor's group has
        # local_cum 0 => rank offset-1 == the neighbor's last group rank.
        local_cum = jnp.cumsum(neq.astype(jnp.int32))
        local_total = local_cum[-1]
        totals = jax.lax.all_gather(local_total, "shard")
        offset = jnp.where(jnp.arange(nP) < my, totals, 0).sum()
        new_rank_sorted = offset + local_cum - 1
        # scatter ranks (shifted +1 so pad contributions stay neutral)
        contrib = jnp.zeros(n1, jnp.int32).at[
            jnp.maximum(sp, 0)].add(
                jnp.where(sv, new_rank_sorted + 1, 0))
        return jax.lax.psum(contrib, "shard")

    pos_all = jnp.arange(n1, dtype=jnp.int32)
    out = jax.shard_map(stage, mesh=mesh, in_specs=(P("shard"),),
                        out_specs=P(), check_vma=False)(pos_all)
    return out - 1  # ranks were shifted +1 so pad scatter stays neutral


@partial(jax.jit, static_argnames=("n1", "mesh"))
def distributed_build_sa(keys: jnp.ndarray, n1: int, mesh: Mesh):
    """Replicated-keys, distributed-sort prefix doubling. n1 must be a
    multiple of the mesh size (pad like index.suffix.build_suffix_array).
    Returns the suffix array (replicated int32[n1])."""
    nP = mesh.devices.size
    # bootstrap on one pass (cheap relative to rounds; reuses the
    # single-chip multi-key sort)
    from ..index.suffix import _build_sa_impl
    idx = jnp.arange(n1, dtype=jnp.int32)
    ops = []
    for j in range(_BOOT):
        kj = jnp.where(idx + j < n1,
                       keys[jnp.minimum(idx + j, n1 - 1)], np.int32(-1))
        ops.append(kj)
    sorted_ops = jax.lax.sort(tuple(ops) + (idx,), num_keys=_BOOT)
    order = sorted_ops[-1]
    neq0 = jnp.zeros(n1, jnp.bool_)
    for j in range(_BOOT):
        sk = sorted_ops[j]
        neq0 = neq0.at[1:].set(neq0[1:] | (sk[1:] != sk[:-1]))
    r = jnp.cumsum(neq0.astype(jnp.int32))
    rank = jnp.zeros(n1, jnp.int32).at[order].set(r)

    levels = max(1, math.ceil(math.log2(max(n1 / _BOOT, 2))))

    def cond(carry):
        t, rank, done = carry
        return jnp.logical_and(t < levels, jnp.logical_not(done))

    def body(carry):
        t, rank, _ = carry
        h = np.int32(_BOOT) << t
        newrank = _round_shardmap(keys, rank, h, n1, nP, mesh)
        done = newrank.max() == n1 - 1
        return t + 1, newrank, done

    _, rank, _ = jax.lax.while_loop(
        cond, body, (np.int32(0), rank, np.bool_(n1 <= 1)))
    return jnp.zeros(n1, jnp.int32).at[rank].set(idx)
