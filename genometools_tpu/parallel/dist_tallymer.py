"""Mesh-sharded tallymer counting (tyr mkindex analog).

Capability analog of the reference's threaded tyr-mkindex counting
(ref: src/match/tyr-mkindex.c over the per-part suffix iterators;
thread model firstcodes.c:506): the window-code multiset is counted
over a `jax.sharding.Mesh` instead of pthread parts.

Scheme (communication-scaling, no replication of the code list):
  1. window codes arrive position-sharded over the mesh (P shards);
  2. each device routes every code to the device owning its top-bit
     code range with ONE all_to_all (the fixed-width analog of the
     reference's code-range parts);
  3. each device sorts its received range locally and run-length
     counts it — device d's (mers, counts) block is globally sorted
     and disjoint, so the host concatenation in device order IS the
     sorted mer table (byte-identical to the single-host counter).

Per-device memory is O(n/P) for the shard plus the padded all_to_all
buffers; per-device traffic is one all_to_all of the shard.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def sharded_mer_counts(codes: np.ndarray, k: int, mesh: Mesh):
    """Count the window-code multiset over the mesh.

    Returns (mers int64 sorted unique, counts int64) equal to
    np.unique(codes, return_counts=True).  Device lanes are int32, so
    the code space must fit 31 bits (k <= 15); wider codes raise
    ValueError (host counter handles them — the int32-pair lane trick
    of dist_doubling_sharded is the planned extension).
    """
    if 2 * k > 30:
        raise ValueError("sharded_mer_counts: k > 15 needs pair lanes")
    (axis,) = mesh.axis_names
    nP = mesh.devices.size
    n = codes.size
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    m = -(-n // nP)
    SENT = np.int32(2 ** 31 - 1)
    pad = np.full(m * nP - n, SENT, np.int32)
    shard = jnp.asarray(np.concatenate([codes.astype(np.int32), pad]))
    # owner by top bits of the 2k-bit code space
    shift = max(2 * k - max(nP.bit_length() - 1, 0), 0)

    def stage(block):
        blk = block.reshape(-1)                      # (m,)
        owner = jnp.where(blk >= SENT, nP - 1,
                          (blk >> shift).astype(jnp.int32))
        owner = jnp.minimum(owner, nP - 1)
        dests = jnp.arange(nP, dtype=jnp.int32)
        send = jnp.where(owner[None, :] == dests[:, None],
                         blk[None, :], SENT)          # (P, m)
        recv = jax.lax.all_to_all(send, axis, 0, 0)   # (P, m) mine
        mine = jnp.sort(recv.reshape(-1))             # SENT block at end
        first = jnp.concatenate([jnp.ones(1, bool),
                                 mine[1:] != mine[:-1]])
        first &= mine < SENT
        idx = jnp.cumsum(first.astype(jnp.int32)) - 1
        # sorted uniques then SENT padding; counts land in the same
        # ascending-unique order via the first-occurrence ranks
        uniq = jnp.sort(jnp.where(first, mine, SENT))
        cnts = jnp.zeros(mine.shape, jnp.int32).at[idx].add(
            (mine < SENT).astype(jnp.int32))
        return uniq[None], cnts[None]

    uniq, cnts = jax.shard_map(
        stage, mesh=mesh, in_specs=(P(axis),),
        out_specs=(P(axis), P(axis)))(shard.reshape(nP, m))
    uniq = np.asarray(uniq).reshape(nP, -1)
    cnts = np.asarray(cnts).reshape(nP, -1)
    mers_out, counts_out = [], []
    for d in range(nP):
        keep = uniq[d] < SENT
        mers_out.append(uniq[d][keep].astype(np.int64))
        counts_out.append(cnts[d][keep].astype(np.int64))
    return (np.concatenate(mers_out), np.concatenate(counts_out))
