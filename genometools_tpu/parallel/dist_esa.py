"""Multi-device sharded ESA construction pipeline.

The distribution design follows SURVEY §2.10 / BASELINE.json: the encseq
(here: the suffix-key array) is **replicated** per device; the suffix
*bucket/code space* is sharded. This mirrors the reference's `-parts`
code-range partitioning (ref: src/match/sfx-partssuf.c:40) but runs parts
concurrently on a `jax.sharding.Mesh` instead of sequentially:

  1. every device scans the replicated keys and histograms first-symbol
     bucket codes; `psum` over the mesh gives the global leftborder
     (ref pass A: sfx-suffixer.c updatekmercount);
  2. each device takes a contiguous slice of the *rank space* and
     resolves it locally by iterative most-significant-digit refinement
     (stable `lax.sort` passes over successive symbol keys) — the
     data-parallel analog of per-part bucket sorting
     (ref pass B + gt_sortallbuckets);
  3. per-device SA slices are concatenated by `all_gather` (implicitly by
     the output sharding).

Because each position's full ordering is determined by at most
``max_depth`` symbol keys *or* a unique special key, the refinement is
exact whenever every repeat within a bucket diverges within ``max_depth``
symbols; the driver falls back to the global doubling engine when the
input's max LCP exceeds the bound (checked by the caller).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("shard",))


def _digit(keys: jnp.ndarray, pos: jnp.ndarray, d: int, n1: int) -> jnp.ndarray:
    """Symbol key at depth d of each suffix; past-the-end -> -1 (cannot
    happen before a unique special terminates comparison, so only ties
    among identical positions would see it)."""
    idx = pos + d
    safe = jnp.minimum(idx, n1 - 1)
    return jnp.where(idx < n1, keys[safe], jnp.int32(-1))


@partial(jax.jit, static_argnames=("n1", "max_depth", "mesh"))
def sharded_suffix_sort(keys: jnp.ndarray, n1: int, max_depth: int,
                        mesh: Mesh):
    """Suffix sort sharded over mesh axis 'shard'.

    keys: int32[n1] replicated. Returns sa int32[n1] (replicated) and the
    global first-symbol histogram (the leftborder analog).
    """
    ndev = mesh.devices.size
    npad = ((n1 + ndev - 1) // ndev) * ndev
    pos_all = jnp.arange(npad, dtype=jnp.int32)

    def stage(pos_shard):
        # --- pass A: local histogram over this device's position shard ---
        first = _digit(keys, pos_shard, 0, n1)
        # bucket = first key clipped into [0, sigma]: all specials share
        # one bucket (they order by position = by key anyway)
        sigma_bucket = jnp.minimum(first, jnp.int32(4))
        hist = jnp.zeros(5, jnp.int32).at[
            jnp.where(pos_shard < n1, sigma_bucket, 4)
        ].add(jnp.where(pos_shard < n1, 1, 0))
        hist = jax.lax.psum(hist, "shard")

        # --- pass B: stable LSD sort of positions by max_depth symbol
        # digits; each device keeps its contiguous rank slice. NOTE: this
        # round still *computes* the global order per device (the keys are
        # replicated; only the output is sharded) — distributing the sort
        # itself (sample-sort with all_to_all routing) is the next
        # scaling step. Ties beyond max_depth keep input order; callers
        # must ensure maxlcp < max_depth or fall back to the global
        # doubling engine.
        order = jnp.arange(npad, dtype=jnp.int32)
        for d in range(max_depth - 1, -1, -1):
            dig = _digit(keys, order, d, n1) + 2  # shift -1 pad to >=1
            dig = jnp.where(order < n1, dig, jnp.int32(2**30))
            _, order = jax.lax.sort((dig, order), num_keys=1,
                                    is_stable=True)
        shard_size = npad // ndev
        myid = jax.lax.axis_index("shard")
        my_slice = jax.lax.dynamic_slice(order, (myid * shard_size,),
                                         (shard_size,))
        return my_slice, hist

    spec = P("shard")
    out = jax.shard_map(
        stage, mesh=mesh, in_specs=(spec,), out_specs=(spec, P()),
        check_vma=False,
    )(pos_all)
    sa_padded, hist = out
    return sa_padded[:n1], hist


def sharded_kmer_histogram(keys: jnp.ndarray, n1: int, mesh: Mesh,
                           num_buckets: int = 5):
    """Standalone pass-A: sharded scan + psum histogram (leftborder)."""
    ndev = mesh.devices.size
    npad = ((n1 + ndev - 1) // ndev) * ndev
    pos_all = jnp.arange(npad, dtype=jnp.int32)

    def stage(pos_shard):
        first = _digit(keys, pos_shard, 0, n1)
        b = jnp.minimum(first, jnp.int32(num_buckets - 1))
        valid = pos_shard < n1
        hist = jnp.zeros(num_buckets, jnp.int32).at[
            jnp.where(valid, b, num_buckets - 1)
        ].add(jnp.where(valid, 1, 0))
        return jax.lax.psum(hist, "shard")

    return jax.jit(jax.shard_map(
        stage, mesh=mesh, in_specs=(P("shard"),), out_specs=P(),
        check_vma=False,
    ))(pos_all)
