"""Multi-device sharded ESA construction pipeline.

The distribution design follows SURVEY §2.10 / BASELINE.json: the encseq
(here: the suffix-key array) is **replicated** per device; the suffix
*bucket/code space* is sharded. This mirrors the reference's `-parts`
code-range partitioning (ref: src/match/sfx-partssuf.c:40) but runs parts
concurrently on a `jax.sharding.Mesh` instead of sequentially:

  1. every device scans the replicated keys and histograms first-symbol
     bucket codes; `psum` over the mesh gives the global leftborder
     (ref pass A: sfx-suffixer.c updatekmercount);
  2. each device packs the first ``max_depth`` symbol digits of its own
     position block into bit-packed words and one block-bitonic network
     (shared with parallel/dist_doubling_sharded.py) sorts the
     (words…, pos) tuples across the mesh — the data-parallel analog of
     per-part bucket sorting (ref pass B + gt_sortallbuckets), with
     O(n/P) per-device state and traffic;
  3. the sorted position blocks ARE the per-device SA slices; they are
     concatenated implicitly by the output sharding.

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
    return jnp.where(idx < n1, keys[safe], np.int32(-1))


@partial(jax.jit, static_argnames=("n1", "max_depth", "mesh", "sigma"))
def sharded_suffix_sort(keys: jnp.ndarray, n1: int, max_depth: int,
                        mesh: Mesh, sigma: int = 4):
    """Suffix sort sharded over mesh axis 'shard'.

    keys: int32[n1] replicated (the encseq analog — mirrors the
    reference's replicated-sequence model). The *sort itself* is
    distributed: each device packs the ``max_depth`` symbol digits of
    its C = n1/P position block into bit-packed words (3 bits/symbol
    for DNA) and one block-bitonic network sorts the (words…, pos)
    tuples across the mesh — per-device state and per-step traffic are
    O(n/P); no device ever materializes the global order.

    Digit encoding (total order == the suffix-order contract):
      regular code c        -> c + 1
      special (key >= sigma)-> sigma + 1   (sorts after every regular)
      past-end / after the first special -> 0
    Two suffixes tying on all packed words share their regular prefix
    and have specials at the same depth, so the final ``pos`` key
    finishes the comparison exactly (special at position p == key
    sigma + p, ascending in p).  Ties among suffixes whose regular
    prefixes exceed ``max_depth`` are NOT resolved: callers must ensure
    maxlcp < max_depth or fall back to the doubling engine.

    Returns (sa int32[n1] replicated, global first-symbol histogram —
    the leftborder analog).
    """
    ndev = mesh.devices.size
    assert ndev & (ndev - 1) == 0, "bitonic network needs a pow-2 mesh"
    npad = ((n1 + ndev - 1) // ndev) * ndev
    C = npad // ndev
    pos_all = jnp.arange(npad, dtype=jnp.int32)
    bits = max(1, (sigma + 1).bit_length())   # codes 0..sigma+1
    per_word = 30 // bits                     # keep words non-negative
    from .dist_doubling_sharded import _block_bitonic_sort

    def stage(pos_shard):
        # --- pass A: local histogram over this device's position shard ---
        first = _digit(keys, pos_shard, 0, n1)
        # bucket = first key clipped into [0, sigma]: all specials share
        # one bucket (they order by position = by key anyway)
        sigma_bucket = jnp.minimum(first, np.int32(sigma))
        hist = jnp.zeros(sigma + 1, jnp.int32).at[
            jnp.where(pos_shard < n1, sigma_bucket, sigma)
        ].add(jnp.where(pos_shard < n1, 1, 0))
        hist = jax.lax.psum(hist, "shard")

        # --- pass B: pack this block's digit matrix, then one
        # distributed tuple sort over the mesh ---
        words = []
        acc = jnp.zeros(C, jnp.int32)
        cnt = 0
        alive = jnp.ones(C, jnp.bool_)
        for d in range(max_depth):
            idx = pos_shard + d
            safe = jnp.minimum(idx, n1 - 1)
            dig = keys[safe]
            past = idx >= n1
            spec = dig >= sigma
            code = jnp.where(past | ~alive, 0,
                             jnp.where(spec, sigma + 1, dig + 1))
            acc = (acc << bits) | code
            cnt += 1
            if cnt == per_word:
                words.append(acc)
                acc = jnp.zeros(C, jnp.int32)
                cnt = 0
            alive = alive & ~spec & ~past
        if cnt:
            words.append(acc << (bits * (per_word - cnt)))
        # internal pad positions (pos >= n1) must sort last
        words[0] = jnp.where(pos_shard >= n1, np.int32(2 ** 30), words[0])
        srt = _block_bitonic_sort(words + [pos_shard], len(words) + 1,
                                  ndev, "shard", C)
        return srt[-1], hist

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
        b = jnp.minimum(first, np.int32(num_buckets - 1))
        valid = pos_shard < n1
        hist = jnp.zeros(num_buckets, jnp.int32).at[
            jnp.where(valid, b, num_buckets - 1)
        ].add(jnp.where(valid, 1, 0))
        return jax.lax.psum(hist, "shard")

    return jax.jit(jax.shard_map(
        stage, mesh=mesh, in_specs=(P("shard"),), out_specs=P(),
        check_vma=False,
    ))(pos_all)
