"""Mesh-dispatched seed_extend part x part grid.

The distribution axis the reference reaches with threads over part
pairs (ref: src/match/diagbandseed.c:5982/6044 thread fan-out,
src/tools/gt_seed_extend.c:1251 sequence ranges): grid cells
(A-range x B-range) are sharded over the device mesh with `shard_map`;
every device holds the (replicated) k-mer lists — mirroring the
replicated-encseq model — and computes its cells' merged seed-pair
list lengths (the reference's mlistlen, gt_diagbandseed_get_mlistlen)
entirely on device: one sorted b-list per B-range (static shapes,
padded with a +inf sentinel) + two `searchsorted` per cell over the
range-masked a-list.

This is the scheduling/counting stage of the grid — the stage that
decides part workloads and memory (maxfreq fitting) in the reference;
extension itself runs per cell through the wave-batched device
provider (match/seed_extend._seed_extend_grid).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P



@partial(jax.jit, static_argnames=("ncells", "mesh"))
def _grid_counts(acode, aseq, bcode_by_range, cells, ncells: int,
                 mesh: Mesh):
    def stage(cell_block):
        cell_block = cell_block.reshape(-1, 5)

        def one(cell):
            alo, ahi, bri, blo, bhi = (cell[0], cell[1], cell[2],
                                       cell[3], cell[4])
            bc = bcode_by_range[bri]
            amask = (aseq >= alo) & (aseq <= ahi)
            lo = jnp.searchsorted(bc, acode, side="left")
            hi = jnp.searchsorted(bc, acode, side="right")
            return jnp.where(amask, hi - lo, 0).sum()

        return jax.vmap(one)(cell_block).reshape(-1)

    out = jax.shard_map(stage, mesh=mesh, in_specs=(P("shard"),),
                        out_specs=P("shard"), check_vma=False)(cells)
    return out


def grid_mlistlen(alist, blists_by_range, aranges, mesh: Mesh,
                  selfcomp: bool = True) -> np.ndarray:
    """Per-grid-cell seed-pair counts, cells sharded over the mesh.

    alist: (code, seq, pos) k-mer list of A (numpy);
    blists_by_range: list of (code, seq, pos) per B sequence-range;
    aranges: [(lo, hi)] A sequence-ranges.
    Returns int64[ncells] in (a-major, b-minor) cell order with
    b >= a for selfcomp grids.
    """
    # k-mer codes can exceed int32 (k > 15); the device mesh runs
    # without x64, so rank-compress codes to dense int32 ids on host
    # (order-preserving; searchsorted semantics unchanged)
    acode64 = np.asarray(alist[0], np.int64)
    union = np.unique(np.concatenate(
        [acode64] + [np.asarray(b[0], np.int64) for b in blists_by_range]
    )) if acode64.size else np.zeros(0, np.int64)
    acode = np.searchsorted(union, acode64).astype(np.int32)
    aseq = np.asarray(alist[1], np.int32)
    nb = len(blists_by_range)
    maxlen = max(1, max(np.asarray(b[0]).size for b in blists_by_range))
    sentinel = np.int32(union.size + 1)
    bmat = np.full((nb, maxlen), sentinel, np.int32)
    for i, b in enumerate(blists_by_range):
        c = np.sort(np.searchsorted(
            union, np.asarray(b[0], np.int64)).astype(np.int32))
        bmat[i, :c.size] = c

    cells = []
    for ai, (alo, ahi) in enumerate(aranges):
        for bi in range(ai if selfcomp else 0, nb):
            cells.append((alo, ahi, bi, 0, 0))
    ncells = len(cells)
    nP = mesh.devices.size
    npad = -(-ncells // nP) * nP
    carr = np.zeros((npad, 5), np.int32)
    carr[:ncells] = np.asarray(cells, np.int32)
    carr[ncells:, 0] = 1
    carr[ncells:, 1] = 0          # empty a-range -> count 0
    out = np.asarray(_grid_counts(
        jnp.asarray(acode), jnp.asarray(aseq), jnp.asarray(bmat),
        jnp.asarray(carr.reshape(-1)), npad, mesh))
    return out[:ncells]
