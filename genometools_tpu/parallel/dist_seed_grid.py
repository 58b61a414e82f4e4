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
decides part workloads and memory (maxfreq fitting) in the reference.

`distributed_seed_extend` is the full dispatch: cells are
load-balanced by the device-counted mlistlens (largest-first onto the
least-loaded lane), one lane per mesh device, and every lane runs its
cells' complete pipeline (pairing -> diagband -> wave-batched device
extension -> match records) with its jit dispatches pinned to that
device via jax.default_device, so extension waves for different cells
genuinely overlap across chips. Emission is reassembled in grid-cell
order, so the output is byte-identical to the single-device grid —
the reference's own part-count/thread-count invariance bar
(ref: src/match/diagbandseed.c:4594-4597 + 5982 thread fan-out).
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

def distributed_seed_extend(aenc, benc, params, events=None,
                            devices=None):
    """Mesh-dispatched part x part seed_extend (see module docstring).

    Same contract as match.seed_extend.seed_extend with parts > 1;
    requires params.parts > 1 (the grid IS the distribution axis,
    ref: gt_seed_extend.c:1251 + diagbandseed.c:6044). devices
    defaults to jax.devices(). Returns the match list in grid-cell
    order (byte-identical to the single-device engine)."""
    import threading

    from ..match.seed_extend import (
        default_seedlength, enumerate_kmers, grid_cell_matches,
        sequence_ranges, _filter_list)

    selfcomp = benc is None
    benc_eff = benc or aenc
    k = params.seedlength or default_seedlength(aenc, benc_eff)
    mincov = params.mincoverage if params.mincoverage is not None \
        else int(2.5 * k)
    if not params.userdefinedleastlength:
        params.userdefinedleastlength = mincov
    belowscore = params.belowscore()
    strands = (["F"] if params.forward else []) + \
        (["P"] if params.reverse else [])
    amaxlen = aenc.max_seq_length()

    aranges = sequence_ranges(aenc, params.parts)
    branges = aranges if selfcomp else sequence_ranges(benc_eff,
                                                       params.parts)
    alist_full = enumerate_kmers(aenc, k, revcomp=False)
    blists = {d: enumerate_kmers(benc_eff, k, revcomp=(d == "P"))
              for d in strands}

    cells = []
    for ai in range(len(aranges)):
        for bi in range(ai if selfcomp else 0, len(branges)):
            if params.pick is not None and \
                    (ai + 1, bi + 1) != tuple(params.pick):
                continue
            cells.append((ai, bi))
    if not cells:
        return []

    # device-counted workloads drive the lane assignment (the stage the
    # reference sizes thread parts with, gt_diagbandseed_get_mlistlen)
    import jax
    devices = list(devices if devices is not None else jax.devices())
    nlanes = max(1, min(len(devices), len(cells)))
    try:
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(jax.devices()[:nlanes]), ("shard",)) \
            if nlanes > 1 else None
        counts = grid_mlistlen(
            alist_full, [_filter_list(blists[strands[0]], lo, hi)
                         for lo, hi in branges],
            aranges, mesh, selfcomp=selfcomp) if mesh is not None \
            else np.ones(len(cells), np.int64)
    except Exception:
        counts = np.ones(len(cells), np.int64)
    # counts cover the full selfcomp cell grid in (a-major) order;
    # map to our (possibly picked) cell list
    full = []
    for ai in range(len(aranges)):
        for bi in range(ai if selfcomp else 0, len(branges)):
            full.append((ai, bi))
    cmap = {c: int(counts[i]) if i < len(counts) else 1
            for i, c in enumerate(full)}

    # largest-first onto the least-loaded lane
    lanes = [[] for _ in range(nlanes)]
    loads = [0] * nlanes
    for idx in sorted(range(len(cells)),
                      key=lambda i: -cmap.get(cells[i], 1)):
        lane = loads.index(min(loads))
        lanes[lane].append(idx)
        loads[lane] += cmap.get(cells[idx], 1)

    results = [None] * len(cells)
    cell_events = [[] if events is not None else None
                   for _ in range(len(cells))]
    errors = []

    def run_lane(lane_id):
        dev = devices[lane_id % len(devices)]
        try:
            with jax.default_device(dev):
                for idx in lanes[lane_id]:
                    ai, bi = cells[idx]
                    results[idx] = grid_cell_matches(
                        aenc, benc_eff, params, k, mincov, belowscore,
                        selfcomp, strands, amaxlen, alist_full, blists,
                        aranges[ai], branges[bi], ai == bi,
                        cell_events[idx])
        except Exception as e:          # surface lane failures
            errors.append(e)

    threads = [threading.Thread(target=run_lane, args=(i,))
               for i in range(nlanes)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]

    out = []
    for idx in range(len(cells)):
        out.extend(results[idx] or [])
        if events is not None:
            events.extend(cell_events[idx])
    return out
