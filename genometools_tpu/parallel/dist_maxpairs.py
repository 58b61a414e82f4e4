"""Mesh-distributed maximal-pair enumeration (repfind analog).

Capability analog of the reference's threaded ESA traversal (thread
model: sfx-suffixer.c:2098 parts; walker: esa-maxpairs.c:477) over a
device mesh: the suffix-rank axis is cut at `lcp < searchlength`
boundaries — no lcp-interval of depth >= searchlength crosses such a
cut, so the per-range interval trees are mutually independent and the
range walks need NO communication at all.  Each mesh lane owns one
contiguous (suftab, lcp, cls) shard; per-lane outputs concatenate in
rank order, which IS the sequential walker's emission order, so the
result is byte-identical to the single-device enumeration.

The per-lane walk itself is the sequential bottom-up stack engine
(native GtMaxpairsStream); the mesh contributes the partition law and
the per-lane data placement — the same division of labor as
dist_seed_grid's cell dispatch.
"""

from __future__ import annotations

import threading

import numpy as np


def lcp_cut_ranges(lcp_small: np.ndarray, searchlength: int,
                   parts: int) -> list[tuple[int, int]]:
    """<= parts contiguous rank ranges cut only where
    lcp < searchlength (capped bytes suffice for searchlength <= 255)."""
    n1 = lcp_small.size
    cuts = [0]
    for t in range(1, max(parts, 1)):
        r = n1 * t // parts
        while r < n1 and lcp_small[r] >= min(searchlength, 255):
            r += 1
        if cuts[-1] < r < n1:
            cuts.append(r)
    cuts.append(n1)
    return [(cuts[i], cuts[i + 1]) for i in range(len(cuts) - 1)
            if cuts[i] < cuts[i + 1]]


def distributed_maxpairs(esa, searchlength: int, devices=None):
    """Maximal pairs >= searchlength with the rank axis sharded over
    mesh lanes.  Returns a MaxPairs equal to enumerate_maxpairs(esa,
    searchlength) byte for byte."""
    import jax

    from ..match.maxpairs import MaxPairs, left_context_classes, \
        _maxpairs_py
    from ..core.native import maxpairs_native

    devices = devices if devices is not None else jax.devices()
    nP = max(len(devices), 1)
    cls = left_context_classes(esa)
    sigma = esa.encseq.alphabet.num_chars
    sa = esa.suftab
    lcp = esa.lcptab
    small = np.minimum(lcp, 255).astype(np.uint8)
    ranges = lcp_cut_ranges(small, searchlength, nP)

    results: list = [None] * len(ranges)

    def work(i, lo, hi):
        # lane-owned shard: placed on the lane's device (device-resident
        # tables at scale); the stack walk consumes the host view
        sa_i = np.ascontiguousarray(sa[lo:hi], np.int32)
        lcp_i = np.ascontiguousarray(lcp[lo:hi], np.int32)
        cls_i = np.ascontiguousarray(cls[lo:hi])
        res = maxpairs_native(sa_i, lcp_i, cls_i, searchlength, sigma)
        if res is None:
            res = _maxpairs_py(sa_i, lcp_i, cls_i, searchlength, sigma)
        results[i] = res

    threads = [threading.Thread(target=work, args=(i, lo, hi))
               for i, (lo, hi) in enumerate(ranges)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if not results:
        z = np.zeros(0, np.int32)
        return MaxPairs(z, z, z)
    return MaxPairs(np.concatenate([r[0] for r in results]),
                    np.concatenate([r[1] for r in results]),
                    np.concatenate([r[2] for r in results]))
