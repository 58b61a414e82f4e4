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


def shulen_sum(subject: Encseq, query_codes: np.ndarray) -> int:
    """Sum over query positions of (longest match in subject) + 1,
    skipping wildcard/separator start positions
    (ref: esa-shulen.c gt_multiesa2shulengthdist)."""
    esa = build_esa(subject, with_lcp=False)
    searcher = SuffixArraySearcher(esa)
    total = 0
    qn = query_codes.size
    for qpos in range(qn):
        if is_special(query_codes[qpos:qpos + 1])[0]:
            continue
        total += searcher.longest_prefix_match(query_codes[qpos:]) + 1
    return total


def _pmax_factory(p: float, subject_length: int):
    """Probability that the shulen at a position is <= x under the
    null model (ref: shu-divergence.c:42 pmax), memoized per x."""
    from math import lgamma

    cache: dict[int, float] = {}

    def lnchoose(x, k):
        if k == 0 or k == x:
            return 0.0
        return lgamma(x + 1) - lgamma(k + 1) - lgamma(x - k + 1)

    def pmax(x: int) -> tuple[float, bool]:
        hit = cache.get(x)
        if hit is not None:
            return hit, False
        s = 0.0
        reached = False
        for k in range(x + 1):
            m = (2.0 ** x) * (p ** k) * ((0.5 - p) ** (x - k)) * \
                (1.0 - (p ** k) * ((0.5 - p) ** (x - k))) ** subject_length
            if m > 0.0:
                s += math.exp(math.log(m) + lnchoose(x, k))
            if s >= 1.0:
                s = 1.0
                reached = True
                break
        cache[x] = s
        return s, reached

    return pmax


def _exp_shulen(d: float, p: float, subject_length: int, pmax,
                abs_err: float = 1e-5) -> float:
    """Expected average shulen for divergence d
    (ref: shu-divergence.c:104 expShulen)."""
    e = 0.0
    t = 1.0 - d
    p_t = t
    prob_old = 0.0
    threshold_reached = False
    for i in range(1, subject_length):
        factor = 1.0 - p_t
        if not threshold_reached:
            s, reached = pmax(i)
            if reached:
                threshold_reached = True
            prob_i = factor * s
        else:
            prob_i = factor
        delta = (prob_i - prob_old) * i
        e += delta
        if e >= 1.0 and delta / e <= abs_err:
            break
        p_t *= t
        prob_old = prob_i
    return e


def divergence(avg_shulen: float, subject_length: int, gc: float,
               rel_err: float = 1e-3, abs_err: float = 1e-5,
               threshold: float = 1e-9) -> float:
    """Exact divergence solver: bisection on d so that the model's
    expected shulen matches the observation
    (ref: shu-divergence.c:131 gt_divergence; defaults from
    tools/gt_genomediff.c -thr/-abs_err/-rel_err)."""
    p = gc / 2.0
    q = (1.0 - gc) / 2.0
    pmax = _pmax_factory(p, subject_length)
    du = 0.0
    dl = 1.0 - (2 * p * p + 2 * q * q)
    while threshold < (dl - du) / 2.0:
        dm = (du + dl) / 2.0
        exp_shulen = _exp_shulen(dm, p, subject_length, pmax, abs_err)
        if avg_shulen < exp_shulen:
            du = dm
        else:
            dl = dm
        if dl > 0 and abs(dl - du) / dl <= rel_err:
            break
    return (du + dl) / 2.0


def kr_distance(d: float) -> float:
    """Jukes-Cantor correction (ref: gt_calculateKr):
    Kr = -3/4 * ln(1 - 4/3 d)."""
    d = min(d, 0.7499999)
    return -0.75 * math.log(1.0 - (4.0 / 3.0) * d)


def genomediff(genomes: list[Encseq], mirrored: bool = True):
    """Pairwise shulen-sum and Kr matrices over genome encseqs
    (ref: shu-genomediff.c; the tool indexes both strands via
    -mirrored, scripts/genomediff.rb esa_index): returns (sums, kr)
    with sums[i][j] = total shulen of genome i's positions against
    genome j's index.

    Validated against testdata/genomediff/*-kr.out.
    """
    gs = [g.mirror() for g in genomes] if mirrored else genomes
    n = len(gs)
    lengths = [int(np.sum(g.codes < 4)) for g in gs]
    gcs = [float(np.sum((g.codes == 1) | (g.codes == 2)) /
                 max(np.sum(g.codes < 4), 1)) for g in gs]
    searchers = [SuffixArraySearcher(build_esa(g, with_lcp=False))
                 for g in gs]
    sums = np.zeros((n, n), dtype=np.int64)
    for i in range(n):
        qc = gs[i].codes
        for j in range(n):
            if i == j:
                continue
            total = 0
            for qpos in range(qc.size):
                if qc[qpos] >= 4:
                    continue
                total += searchers[j].longest_prefix_match(qc[qpos:]) + 1
            sums[i, j] = total
    avg = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            if i != j:
                avg[i, j] = sums[i, j] / lengths[i]
    kr = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            # query = smaller avg shulen; ties pick the gc farther
            # from 0.5 (ref: shu-genomediff.c:190)
            if avg[i, j] < avg[j, i]:
                query, subject = i, j
            elif avg[j, i] < avg[i, j]:
                query, subject = j, i
            elif abs(gcs[i] - 0.5) < abs(gcs[j] - 0.5):
                query, subject = j, i
            else:
                query, subject = i, j
            d = divergence(avg[query, subject], lengths[subject],
                           gcs[query])
            kr[i, j] = kr[j, i] = kr_distance(d)
    return sums, kr
