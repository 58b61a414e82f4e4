"""Xdrop alignment extension (Zhang et al. arbitrary-score fronts).

Semantics equivalent of the reference gt_evalxdroparbitscoresextend
(ref: src/match/xdrop.c:224-430), including its exact tie-breaking
(deletion preferred over replacement over insertion at equal row), the
X-drop test against the best score dback generations back, the
MININFINITY-generation termination rule, and bound pruning — so extension
coordinates match the reference bit for bit.

Two implementations:
  * `xdrop_extend` — host scalar mirror (numpy arrays, Python loop over
    d-generations). This is the correctness oracle and the fallback.
  * a batched device version lives in ops/xdrop_batch.py (lanes over
    seeds; same front recurrence expressed as fixed-shape lax ops).

Score model (ref: seed-extend.c:73-76 defaults): mat=2 mis=-1 ins=-2
del=-2; distances derived as in gt_calculatedistancesfromscores
(ref: xdrop.c:129): with doubled scores if mat is odd,
gcd = gcd(mat-mis, mat/2-ins, mat/2-del), unit costs = diffs/gcd,
EVAL(k, d) = k*mat/2 - d*gcd.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class XdropScores:
    mat: int = 2
    mis: int = -1
    ins: int = -2
    del_: int = -2

    def distances(self):
        mat, mis, ins, dele = self.mat, self.mis, self.ins, self.del_
        if mat % 2:
            mat, mis, ins, dele = 2 * mat, 2 * mis, 2 * ins, 2 * dele
        g = math.gcd(math.gcd(mat - mis, mat // 2 - ins), mat // 2 - dele)
        return (mat - mis) // g, (mat // 2 - ins) // g, \
            (mat // 2 - dele) // g, g, mat


# the reference's sensitivity/error-rate -> xdropbelowscore parameter table
# (ref: src/match/seed-extend-params.h best_xdropbelow90..99; values are
# tuned constants, indexed [sensitivity-90][errorpercentage], errperc<=30)
_BEST_XDROPBELOW = {
    90: [0, 3, 3, 3, 4, 4, 4, 4, 4, 4, 4, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6],
    91: [0, 3, 3, 3, 4, 4, 4, 4, 4, 4, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6],
    92: [0, 3, 3, 4, 4, 4, 4, 4, 4, 4, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6],
    93: [0, 3, 3, 4, 4, 4, 4, 4, 4, 4, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6],
    94: [0, 3, 3, 4, 4, 4, 4, 4, 4, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 7],
    95: [0, 3, 3, 4, 4, 4, 4, 4, 4, 5, 5, 5, 5, 5, 5, 5, 5, 5, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 7, 7],
    96: [0, 3, 3, 4, 4, 4, 4, 4, 5, 5, 5, 5, 5, 5, 5, 5, 5, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 7, 7, 7],
    97: [0, 3, 4, 4, 4, 4, 4, 4, 5, 5, 5, 5, 5, 5, 5, 5, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 7, 7, 7, 7, 7],
    98: [0, 3, 4, 4, 4, 4, 4, 5, 5, 5, 5, 5, 5, 5, 5, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 7, 7, 7, 7, 7, 7],
    99: [0, 3, 4, 4, 4, 4, 5, 5, 5, 5, 5, 5, 5, 6, 6, 6, 6, 6, 6, 6, 6, 6, 7, 7, 7, 7, 7, 7, 7, 7, 7],
}


def optimal_xdrop_belowscore(errorpercentage: int, sensitivity: int) -> int:
    """ref: gt_optimalxdropbelowscore (seed-extend.c:55)."""
    s = min(max(sensitivity, 90), 99)
    return _BEST_XDROPBELOW[s][min(errorpercentage, 30)]


@dataclass
class XdropBest:
    ivalue: int
    jvalue: int
    score: int
    best_d: int
    best_k: int


def _lcp(u: np.ndarray, v: np.ndarray, i: int, j: int) -> int:
    """Length of the longest common prefix of u[i:] and v[j:]. Only equal
    *regular* symbols match (special codes never equal anything — callers
    pass raw uint8 codes where specials are >= 254 and distinct positions
    of equal special codes must not match; the reference compares decoded
    characters where wildcards never match, ref: seqabstract.c)."""
    n, m = len(u), len(v)
    l = 0
    while i + l < n and j + l < m:
        a, b = u[i + l], v[j + l]
        if a != b or a >= 4:
            break
        l += 1
    return l


def xdrop_extend(u: np.ndarray, v: np.ndarray, belowscore: int,
                 scores: XdropScores = XdropScores()) -> XdropBest:
    """One-direction extension: how far do prefixes of u and v align?

    u, v: uint8 code arrays, already oriented (pass reversed slices for a
    left extension). Mirrors the reference front loop exactly.
    """
    ulen, vlen = len(u), len(v)
    if ulen == 0 or vlen == 0:
        return XdropBest(0, 0, 0, 0, 0)
    dis_mis, dis_ins, dis_del, gcd, mat2 = scores.distances()
    half_mat = mat2 // 2
    end_k = ulen - vlen
    integermax = max(ulen, vlen)
    integermin = -integermax
    dback = (belowscore + half_mat) // gcd + 1
    allowed_mininf = max(dis_mis, dis_ins, dis_del) - 1

    def EVAL(K, D):
        return K * half_mat - D * gcd

    fronts = {}
    big_t = []

    idx = _lcp(u, v, 0, 0)
    if idx >= ulen or idx >= vlen:
        lbound, ubound = 1, -1
    else:
        lbound, ubound = 0, 0
    fronts[(0, 0)] = idx
    best = XdropBest(idx, idx, EVAL(2 * idx, 0), 0, 0)
    bigt_tmp = best.score
    big_t.append(bigt_tmp)

    currd = 0
    current_mininf_gen = 0
    always_mininf = True
    while lbound <= ubound:
        currd += 1
        for k in range(lbound - 1, ubound + 2):
            i = integermin
            direction = 0
            d_del = currd - dis_del
            if lbound < k and d_del >= 0 and -d_del <= k - 1 <= d_del:
                i = fronts.get((d_del, k - 1), integermin) + 1
                direction = 1  # deletion
            d_mis = currd - dis_mis
            if lbound <= k <= ubound and d_mis >= 0 and -d_mis <= k <= d_mis:
                row = fronts.get((d_mis, k), integermin) + 1
                if direction == 0 or row > i:
                    i = row
                    direction = 2  # replacement
            d_ins = currd - dis_ins
            if k < ubound and d_ins >= 0 and -d_ins <= k + 1 <= d_ins:
                row = fronts.get((d_ins, k + 1), integermin)
                if direction == 0 or row > i:
                    i = row
                    direction = 3  # insertion
            if i < 0:
                if direction == 0:
                    always_mininf = False
                fronts[(currd, k)] = integermin
                continue
            j = i - k
            previousd = currd - dback
            if previousd > 0 and big_t and \
                    EVAL(i + j, currd) < big_t[previousd] - belowscore:
                fronts[(currd, k)] = integermin
                continue
            if k <= -currd or k >= currd or \
                    (fronts.get((currd - 1, k), integermin) < i
                     <= min(ulen, vlen + k)):
                if ulen > i and vlen > j:
                    l = _lcp(u, v, i, j)
                    i += l
                    j += l
                always_mininf = False
                fronts[(currd, k)] = i
                if EVAL(i + j, currd) > bigt_tmp:
                    bigt_tmp = EVAL(i + j, currd)
                    best = XdropBest(i, j, bigt_tmp, currd, k)
            else:
                always_mininf = False
                fronts[(currd, k)] = fronts.get((currd - 1, k), integermin)
        if always_mininf:
            current_mininf_gen += 1
            if current_mininf_gen > allowed_mininf:
                break
        else:
            current_mininf_gen = 0
            always_mininf = True
        big_t.append(bigt_tmp)
        # alignment complete?
        if -currd <= end_k <= currd and \
                fronts.get((currd, end_k), integermin) == ulen:
            break
        # prune bounds
        for k in range(lbound - 1, ubound + 2):
            if fronts.get((currd, k), integermin) > integermin:
                lbound = k
                break
        for k in range(ubound + 1, lbound - 2, -1):
            if fronts.get((currd, k), integermin) > integermin:
                ubound = k
                break
        for k in range(0, lbound - 1, -1):
            if fronts.get((currd, k), integermin) == vlen + k:
                lbound = k
                break
        for k in range(0, ubound + 1):
            if fronts.get((currd, k), integermin) == ulen:
                ubound = k
                break
    return best


def xdrop_extend_bruteforce(u: np.ndarray, v: np.ndarray, belowscore: int,
                            scores: XdropScores = XdropScores()):
    """Banded DP oracle (exhaustive over all prefix pairs within
    distance bound): best EVAL score over alignments of (u-prefix,
    v-prefix). Ignores the X-drop pruning, so it upper-bounds
    xdrop_extend's score — used to check the front recurrence."""
    ulen, vlen = len(u), len(v)
    dis_mis, dis_ins, dis_del, gcd, mat2 = scores.distances()
    half = mat2 // 2
    INF = 10 ** 9
    D = np.full((ulen + 1, vlen + 1), INF, np.int64)
    D[0, 0] = 0
    for i in range(ulen + 1):
        for j in range(vlen + 1):
            if i < ulen and j < vlen and u[i] == v[j] and u[i] < 4:
                D[i + 1, j + 1] = min(D[i + 1, j + 1], D[i, j])
            if i < ulen and j < vlen:
                D[i + 1, j + 1] = min(D[i + 1, j + 1], D[i, j] + dis_mis)
            if i < ulen:
                D[i + 1, j] = min(D[i + 1, j], D[i, j] + dis_del)
            if j < vlen:
                D[i, j + 1] = min(D[i, j + 1], D[i, j] + dis_ins)
    best = 0
    for i in range(ulen + 1):
        for j in range(vlen + 1):
            if D[i, j] < INF:
                best = max(best, (i + j) * half - D[i, j] * gcd)
    return best
