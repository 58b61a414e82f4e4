"""Enhanced suffix array: build driver + reference-format file IO.

Capability equivalent of the reference suffixerator pipeline
(ref: src/match/sfx-run.c:428 gt_runsuffixerator) and the ESA mapper
(ref: src/match/esa-map.c, struct Suffixarray src/match/sarr-def.h:63-89).

On-disk formats follow the reference ESA layout (ref:
src/match/esa-fileend.h:26-77):
  .suf — totallength+1 suffix positions, native-endian words
  .lcp — 1 byte per entry; 255 marks an overflow stored in .llv
  .llv — (position, value) native-endian word pairs for lcp >= 255
  .bwt — 1 byte per suffix: character preceding the suffix (SEPARATOR
         for suffixes at position 0 / after specials)
  .prj — text key=value project metadata (ref: src/match/sfx-outprj.c:36-81)
  .bck — leftborder + countspecialcodes tables (prefixlength-code buckets)

The construction itself is the data-parallel doubling engine in
``index.suffix``; this module handles orchestration, derived tables and
persistence.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from ..core.chardef import SEPARATOR, is_special
from ..core.encseq import FWD, Encseq
from .suffix import build_suffix_array

LCP_OVERFLOW = 255


def recommended_prefixlength(num_chars: int, totallength: int) -> int:
    """ref: gt_recommendedprefixlength (src/match/sfx-apfxlen.c):
    roughly log_sigma(totallength), clamped."""
    import math
    if totallength <= 1 or num_chars <= 1:
        return 1
    pl = int(math.log(totallength) / math.log(num_chars))
    return max(1, min(pl, 12))


@dataclass
class EnhancedSuffixArray:
    encseq: Encseq
    readmode: int
    suftab: np.ndarray                 # int (totallength+1)
    lcptab: np.ndarray | None = None   # int32 (totallength+1)
    prefixlength: int = 0
    bcktab: "Bcktab | None" = None

    @property
    def total_length(self) -> int:
        return self.encseq.total_length

    @property
    def longest(self) -> int:
        """Rank of the whole-sequence suffix (ref: .prj key 'longest')."""
        return int(np.nonzero(self.suftab == 0)[0][0]) if self.suftab.size else 0

    def bwt(self) -> np.ndarray:
        """Burrows-Wheeler transform over the encseq codes; position-0 suffix
        and specials map to SEPARATOR-coded undefined (ref: sfx-run.c:173
        bwttab2file: UNDEFBWTCHAR for pos 0 / specials)."""
        codes = self.encseq.codes_view(self.readmode)
        n = codes.size
        prev = self.suftab.astype(np.int64) - 1
        ok = prev >= 0
        vals = np.full(self.suftab.size, SEPARATOR, np.uint8)
        pv = codes[np.clip(prev, 0, max(n - 1, 0))]
        vals[ok] = np.where(is_special(pv[ok]), SEPARATOR, pv[ok])
        return vals


@dataclass
class Bcktab:
    """Per-code bucket boundaries for prefixlength-codes
    (ref: src/match/bcktab.c). leftborder[c] = first suftab index of a
    suffix whose first `prefixlength` chars have code c; suffixes whose
    prefix hits a special sort into the special tail."""

    prefixlength: int
    num_chars: int
    leftborder: np.ndarray        # int[numofallcodes + 1]
    countspecialcodes: np.ndarray  # int[numofallcodes]

    @property
    def numofallcodes(self) -> int:
        return self.num_chars ** self.prefixlength


def compute_bcktab(esa: EnhancedSuffixArray, prefixlength: int) -> Bcktab:
    """Bucket boundaries over prefixlength-codes.

    Layout invariant (matches the reference suftab layout, ref:
    src/match/bcktab.c gt_bcktab_calcboundsparts): the suftab is, in code
    order, [regular bucket of code c][special suffixes whose defined prefix
    maximally extends to code c] for c = 0..numofallcodes-1. A suffix with
    a special at window offset j < prefixlength sorts after every regular
    window sharing its j-symbol prefix, i.e. at maxcode =
    (prefcode+1)*sigma^(prefixlength-j) - 1 (the reference's
    countspecialcodes slot). The sentinel (empty suffix) lands at the last
    code.
    """
    enc = esa.encseq
    sigma = enc.alphabet.num_chars
    ell = prefixlength
    numofallcodes = sigma ** ell
    codes = enc.codes_view(esa.readmode)
    n = codes.size

    sym = np.where(is_special(codes), 0, codes).astype(np.int64)
    special = is_special(codes)
    # first special offset within [p, p+ell), clamped to ell; windows that
    # run off the sequence end count the sentinel as special
    first_special = np.full(n, ell, np.int64)
    pref = np.zeros(n, np.int64)  # running prefix code up to first special
    done = np.zeros(n, bool)
    for j in range(ell):
        in_range = np.arange(n) + j < n
        sp = np.where(in_range, np.concatenate([special[j:], np.ones(j, bool)]), True)
        hit = sp & ~done
        first_special[hit] = j
        done |= hit
        ext = np.where(in_range, np.concatenate([sym[j:], np.zeros(j, np.int64)]), 0)
        pref = np.where(done, pref, pref * sigma + ext)
    regular = first_special == ell

    hist_reg = np.bincount(pref[regular], minlength=numofallcodes)
    # special suffixes -> maxcode slot
    j = first_special[~regular]
    cp = pref[~regular]
    maxcode = (cp + 1) * sigma ** (ell - j) - 1
    spec = np.bincount(maxcode, minlength=numofallcodes)
    spec[numofallcodes - 1] += 1  # sentinel / empty suffix

    # leftborder[c] = start of code c's region; a region is
    # [regular bucket of width hist_reg[c]][specials of width spec[c]]
    leftborder = np.zeros(numofallcodes + 1, np.int64)
    np.cumsum(hist_reg + spec, out=leftborder[1:])
    return Bcktab(prefixlength, sigma, leftborder, spec.astype(np.int64))


def build_esa(encseq: Encseq, readmode: int = FWD, with_lcp: bool = True,
              prefixlength: int | None = None, with_bck: bool = False
              ) -> EnhancedSuffixArray:
    """suffixerator equivalent: encseq -> (suftab, lcptab[, bcktab])."""
    keys = encseq.suffix_keys(readmode)
    sa, lcp = build_suffix_array(keys, with_lcp=with_lcp)
    pl = prefixlength or recommended_prefixlength(
        encseq.alphabet.num_chars, encseq.total_length)
    esa = EnhancedSuffixArray(
        encseq=encseq, readmode=readmode,
        suftab=np.asarray(sa),
        lcptab=np.asarray(lcp) if with_lcp else None,
        prefixlength=pl)
    if with_bck:
        esa.bcktab = compute_bcktab(esa, pl)
    return esa


# ---------------------------------------------------------------------------
# persistence
# ---------------------------------------------------------------------------

_WORD = np.dtype(np.uint64).newbyteorder("=")


def write_esa(esa: EnhancedSuffixArray, indexname: str,
              suf: bool = True, lcp: bool = True, bwt: bool = False,
              bck: bool = False, intsize: int = 64) -> None:
    dt = np.uint64 if intsize == 64 else np.uint32
    if suf:
        esa.suftab.astype(dt).tofile(indexname + ".suf")
    numoflargelcps = 0
    maxbranchdepth = 0
    avg = 0.0
    if lcp and esa.lcptab is not None:
        lcptab = esa.lcptab
        small = np.minimum(lcptab, LCP_OVERFLOW).astype(np.uint8)
        big_idx = np.nonzero(lcptab >= LCP_OVERFLOW)[0]
        numoflargelcps = int(big_idx.size)
        small[big_idx] = LCP_OVERFLOW
        small.tofile(indexname + ".lcp")
        llv = np.empty((numoflargelcps, 2), dt)
        llv[:, 0] = big_idx
        llv[:, 1] = lcptab[big_idx]
        llv.tofile(indexname + ".llv")
        if lcptab.size:
            maxbranchdepth = int(lcptab.max())
            avg = float(lcptab[1:].mean()) if lcptab.size > 1 else 0.0
    if bwt:
        esa.bwt().tofile(indexname + ".bwt")
    if bck and esa.bcktab is not None:
        b = esa.bcktab
        np.concatenate([b.leftborder.astype(dt),
                        b.countspecialcodes.astype(dt)]).tofile(indexname + ".bck")
    _write_prj(esa, indexname, numoflargelcps, avg, maxbranchdepth, intsize)


def _write_prj(esa: EnhancedSuffixArray, indexname: str,
               numoflargelcps: int, averagelcp: float, maxbranchdepth: int,
               intsize: int) -> None:
    enc = esa.encseq
    codes = enc.codes
    sp = is_special(codes)
    n = codes.size
    # prefix/suffix special run lengths
    lpre = int(np.argmin(sp)) if not sp.all() else n
    lsuf = int(np.argmin(sp[::-1])) if not sp.all() else n
    wc = codes == 254
    wpre = int(np.argmin(wc)) if not wc.all() else n
    wsuf = int(np.argmin(wc[::-1])) if not wc.all() else n
    lines = [
        f"totallength={n}",
        f"specialcharacters={enc.special_ranges.total}",
        f"specialranges={enc.special_ranges.count}",
        f"realspecialranges={enc.special_ranges.count}",
        f"lengthofspecialprefix={lpre if sp.size and sp[0] else 0}",
        f"lengthofspecialsuffix={lsuf if sp.size and sp[-1] else 0}",
        f"wildcards={enc.wildcard_ranges.total}",
        f"wildcardranges={enc.wildcard_ranges.count}",
        f"realwildcardranges={enc.wildcard_ranges.count}",
        f"lengthofwildcardprefix={wpre if wc.size and wc[0] else 0}",
        f"lengthofwildcardsuffix={wsuf if wc.size and wc[-1] else 0}",
        f"numofsequences={enc.num_sequences}",
        f"numofdbsequences={enc.num_sequences}",
        "numofquerysequences=0",
        f"numberofallsortedsuffixes={esa.suftab.size}",
        f"longest={esa.longest}",
        f"prefixlength={esa.prefixlength}",
        f"largelcpvalues={numoflargelcps}",
        f"averagelcp={averagelcp:.2f}",
        f"maxbranchdepth={maxbranchdepth}",
        f"integersize={intsize}",
        f"littleendian={'1' if sys.byteorder == 'little' else '0'}",
        f"readmode={esa.readmode}",
        f"mirrored={'1' if enc.mirrored else '0'}",
    ]
    Path(indexname + ".prj").write_text("\n".join(lines) + "\n")


def read_prj(indexname: str) -> dict:
    out = {}
    for line in Path(indexname + ".prj").read_text().splitlines():
        if "=" in line:
            k, v = line.split("=", 1)
            out[k] = v
    return out


def load_esa(indexname: str, encseq: Encseq | None = None,
             need_lcp: bool = True) -> EnhancedSuffixArray:
    """ref: gt_mapsuffixarray (src/match/esa-map.c)."""
    prj = read_prj(indexname)
    intsize = int(prj.get("integersize", 64))
    dt = np.uint64 if intsize == 64 else np.uint32
    n = int(prj["totallength"])
    if encseq is None:
        encseq = Encseq.load(indexname)
    suftab = np.fromfile(indexname + ".suf", dtype=dt).astype(np.int64)
    assert suftab.size == n + 1, "suftab size mismatch with .prj"
    lcptab = None
    if need_lcp and Path(indexname + ".lcp").exists():
        small = np.fromfile(indexname + ".lcp", dtype=np.uint8)
        lcptab = small.astype(np.int64)
        llv_path = Path(indexname + ".llv")
        if llv_path.exists() and llv_path.stat().st_size:
            llv = np.fromfile(indexname + ".llv", dtype=dt).reshape(-1, 2)
            lcptab[llv[:, 0].astype(np.int64)] = llv[:, 1]
    return EnhancedSuffixArray(
        encseq=encseq, readmode=int(prj.get("readmode", FWD)),
        suftab=suftab, lcptab=lcptab,
        prefixlength=int(prj.get("prefixlength", 0)))


def merge_esas(encseqs: list[Encseq], with_lcp: bool = True
               ) -> EnhancedSuffixArray:
    """Merge several indexed sequence sets into one ESA
    (ref: gt dev mergeesa, src/match/esa-merge.c / emimergeesa.h).

    TPU-first take: the reference streams and merges presorted suffix
    readers because a CPU rebuild is expensive; here the combined index
    is rebuilt with the device sort (millions of suffixes/s), which is
    both simpler and faster than a sequential k-way merge. The result is
    exactly the ESA of the concatenated sequence sets.
    """
    from ..core.chardef import SEPARATOR
    import numpy as _np
    parts = []
    ssp = []
    descs = []
    off = 0
    for i, e in enumerate(encseqs):
        if i > 0:
            ssp.append(off)
            off += 1
        parts.append(e.codes)
        # inner separators shift by current offset
        ssp.extend((e.ssp + off).tolist())
        off += e.codes.size
        descs.extend(e.descs)
    codes = _np.empty(off, _np.uint8)
    pos = 0
    for i, pcodes in enumerate(parts):
        if i > 0:
            codes[pos] = SEPARATOR
            pos += 1
        codes[pos:pos + pcodes.size] = pcodes
        pos += pcodes.size
    merged = Encseq(codes, _np.asarray(sorted(ssp), _np.int64), descs,
                    encseqs[0].alphabet)
    return build_esa(merged, with_lcp=with_lcp)
