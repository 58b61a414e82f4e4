"""Reference packedindex on-disk format (.bdx) — reader.

Decodes the block-composition-encoded BWT index the reference `gt
packedindex mkindex` writes (ref: src/match/eis-blockcomp.c:
writeIdxHeader :1985 / loadBlockEncIdxSeq :2120, composition tables
src/match/eis-seqblocktranslate.c, range encodings
src/match/eis-seqranges.c), so reference-built packed indexes can be
cross-validated against our FM/BWT layer (the same role
test_esa_refparity plays for `.suf`/`.lcp`).

Layout recap (all bitstrings MSB-first, ref: core/bitpackstring.h:955):

  * header: "BDX\\0" + u32 total header length (rounded to 8192 =
    cwDataPos), then (u32 tag, value) fields — BKSZ block size, BBLK
    blocks/bucket, VOFF varDataPos, ROFF rangeEncPos, SELE seqLen,
    SPBT bitsPerUlong, VDOB bitsPerVarDiskOffset, SSBT blockMap
    alphabet size + per-symbol partialSymSumBits, BEFB/REFB fallbacks,
    NMRN mode list (+ optional CBMB/CEXB/MEXB extension-bit fields).
  * cwData at cwDataPos: per bucket `superBlockCWBits` bits =
    partial symbol sums (cumulative counts BEFORE the bucket)
    + varData bit offset + callback offset + bucketBlocks composition
    indices + cwExt bits.
  * varData at varDataPos: per block, the permutation index
    (permIdxBits depends on that block's composition).
  * block coding: composition index = lexicographic rank of the count
    vector (stars-and-bars order, first composition = all mass on the
    LAST symbol); permutation index = lexicographic rank of the block
    among its multiset permutations.
  * specials (wildcards/separators) are range-encoded at rangeEncPos
    (eis-seqranges) and override the block symbols.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from math import comb

import numpy as np


class BdxError(ValueError):
    pass


class _Bits:
    """MSB-first bit reader over a bytes object."""

    def __init__(self, data: bytes, base_bytes: int = 0):
        self.data = data
        self.base = base_bytes * 8

    def get(self, off: int, nb: int) -> int:
        if nb == 0:
            return 0
        off += self.base
        lo = off // 8
        hi = (off + nb + 7) // 8
        chunk = int.from_bytes(self.data[lo:hi], "big")
        drop = hi * 8 - (off + nb)
        return (chunk >> drop) & ((1 << nb) - 1)


@dataclass
class BdxHeader:
    block_size: int = 0
    bucket_blocks: int = 0
    var_data_pos: int = 0
    range_enc_pos: int = 0
    seq_len: int = 0
    bits_per_ulong: int = 0
    bits_per_var_disk_offset: int = 0
    block_map_alphabet_size: int = 0
    partial_sym_sum_bits: list[int] = field(default_factory=list)
    block_enc_fallback: int = 0
    range_enc_fallback: int = 0
    modes: list[int] = field(default_factory=list)
    callback_offset_bits: int = 0
    cw_ext_bits_per_bucket: int = 0
    max_var_ext_bits_per_bucket: int = 0
    cw_data_pos: int = 0


_TAGS = {
    0x424b535a: "BKSZ", 0x42424c4b: "BBLK", 0x564f4646: "VOFF",
    0x524f4646: "ROFF", 0x4e4d524e: "NMRN", 0x43424d42: "CBMB",
    0x4d455842: "MEXB", 0x43455842: "CEXB", 0x53504254: "SPBT",
    0x53534254: "SSBT", 0x42454642: "BEFB", 0x52454642: "REFB",
    0x56444f42: "VDOB", 0x53454c45: "SELE",
}


def read_header(data: bytes) -> BdxHeader:
    if data[:4] != b"BDX\0":
        raise BdxError("not a .bdx file")
    h = BdxHeader()
    h.cw_data_pos = struct.unpack_from("<I", data, 4)[0]
    off = 8
    end = h.cw_data_pos
    while off + 4 <= end:
        tag = struct.unpack_from("<I", data, off)[0]
        name = _TAGS.get(tag)
        if name is None:
            break
        off += 4
        if name == "BKSZ":
            h.block_size = struct.unpack_from("<I", data, off)[0]
            off += 4
        elif name == "BBLK":
            h.bucket_blocks = struct.unpack_from("<I", data, off)[0]
            off += 4
        elif name == "VOFF":
            h.var_data_pos = struct.unpack_from("<Q", data, off)[0]
            off += 8
        elif name == "ROFF":
            h.range_enc_pos = struct.unpack_from("<Q", data, off)[0]
            off += 8
        elif name == "SELE":
            h.seq_len = struct.unpack_from("<Q", data, off)[0]
            off += 8
        elif name == "SPBT":
            h.bits_per_ulong = struct.unpack_from("<I", data, off)[0]
            off += 4
        elif name == "VDOB":
            h.bits_per_var_disk_offset = \
                struct.unpack_from("<I", data, off)[0]
            off += 4
        elif name == "SSBT":
            n = struct.unpack_from("<I", data, off)[0]
            h.block_map_alphabet_size = n
            off += 4
            h.partial_sym_sum_bits = [
                struct.unpack_from("<I", data, off + 4 * i)[0]
                for i in range(n)]
            off += 4 * n
        elif name == "BEFB":
            h.block_enc_fallback = struct.unpack_from("<I", data, off)[0]
            off += 4
        elif name == "REFB":
            h.range_enc_fallback = struct.unpack_from("<I", data, off)[0]
            off += 4
        elif name == "NMRN":
            n = struct.unpack_from("<I", data, off)[0]
            off += 4
            h.modes = [struct.unpack_from("<I", data, off + 4 * i)[0]
                       for i in range(n)]
            off += 4 * n
        elif name == "CBMB":
            h.callback_offset_bits = \
                struct.unpack_from("<I", data, off)[0]
            off += 4
        elif name == "CEXB":
            h.cw_ext_bits_per_bucket = \
                struct.unpack_from("<Q", data, off)[0]
            off += 8
        elif name == "MEXB":
            h.max_var_ext_bits_per_bucket = \
                struct.unpack_from("<Q", data, off)[0]
            off += 8
    return h


# -- composition / permutation unranking ---------------------------------

def _required_bits(x: int) -> int:
    """gt_requiredUInt64Bits: bits to hold x (>=1 for x=0? callers only
    use x >= 1; bit_length covers both)."""
    return max(1, x.bit_length())


def num_compositions(block_size: int, sigma: int) -> int:
    return comb(block_size + sigma - 1, sigma - 1)


def unrank_composition(idx: int, block_size: int, sigma: int
                       ) -> list[int]:
    """Count vector of composition `idx` in the reference's order:
    lexicographic by (c0..c_{sigma-1}); first = (0,..,0,block_size)."""
    counts = []
    rem = block_size
    for pos in range(sigma - 1):
        syms_left = sigma - pos - 1
        c = 0
        while True:
            # compositions with this prefix: distribute rem-c over
            # syms_left symbols
            n = comb(rem - c + syms_left - 1, syms_left - 1)
            if idx < n:
                break
            idx -= n
            c += 1
        counts.append(c)
        rem -= c
    counts.append(rem)
    return counts


def perm_count(counts: list[int]) -> int:
    from math import factorial
    n = factorial(sum(counts))
    for c in counts:
        n //= factorial(c)
    return n


def perm_idx_bits(counts: list[int]) -> int:
    n = perm_count(counts)
    return _required_bits(n - 1) if n > 1 else 0


def unrank_permutation(idx: int, counts: list[int]) -> list[int]:
    """Symbol sequence of lexicographic rank `idx` among the multiset
    permutations with the given symbol counts."""
    counts = list(counts)
    block = []
    n = sum(counts)
    for _ in range(n):
        for s in range(len(counts)):
            if counts[s] == 0:
                continue
            counts[s] -= 1
            m = perm_count(counts)
            if idx < m:
                block.append(s)
                break
            idx += -m
            counts[s] += 1
    return block


# -- full decode ---------------------------------------------------------

@dataclass
class BdxIndex:
    header: BdxHeader
    symbols: np.ndarray        # block-mapped symbol per position
    ranges: list[tuple[int, int, int]]   # (start, length, symbol)

    def partial_sums_at_bucket(self, data: bytes, b: int):
        pass


def decode(path: str):
    """Decode a .bdx file: returns (header, block-mapped symbol array
    of seq_len entries, per-bucket partial symbol sums array)."""
    data = open(path, "rb").read()
    h = read_header(data)
    sigma = h.block_map_alphabet_size
    bs = h.block_size
    bucket_len = bs * h.bucket_blocks
    nbuckets = (h.seq_len + bucket_len - 1) // bucket_len
    nblocks = (h.seq_len + bs - 1) // bs
    comp_idx_bits = _required_bits(num_compositions(bs, sigma) - 1)
    sym_sum_bits = sum(h.partial_sym_sum_bits)
    cw_bits = (sym_sum_bits + h.bits_per_var_disk_offset
               + h.callback_offset_bits
               + h.bucket_blocks * comp_idx_bits
               + h.cw_ext_bits_per_bucket)
    cw = _Bits(data, h.cw_data_pos)
    var = _Bits(data, h.var_data_pos)

    out = np.zeros(nbuckets * bucket_len, np.uint8)
    psums = np.zeros((nbuckets, sigma), np.int64)
    for b in range(nbuckets):
        base = b * cw_bits
        o = base
        for s in range(sigma):
            psums[b, s] = cw.get(o, h.partial_sym_sum_bits[s])
            o += h.partial_sym_sum_bits[s]
        var_off = cw.get(o, h.bits_per_var_disk_offset)
        o += h.bits_per_var_disk_offset + h.callback_offset_bits
        vpos = var_off
        blocks_here = min(h.bucket_blocks, nblocks - b * h.bucket_blocks)
        for j in range(blocks_here):
            cidx = cw.get(o, comp_idx_bits)
            o += comp_idx_bits
            counts = unrank_composition(cidx, bs, sigma)
            pbits = perm_idx_bits(counts)
            pidx = var.get(vpos, pbits)
            vpos += pbits
            block = unrank_permutation(pidx, counts)
            p0 = b * bucket_len + j * bs
            out[p0:p0 + bs] = block
    return h, out[:h.seq_len], psums


def read_ranges(data: bytes, h: BdxHeader, sym_bits: int = 1
                ) -> list[tuple[int, int, int]]:
    """Special-symbol ranges at rangeEncPos (ref: gt_SRLSaveToStream,
    eis-seqranges.c:460; struct seqRange eis-seqranges-priv.h:25):
    u64 count, then per range u64 startPos + an 8-byte MSB-first
    bitstring holding symBits of range-alphabet symbol followed by the
    range length. Returns (start, length, range_symbol)."""
    off = h.range_enc_pos
    (n,) = struct.unpack_from("<Q", data, off)
    off += 8
    out = []
    for _ in range(n):
        (start,) = struct.unpack_from("<Q", data, off)
        bits = _Bits(data[off + 8:off + 16])
        sym = bits.get(0, sym_bits)
        length = bits.get(sym_bits, 64 - sym_bits)
        out.append((start, length, sym))
        off += 16
    return out


def decode_bwt(path: str, wildcard: int = 254, separator: int = 255
               ) -> np.ndarray:
    """Full BWT recovery from a reference .bdx: block-decoded regular
    symbols with the special ranges overlaid (range symbol 0 ->
    wildcard/UNDEFBWTCHAR, 1 -> separator)."""
    data = open(path, "rb").read()
    h, syms, _ = decode(path)
    out = syms.astype(np.int16)
    for start, length, sym in read_ranges(data, h):
        out[start:start + length] = wildcard if sym == 0 else separator
    return out
