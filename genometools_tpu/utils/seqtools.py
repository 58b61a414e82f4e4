"""Sequence utility tools.

Capability equivalents of the reference sequence tools
(ref: src/tools/gt_extractseq.c, gt_shredder.c, gt_sequniq.c,
gt_seqfilter.c, gt_simreads.c, gt_fingerprint.c, gt_splitfasta.c,
gt_convertseq.c, gt_seqtranslate.c, gt_seqmutate.c, gt_seqorder.c,
gt_fastq_sample.c and the engines they wrap).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

from ..core.seqio import SeqSet, read_seqfiles, write_fasta

_COMP = bytes.maketrans(b"acgtACGTnN", b"tgcaTGCAnN")


def revcomp_str(s: str) -> str:
    return s.encode()[::-1].translate(_COMP).decode()


# ---------------------------------------------------------------------------
# extractseq (ref: gt_extractseq.c: -frompos/-topos, -match on descriptions,
# -keys)
# ---------------------------------------------------------------------------

def extractseq(seqset: SeqSet, frompos: int | None = None,
               topos: int | None = None, match: str | None = None,
               keys: list[str] | None = None) -> SeqSet:
    out = SeqSet()
    if frompos is not None:
        # 1-based positions over the concatenation of all sequences
        total = 0
        for seq, desc in zip(seqset.seqs, seqset.descs):
            lo = frompos - 1 - total
            hi = topos - total
            total += len(seq)
            if hi <= 0 or lo >= len(seq):
                continue
            out.seqs.append(seq[max(lo, 0):min(hi, len(seq))])
            out.descs.append(desc)
        return out
    rx = re.compile(match) if match else None
    keyset = set(keys or [])
    for seq, desc in zip(seqset.seqs, seqset.descs):
        if rx is not None and not rx.search(desc):
            continue
        if keyset and desc.split()[0] not in keyset:
            continue
        out.seqs.append(seq)
        out.descs.append(desc)
    return out


# ---------------------------------------------------------------------------
# shredder (ref: gt_shredder.c: cut sequences into overlapping fragments)
# ---------------------------------------------------------------------------

def shredder(seqset: SeqSet, minlength: int = 300, maxlength: int = 700,
             overlap: int = 0, coverage: int = 1, seed: int = 0,
             clip_desc: bool = False) -> SeqSet:
    rng = np.random.default_rng(seed)
    out = SeqSet()
    for _ in range(coverage):
        for seq, desc in zip(seqset.seqs, seqset.descs):
            pos = 0
            n = len(seq)
            while pos < n:
                frag = int(rng.integers(minlength, maxlength + 1))
                piece = seq[pos:pos + frag]
                if len(piece) >= min(minlength, n):
                    out.seqs.append(piece)
                    out.descs.append(desc if not clip_desc
                                     else desc.split()[0])
                pos += max(1, frag - overlap)
    return out


# ---------------------------------------------------------------------------
# sequniq (ref: gt_sequniq.c: remove exact duplicates, optionally
# reverse-complement duplicates)
# ---------------------------------------------------------------------------

def sequniq(seqset: SeqSet, rev: bool = False) -> SeqSet:
    seen = set()
    out = SeqSet()
    for seq, desc in zip(seqset.seqs, seqset.descs):
        key = seq.tobytes().upper()
        rckey = key[::-1].translate(_COMP) if rev else None
        if key in seen or (rev and rckey in seen):
            continue
        seen.add(key)
        out.seqs.append(seq)
        out.descs.append(desc)
    return out


# ---------------------------------------------------------------------------
# seqfilter (ref: gt_seqfilter.c: -minlength -maxlength -maxseqnum
# -sample -step)
# ---------------------------------------------------------------------------

def seqfilter(seqset: SeqSet, minlength: int | None = None,
              maxlength: int | None = None, maxseqnum: int | None = None,
              step: int = 1, nowildcards: bool = False) -> SeqSet:
    out = SeqSet()
    kept = 0
    for i, (seq, desc) in enumerate(zip(seqset.seqs, seqset.descs)):
        if i % step:
            continue
        if minlength is not None and len(seq) < minlength:
            continue
        if maxlength is not None and len(seq) > maxlength:
            continue
        if nowildcards and not all(chr(c).lower() in "acgt" for c in seq):
            continue
        out.seqs.append(seq)
        out.descs.append(desc)
        kept += 1
        if maxseqnum is not None and kept >= maxseqnum:
            break
    return out


# ---------------------------------------------------------------------------
# simreads (ref: gt_simreads.c: sample error-free reads from a sequence)
# ---------------------------------------------------------------------------

def simreads(seqset: SeqSet, num: int = 100, length: int = 100,
             reverse: bool = True, seed: int = 0,
             coverage: float | None = None) -> SeqSet:
    rng = np.random.default_rng(seed)
    lens = np.array([len(s) for s in seqset.seqs], np.int64)
    ok = np.nonzero(lens >= length)[0]
    assert ok.size, "no sequence long enough"
    weights = lens[ok] / lens[ok].sum()
    if coverage is not None:
        num = int(coverage * lens[ok].sum() / length)
    out = SeqSet()
    for r in range(num):
        si = int(rng.choice(ok, p=weights))
        seq = seqset.seqs[si]
        start = int(rng.integers(0, len(seq) - length + 1))
        read = seq[start:start + length]
        if reverse and rng.random() < 0.5:
            read = np.frombuffer(
                read.tobytes()[::-1].translate(_COMP), np.uint8)
        out.seqs.append(read)
        out.descs.append(f"read_{r}")
    return out


# ---------------------------------------------------------------------------
# fingerprint (ref: gt_fingerprint.c: md5 of upper-cased sequence)
# ---------------------------------------------------------------------------

def fingerprints(seqset: SeqSet) -> list[str]:
    return [hashlib.md5(s.tobytes().upper()).hexdigest() for s in seqset.seqs]


# ---------------------------------------------------------------------------
# splitfasta (ref: gt_splitfasta.c: split into numfiles parts or by size)
# ---------------------------------------------------------------------------

def splitfasta(seqset: SeqSet, numfiles: int) -> list[SeqSet]:
    total = seqset.total_length
    target = total / numfiles
    parts = [SeqSet() for _ in range(numfiles)]
    cur = 0
    acc = 0
    for seq, desc in zip(seqset.seqs, seqset.descs):
        if acc >= target * (cur + 1) and cur < numfiles - 1:
            cur += 1
        parts[cur].seqs.append(seq)
        parts[cur].descs.append(desc)
        acc += len(seq)
    return parts


# ---------------------------------------------------------------------------
# seqmutate (ref: gt_seqmutate.c / gt mutate: random point mutations)
# ---------------------------------------------------------------------------

def mutate(seqset: SeqSet, rate_percent: float = 1.0, seed: int = 0) -> SeqSet:
    rng = np.random.default_rng(seed)
    chars = np.frombuffer(b"acgt", np.uint8)
    out = SeqSet()
    for seq, desc in zip(seqset.seqs, seqset.descs):
        s = seq.copy()
        hit = rng.random(len(s)) < rate_percent / 100.0
        s[hit] = chars[rng.integers(0, 4, int(hit.sum()))]
        out.seqs.append(s)
        out.descs.append(desc)
    return out


# ---------------------------------------------------------------------------
# translation (ref: gt_seqtranslate.c, src/core/codon_iterator*.c,
# src/core/trans_table.c — standard translation table 1)
# ---------------------------------------------------------------------------

_CODON_TABLE_1 = {}


def _build_codon_table():
    bases = "tcag"
    aas = ("FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRR"
           "VVVVAAAADDEEGGGG")
    i = 0
    for b1 in bases:
        for b2 in bases:
            for b3 in bases:
                _CODON_TABLE_1[b1 + b2 + b3] = aas[i]
                i += 1


_build_codon_table()


def translate_dna(seq: str, frame: int = 0) -> str:
    """Translate one frame (0/1/2); unknown codons -> 'X'
    (ref: gt_translator_translate)."""
    s = seq.lower().replace("u", "t")
    out = []
    for i in range(frame, len(s) - 2, 3):
        out.append(_CODON_TABLE_1.get(s[i:i + 3], "X"))
    return "".join(out)


def translate_all_frames(seq: str) -> list[str]:
    """6-frame translation (3 forward + 3 reverse complement)."""
    rc = revcomp_str(seq)
    return [translate_dna(seq, f) for f in range(3)] + \
        [translate_dna(rc, f) for f in range(3)]


# ---------------------------------------------------------------------------
# ORF finding (ref: src/extended/orf_iterator.c, gt_orffinder.c)
# ---------------------------------------------------------------------------

def find_orfs(seq: str, minlen: int = 30, start_codons=("atg",),
              stop_codons=("taa", "tag", "tga")) -> list[tuple[int, int, int]]:
    """ORFs as (start, end_exclusive, frame 0..5); coordinates on the
    forward strand for frames 0-2, reverse strand local for 3-5."""
    res = []
    strands = [seq.lower(), revcomp_str(seq).lower()]
    for si, s in enumerate(strands):
        for f in range(3):
            i = f
            start = None
            while i + 3 <= len(s):
                codon = s[i:i + 3]
                if start is None and codon in start_codons:
                    start = i
                elif start is not None and codon in stop_codons:
                    if i + 3 - start >= minlen:
                        res.append((start, i + 3, si * 3 + f))
                    start = None
                i += 3
    return res
