"""Core layer tests: alphabet, seqio, encseq."""

import numpy as np
import pytest

from genometools_tpu.core.alphabet import dna_alphabet, guess_alphabet, protein_alphabet
from genometools_tpu.core.chardef import SEPARATOR, UNDEFCHAR, WILDCARD
from genometools_tpu.core.encseq import CPL, FWD, RCL, REV, Encseq
from genometools_tpu.core.seqio import (parse_fasta_bytes, read_seqfile,
                                        write_fasta)


class TestAlphabet:
    def test_dna_mapping(self):
        a = dna_alphabet()
        codes = a.encode(b"aAcCgGtTuU")
        assert codes.tolist() == [0, 0, 1, 1, 2, 2, 3, 3, 3, 3]

    def test_dna_wildcards(self):
        a = dna_alphabet()
        codes = a.encode(b"nNsSyYwWrRkKvVbBdDhHmM")
        assert (codes == WILDCARD).all()

    def test_undef(self):
        a = dna_alphabet()
        assert a.encode(b"x!0")[0] == UNDEFCHAR
        assert (a.encode(b"x!0") == UNDEFCHAR).all()

    def test_decode_roundtrip(self):
        a = dna_alphabet()
        assert a.decode(a.encode(b"acgtn")) == "acgtn"

    def test_protein(self):
        p = protein_alphabet()
        assert p.num_chars == 20
        assert p.encode(b"L")[0] == 0
        assert p.encode(b"X")[0] == WILDCARD

    def test_guess(self):
        assert guess_alphabet(b"ACGTACGTACGT").is_dna()
        assert guess_alphabet(b"MKLVWEEPQRSTFFYH").is_protein()

    def test_complement(self):
        a = dna_alphabet()
        t = a.complement_table()
        assert [t[0], t[1], t[2], t[3]] == [3, 2, 1, 0]
        assert t[WILDCARD] == WILDCARD


class TestSeqio:
    def test_fasta_basic(self):
        s = parse_fasta_bytes(b">s1 desc\nACGT\nACGT\n>s2\nTTTT\n")
        assert s.num_sequences == 2
        assert s.descs == ["s1 desc", "s2"]
        assert s.seqs[0].tobytes() == b"ACGTACGT"
        assert s.seqs[1].tobytes() == b"TTTT"

    def test_fasta_empty_seq(self):
        s = parse_fasta_bytes(b">a\n>b\nAC\n")
        assert s.num_sequences == 2
        assert len(s.seqs[0]) == 0

    def test_fasta_reference_file(self, testdata):
        s = read_seqfile(str(testdata / "Atinsert.fna"))
        assert s.num_sequences == 21
        total = s.total_length
        assert total > 10000
        # all chars must be DNA-mappable
        a = dna_alphabet()
        for seq in s.seqs:
            assert (a.encode(seq) != UNDEFCHAR).all()

    def test_fasta_roundtrip(self, tmp_path):
        s = parse_fasta_bytes(b">x\nACGTACGTNN\n")
        p = tmp_path / "o.fna"
        write_fasta(str(p), s.seqs, s.descs)
        s2 = read_seqfile(str(p))
        assert s2.seqs[0].tobytes() == s.seqs[0].tobytes()

    def test_embl(self, testdata):
        fa = read_seqfile(str(testdata / "Atinsert.fna"))
        em = read_seqfile(str(testdata / "Atinsert.embl"))
        assert em.num_sequences == fa.num_sequences
        for a, b in zip(fa.seqs, em.seqs):
            assert a.tobytes().upper() == b.tobytes().upper()

    def test_genbank(self, testdata):
        fa = read_seqfile(str(testdata / "Atinsert.fna"))
        gb = read_seqfile(str(testdata / "Atinsert.gbk"))
        assert gb.num_sequences == fa.num_sequences
        for a, b in zip(fa.seqs, gb.seqs):
            assert a.tobytes().upper() == b.tobytes().upper()


class TestEncseq:
    def test_concat_layout(self):
        e = Encseq.from_string("acgt|ttnt")
        assert e.total_length == 9
        assert e.num_sequences == 2
        assert e.codes[4] == SEPARATOR
        assert e.codes[7] == WILDCARD
        assert e.codes[:4].tolist() == [0, 1, 2, 3]

    def test_geometry(self):
        e = Encseq.from_string("acg|t|aa")
        assert e.num_sequences == 3
        assert e.seq_startpos(np.array([0, 1, 2])).tolist() == [0, 4, 6]
        assert e.seq_length(np.array([0, 1, 2])).tolist() == [3, 1, 2]
        assert e.seqnum_of_pos(np.array([0, 2, 4, 6, 7])).tolist() == [0, 0, 1, 2, 2]

    def test_readmodes(self):
        e = Encseq.from_string("acgt")
        n = e.total_length
        pos = np.arange(n)
        assert e.get_encoded_char(pos, FWD).tolist() == [0, 1, 2, 3]
        assert e.get_encoded_char(pos, REV).tolist() == [3, 2, 1, 0]
        assert e.get_encoded_char(pos, CPL).tolist() == [3, 2, 1, 0]
        assert e.get_encoded_char(pos, RCL).tolist() == [0, 1, 2, 3]

    def test_readmode_specials(self):
        e = Encseq.from_string("an|g")
        rcl = e.codes_view(RCL)
        # rcl of [a n SEP g] = [c SEP n t]
        assert rcl.tolist() == [1, SEPARATOR, WILDCARD, 3]

    def test_mirror(self):
        e = Encseq.from_string("aacg").mirror()
        assert e.total_length == 9
        assert e.alphabet.decode(e.codes) == "aacg|cgtt"
        assert e.num_sequences == 2

    def test_special_ranges(self):
        e = Encseq.from_string("annna|ccc|g")
        sr = e.special_ranges
        assert sr.starts.tolist() == [1, 5, 9]
        assert sr.lengths.tolist() == [3, 1, 1]
        wr = e.wildcard_ranges
        assert wr.starts.tolist() == [1]
        assert wr.lengths.tolist() == [3]

    def test_suffix_keys(self):
        e = Encseq.from_string("ac|g")
        keys = e.suffix_keys()
        # a c SEP g sentinel
        assert keys.tolist() == [0, 1, 4 + 2, 2, 4 + 4]

    def test_twobit_roundtrip(self):
        rng = np.random.default_rng(0)
        seq = "".join(rng.choice(list("acgt"), 45))
        e = Encseq.from_string(seq)
        words = e.twobit_packed()
        # unpack and compare
        n = e.total_length
        out = np.zeros(n, np.uint8)
        for i in range(n):
            w = int(words[i // 16])
            out[i] = (w >> (2 * (15 - i % 16))) & 3
        assert (out == e.codes).all()

    def test_save_load(self, tmp_path):
        e = Encseq.from_string("acgtn|ttag")
        e.save(str(tmp_path / "idx"))
        e2 = Encseq.load(str(tmp_path / "idx"))
        assert (e2.codes == e.codes).all()
        assert e2.num_sequences == e.num_sequences
        assert e2.alphabet.is_dna()

    def test_from_reference_file(self, testdata):
        e = Encseq.from_files([str(testdata / "Atinsert.fna")])
        assert e.num_sequences == 21
        # match the reference's own stats for Atinsert
        # (21 seqs, separators = 20)
        assert (e.codes == SEPARATOR).sum() == 20


def test_from_files_native_equals_seqset_path(tmp_path, monkeypatch):
    """The one-pass native FASTA intake must build the identical Encseq
    (codes, ssp, descs, origin stats) to the general seqset path."""
    import numpy as np

    from genometools_tpu.core.encseq import Encseq
    f1 = tmp_path / "a.fas"
    f1.write_bytes(b">s one desc\r\nacgtNnACGT\nacg\n>s2\r\nTTnnTT\n\n"
                   b">empty\n>s3\nacgtacgtacgt")
    f2 = tmp_path / "b.fas"
    f2.write_bytes(b">other file\ngggcccNNN\n")
    paths = [str(f1), str(f2)]
    fast = Encseq._from_files_native(paths, None)
    assert fast is not None

    def no_native(*a, **k):
        return None
    monkeypatch.setattr(
        "genometools_tpu.core.native.fasta_encseq_native", no_native)
    slow = Encseq.from_files(paths)
    assert fast.codes.tolist() == slow.codes.tolist()
    assert fast.descs == slow.descs
    assert np.asarray(fast.ssp).tolist() == np.asarray(slow.ssp).tolist()
    assert fast.origin.md5s == slow.origin.md5s
    assert fast.origin.filelengths == slow.origin.filelengths
    assert fast.origin.numofallchars == slow.origin.numofallchars
    assert fast.origin.maxsubalphasize == slow.origin.maxsubalphasize
