"""Tests for alignment, Karlin-Altschul, chain2dim, query search,
genomediff and the sequence tools."""

import numpy as np
import pytest

from genometools_tpu.core.encseq import Encseq
from genometools_tpu.core.seqio import SeqSet
from genometools_tpu.index.esa import build_esa
from genometools_tpu.match.alignment import (edit_distance, global_alignment,
                                             global_alignment_affine,
                                             global_alignment_linear_space,
                                             local_alignment)
from genometools_tpu.match.chain2dim import Fragment, chain_fragments, \
    weighted_lis_filter
from genometools_tpu.match.karlin_altschul import KarlinAltschulStat, \
    evalue_for_match
from genometools_tpu.match.querysearch import (SuffixArraySearcher,
                                               matching_statistics,
                                               minimum_unique_substrings,
                                               query_substring_matches)
from genometools_tpu.utils import seqtools


def _enc(s):
    return Encseq.from_string(s)


def _codes(s):
    from genometools_tpu.core.alphabet import dna_alphabet
    return dna_alphabet().encode(s.encode())


class TestAlignment:
    def test_edit_distance(self):
        assert edit_distance(_codes("acgt"), _codes("acgt")) == 0
        assert edit_distance(_codes("acgt"), _codes("aggt")) == 1
        assert edit_distance(_codes("acgt"), _codes("agt")) == 1
        assert edit_distance(_codes("aaaa"), _codes("tttt")) == 4

    def test_global_traceback_consistent(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            u = rng.integers(0, 4, 15).astype(np.uint8)
            v = rng.integers(0, 4, 12).astype(np.uint8)
            r = global_alignment(u, v)
            m, mm, ind = r.counts(u, v)
            assert -(mm + ind) == r.score
            # ops cover both sequences
            ulen = sum(c for op, c in r.eops if op in "MD")
            vlen = sum(c for op, c in r.eops if op in "MI")
            assert ulen == 15 and vlen == 12

    def test_linear_space_matches_square(self):
        rng = np.random.default_rng(1)
        for _ in range(8):
            u = rng.integers(0, 4, 20).astype(np.uint8)
            v = rng.integers(0, 4, 17).astype(np.uint8)
            assert global_alignment_linear_space(u, v).score == \
                global_alignment(u, v).score

    def test_local(self):
        u = _codes("ttttacgtacgttttt")
        v = _codes("ccacgtacgtcc")
        r = local_alignment(u, v)
        assert r.score == 2 * 8  # acgtacgt
        assert r.uend - r.ustart == 8

    def test_affine_prefers_single_gap(self):
        u = _codes("aaaatttt")
        v = _codes("aaaacctttt")
        r = global_alignment_affine(u, v, 0, -4, -4, -1)
        # one gap of length 2: opening once
        gaps = [c for op, c in r.eops if op == "I"]
        assert gaps == [2]
        assert r.score == -4 - 2

    def test_cigar(self):
        u = _codes("acgt")
        v = _codes("aggt")
        r = global_alignment(u, v)
        assert r.cigar() == "4M"
        assert r.cigar(distinguish=True, u=u, v=v) == "1=1X2="


class TestKarlinAltschul:
    def test_reference_unit_values(self):
        """Constants from the reference's own gt_evalue_unit_test."""
        ka = KarlinAltschulStat.new_gapped(772376 + 1951, 1952)
        ka.actual_length_db = 772376 - 1951
        ka.num_of_db_seqs = 1952
        assert ka.searchspace(450) == 308243802
        assert ka.searchspace(300) == 199707252
        assert ka.searchspace(475) == 324731250
        ss = ka.searchspace(300)
        ev = ka.evalue(300, 0, 0, ss)
        assert abs(ev / 6.148125e-148 - 1) < 0.01

    def test_evalue_for_match(self):
        ka = KarlinAltschulStat.new_gapped(1_000_000, 10)
        ev, bits = evalue_for_match(ka, 500, 200, 4, 2)
        assert 0 <= ev < 1e-10
        assert bits > 50


class TestChain2dim:
    def test_global_chain(self):
        frags = [Fragment(0, 10, 0, 10, 10),
                 Fragment(20, 30, 20, 30, 10),
                 Fragment(15, 40, 50, 80, 5),   # conflicts with 2nd
                 Fragment(40, 50, 40, 50, 10)]
        score, chain = chain_fragments(frags)
        assert score == 30
        assert chain == [0, 1, 3]

    def test_lis_filter(self):
        keep = weighted_lis_filter([0, 5, 3], [2, 8, 4], [0, 5, 30],
                                   [2, 8, 34], [5, 5, 1])
        assert keep == [0, 1]


class TestQuerySearch:
    def test_interval_and_occurrences(self):
        e = _enc("acgtacgtaaa")
        esa = build_esa(e)
        s = SuffixArraySearcher(esa)
        occ = s.occurrences(_codes("acgt"))
        assert occ.tolist() == [0, 4]
        occ = s.occurrences(_codes("aaa"))
        assert occ.tolist() == [8]
        assert s.occurrences(_codes("ttt")).size == 0

    def test_query_matches(self):
        db = _enc("acgtacgtaaa")
        esa = build_esa(db)
        q = _enc("ttacgtacg")
        rows = query_substring_matches(esa, q, 4)
        # query pos 2 matches 'acgtacg' at db pos 0 with length 7
        assert (0, 2, 7) in rows

    def test_minunique(self):
        db = _enc("acgtacgt")
        esa = build_esa(db)
        q = _enc("ttacg")
        res = minimum_unique_substrings(esa, q, 1)
        # 't' occurs (pos 3,7); 'tt' unique-zero -> break without found;
        # position 2: 'a' not unique, 'ac' not unique, 'acg' not unique...
        for qpos, length in res:
            pat = q.codes[qpos:qpos + length]
            assert SuffixArraySearcher(esa).occurrences(pat).size == 1

    def test_matching_statistics(self):
        db = _enc("acgtacgt")
        esa = build_esa(db)
        q = _enc("cgta")
        ms = matching_statistics(esa, q)
        assert ms[0] == 4  # cgta occurs


class TestSeqtools:
    def _set(self, *strs):
        return SeqSet(seqs=[np.frombuffer(s.encode(), np.uint8)
                            for s in strs],
                      descs=[f"s{i}" for i in range(len(strs))])

    def test_extract_match(self):
        out = seqtools.extractseq(self._set("acgt", "tttt"), match="s1")
        assert out.num_sequences == 1
        assert out.seqs[0].tobytes() == b"tttt"

    def test_sequniq(self):
        out, _ = seqtools.sequniq(self._set("acgt", "ACGT", "tttt"))
        assert out.num_sequences == 2

    def test_sequniq_rc(self):
        out, _ = seqtools.sequniq(self._set("acgt", "acgt"[::-1].translate(
            str.maketrans("acgt", "tgca"))), rev=True)
        assert out.num_sequences == 1

    def test_seqfilter(self):
        out, _, _ = seqtools.seqfilter(self._set("a" * 10, "a" * 50), minlength=20)
        assert out.num_sequences == 1

    def test_shredder_covers(self):
        src = self._set("acgt" * 200)
        out = seqtools.shredder(src, 50, 100, seed=1)
        assert out.total_length >= 700

    def test_simreads(self):
        src = self._set("acgt" * 100)
        out = seqtools.simreads(src, num=20, length=50, seed=2)
        assert out.num_sequences == 20
        assert all(len(s) == 50 for s in out.seqs)

    def test_fingerprint_stable(self):
        f1 = seqtools.fingerprints(self._set("acgt"))
        f2 = seqtools.fingerprints(self._set("ACGT"))
        assert f1 == f2  # case-insensitive like the reference

    def test_translate(self):
        assert seqtools.translate_dna("atggcttaa") == "MA*"
        frames = seqtools.translate_all_frames("atggct")
        assert len(frames) == 6 and frames[0] == "MA"

    def test_orfs(self):
        orfs = seqtools.find_orfs("ccatgaaatag", minlen=6)
        assert (2, 11, 2) in orfs

    def test_mutate_rate(self):
        src = self._set("a" * 10000)
        out = seqtools.mutate(src, 10.0, seed=3)
        diff = (out.seqs[0] != src.seqs[0]).mean()
        assert 0.04 < diff < 0.12  # ~7.5% effective (mutation can pick same)

    def test_splitfasta(self):
        parts = seqtools.splitfasta(self._set("aaaa", "cccc", "gggg",
                                              "tttt"), 2)
        assert len(parts) == 2
        assert sum(p.num_sequences for p in parts) == 4


class TestGenomediff:
    def test_identical_genomes_small_kr(self):
        from genometools_tpu.match.genomediff import genomediff
        rng = np.random.default_rng(5)
        s = "".join(rng.choice(list("acgt"), 600))
        g1 = Encseq.from_string(s)
        g2 = Encseq.from_string(s)
        m = "".join(rng.choice(list("acgt"), 600))
        g3 = Encseq.from_string(m)
        _, kr = genomediff([g1, g2, g3])
        assert kr[0, 1] < 0.1            # identical -> near zero
        assert kr[0, 2] > 3 * kr[0, 1]   # unrelated -> clearly larger

    @pytest.mark.parametrize("code", ["000050_001_0.1_002",
                                      "000100_001_0.1_002"])
    def test_kr_goldens(self, testdata, code):
        """ref: testdata/genomediff/*-kr.out (exact shulen sums +
        divergence solver to 1e-6)."""
        import glob
        from genometools_tpu.match.genomediff import genomediff
        td = testdata / "genomediff"
        files = sorted(glob.glob(str(td / f"{code}_S*.fas")))
        genomes = [Encseq.from_files([f]) for f in files]
        sums, kr = genomediff(genomes)
        lines = (td / f"{code}-kr.out").read_text().splitlines()
        n = int(lines[0])
        wsums = np.array([list(map(int, l.split()[1:]))
                          for l in lines[1:1 + n]])
        wkr = np.array([list(map(float, l.split()[1:]))
                        for l in lines[2 + n:2 + 2 * n]])
        assert (sums == wsums).all()
        assert np.allclose(kr, wkr, atol=5e-7)


class TestScoreMatrix:
    def test_blosum62(self, testdata):
        from genometools_tpu.match.alignment import ScoreMatrix, \
            global_alignment_scored
        sm = ScoreMatrix.parse((testdata / "BLOSUM62").read_text())
        assert sm.score("A", "A") == 4
        assert sm.score("W", "W") == 11
        assert sm.score("A", "W") == -3
        assert global_alignment_scored("ARN", "ARN", sm) == 4 + 5 + 6


class TestSpacedSeeds:
    def test_mask_extraction(self):
        from genometools_tpu.ops.kmer import spaced_kmer_codes_np
        codes = _codes("acgtacgt")
        # mask 0b1101: span 4, weight 3 -> positions 0,1,3
        out, valid = spaced_kmer_codes_np(codes, 0b1101)
        assert out.size == 5
        # window acgt -> a,c,t = 0*16 + 1*4 + 3 = 7
        assert out[0] == 7
        assert valid.all()

    def test_specials_invalidate_full_span(self):
        from genometools_tpu.ops.kmer import spaced_kmer_codes_np
        codes = _codes("acntacgt")
        out, valid = spaced_kmer_codes_np(codes, 0b1101)
        assert not valid[0]  # n inside span even at a don't-care position


class TestMEM:
    def test_duplicate_mem(self, testdata):
        from genometools_tpu.match.seed_extend import maximal_exact_matches
        e = Encseq.from_files([str(testdata / "Duplicate.fna")])
        mems = maximal_exact_matches(e, None, 14, 100, reverse=False)
        big = [m for m in mems if m.dblen >= 800]
        assert len(big) == 1
        m = big[0]
        assert (m.dbseqnum, m.queryseqnum) == (0, 1)
        assert m.distance == 0 and m.identity == 100.0
        # exactness
        a = e.codes[e.seq_startpos(0) + m.dbstart:
                    e.seq_startpos(0) + m.dbstart + m.dblen]
        b = e.codes[e.seq_startpos(1) + m.querystart:
                    e.seq_startpos(1) + m.querystart + m.querylen]
        assert (a == b).all()


class TestNewStreams:
    def test_chseqids_and_md5(self):
        from genometools_tpu.anno.gff3 import parse_gff3
        from genometools_tpu.anno.node_stream import (chseqids_stream,
                                                      id_to_md5_stream,
                                                      md5_to_id_stream,
                                                      mergefeat_stream)
        nodes = parse_gff3("##gff-version 3\n"
                           "c\t.\tgene\t1\t10\t.\t+\t.\tID=g\n")
        out = list(chseqids_stream(nodes, {"c": "chr1"}))
        from genometools_tpu.anno.genome_node import FeatureNode
        f = [n for n in out if isinstance(n, FeatureNode)][0]
        assert f.seqid == "chr1"
        nodes = parse_gff3("##gff-version 3\n"
                           "c\t.\tgene\t1\t4\t.\t+\t.\tID=g\n")
        seqs = {"c": "acgt"}
        out = list(id_to_md5_stream(iter(nodes), seqs))
        f = [n for n in out if isinstance(n, FeatureNode)][0]
        assert f.seqid.startswith("md5:")
        back = list(md5_to_id_stream(iter(out), seqs))
        f2 = [n for n in back if isinstance(n, FeatureNode)][0]
        assert f2.seqid == "c"

    def test_mergefeat(self):
        from genometools_tpu.anno.gff3 import parse_gff3
        from genometools_tpu.anno.node_stream import mergefeat_stream
        nodes = parse_gff3(
            "##gff-version 3\n"
            "c\t.\tgene\t1\t100\t.\t+\t.\tID=g\n"
            "c\t.\texon\t1\t10\t.\t+\t.\tParent=g\n"
            "c\t.\texon\t11\t30\t.\t+\t.\tParent=g\n")
        out = list(mergefeat_stream(nodes))
        from genometools_tpu.anno.genome_node import FeatureNode
        g = [n for n in out if isinstance(n, FeatureNode)][0]
        assert len(g.children) == 1
        assert (g.children[0].range.start, g.children[0].range.end) == (1, 30)


class TestTagerator:
    def test_exact_and_one_error(self):
        from genometools_tpu.match.querysearch import approximate_search
        db = _enc("acgtacgtaaacgg")
        esa = build_esa(db)
        # exact
        hits = approximate_search(esa, _codes("acgt"), 0)
        assert [(p, d) for p, _, d in hits] == [(0, 0), (4, 0)]
        # one substitution: "acct" matches acgt (d=1) at 0 and 4
        hits = approximate_search(esa, _codes("acct"), 1)
        starts = {p for p, _, d in hits}
        assert {0, 4} <= starts

    def test_matches_bruteforce(self):
        from genometools_tpu.match.alignment import edit_distance
        from genometools_tpu.match.querysearch import approximate_search
        rng = np.random.default_rng(6)
        s = "".join(rng.choice(list("acgt"), 150))
        db = _enc(s)
        esa = build_esa(db)
        pat = _codes(s[40:50])
        pat[3] = (pat[3] + 1) % 4
        hits = approximate_search(esa, pat, 1)
        starts = {p for p, _, d in hits}
        # brute force: positions where some substring within distance 1
        bf = set()
        for i in range(len(s)):
            for L in (len(pat) - 1, len(pat), len(pat) + 1):
                sub = db.codes[i:i + L]
                if len(sub) == L and edit_distance(sub, pat) <= 1:
                    bf.add(i)
        assert starts == bf


class TestLinspaceShow:
    def test_global_goldens(self, testdata):
        """gt dev linspace_align -ff ... -global -l 0 1 1 goldens (the
        reference diffs case-insensitively)."""
        from genometools_tpu.core.seqio import read_seqfile
        from genometools_tpu.match.align_show import linspace_align_files
        s1 = read_seqfile(str(testdata / "Ecoli-section1.fna"))
        s2 = read_seqfile(str(testdata / "Ecoli-section2.fna"))
        us = [x.tobytes().decode().lower() for x in s1.seqs]
        vs = [x.tobytes().decode().lower() for x in s2.seqs]
        g1 = linspace_align_files(us, vs, "global", (0, 1, 1))
        w1 = (testdata / "gt_linspace_align_global_test_1.out").read_text()
        assert g1.lower() == w1.lower()
        g2 = linspace_align_files(vs, us, "global", (0, 1, 1))
        w2 = (testdata / "gt_linspace_align_global_test_2.out").read_text()
        assert g2.lower() == w2.lower()


class TestSeqorder:
    """ref: testsuite/gt_seqorder_include.rb."""

    def _encseq(self, testdata):
        from genometools_tpu.core.encseq import Encseq
        from genometools_tpu.core.seqio import read_seqfile
        return Encseq.from_seqset(
            read_seqfile(str(testdata / "gt_seqorder_test.fas")))

    @pytest.mark.parametrize("mode,golden", [
        ("sort", "gt_seqorder_test_sort.fas"),
        ("revsort", "gt_seqorder_test_revsort.fas"),
        ("sorthdr", "gt_seqorder_test_sorthdr.fas"),
        ("sorthdrnum", "gt_seqorder_test.fas"),
    ])
    def test_goldens(self, testdata, mode, golden):
        from genometools_tpu.utils.seqorder import (render_fasta,
                                                    seqorder_permutation)
        e = self._encseq(testdata)
        got = render_fasta(e, seqorder_permutation(e, mode))
        assert got == (testdata / golden).read_text()

    def test_sortlength_descending(self, testdata):
        from genometools_tpu.utils.seqorder import seqorder_permutation
        e = self._encseq(testdata)
        lens = [int(e.seq_length(i))
                for i in seqorder_permutation(e, "sortlength")]
        assert lens == sorted(lens, reverse=True)

    def test_invert_roundtrip(self, testdata):
        from genometools_tpu.utils.seqorder import seqorder_permutation
        e = self._encseq(testdata)
        inv = seqorder_permutation(e, "invert")
        assert [inv[i] for i in inv[::-1]] == inv[::-1][::-1]
        assert inv == list(range(e.num_sequences))[::-1]


class TestRegioncov:
    """ref: testsuite/gt_regioncov_include.rb."""

    @pytest.mark.parametrize("dist,golden", [
        (0, "gt_regioncov_test_1.out"),
        (220000, "gt_regioncov_test_2.out"),
    ])
    def test_goldens(self, testdata, dist, golden):
        from genometools_tpu.anno.gff3 import parse_gff3
        from genometools_tpu.anno.regioncov import region_coverage
        nodes = parse_gff3(
            (testdata / "encode_known_genes_Mar07.gff3").read_text())
        got = region_coverage(nodes, dist)
        assert got == (testdata / golden).read_text()


class TestMatchtool:
    """ref: testsuite/gt_matchtool_include.rb."""

    @pytest.mark.parametrize("fn,outn,blast", [
        ("matchtool_open.match", "matchtool_open.out", False),
        ("matchtool_open.match.gz", "matchtool_open.out", False),
        ("matchtool_open.match.bz2", "matchtool_open.out", False),
        ("matchtool_open_empty.match", "matchtool_open_empty.out", False),
        ("matchtool_blast.match", "matchtool_blast.out", True),
        ("matchtool_blast.match.gz", "matchtool_blast.out", True),
        ("matchtool_blast_empty.match", "matchtool_blast_empty.out", True),
    ])
    def test_goldens(self, testdata, fn, outn, blast):
        from genometools_tpu.core.seqio import _read_bytes
        from genometools_tpu.match.matchtool import (parse_blast_matches,
                                                     parse_open_matches)
        f = parse_blast_matches if blast else parse_open_matches
        got = f(_read_bytes(str(testdata / fn)).decode("latin-1"))
        assert got == (testdata / outn).read_text()

    @pytest.mark.parametrize("fn,blast,msg", [
        ("matchtool_open_corrupt.match", False, "invalid format"),
        ("matchtool_open_neg.match", False, "non-negative"),
        ("matchtool_open_too_few.match", False, "invalid format"),
        ("matchtool_open_too_many.match", False, "invalid format"),
        ("matchtool_blast_corrupt.match", True, "invalid format"),
        ("matchtool_blast_neg.match", True, "non-negative"),
        ("matchtool_blast_too_few.match", True, "invalid format"),
        ("matchtool_blast_too_many.match", True, "invalid format"),
    ])
    def test_errors(self, testdata, fn, blast, msg):
        from genometools_tpu.core.seqio import _read_bytes
        from genometools_tpu.match.matchtool import (parse_blast_matches,
                                                     parse_open_matches)
        f = parse_blast_matches if blast else parse_open_matches
        with pytest.raises(ValueError, match=msg):
            f(_read_bytes(str(testdata / fn)).decode("latin-1"))
