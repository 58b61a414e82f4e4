"""Readjoiner tests vs reference golden .spm / contig files."""

import numpy as np
import pytest

from genometools_tpu.assembly.readjoiner import (ReadSet, SpmList, StringGraph,
                                                 assemble, find_contained,
                                                 find_spms)


class TestSpm:
    def test_tiny_singlestrand(self, testdata):
        rs = ReadSet.from_files([str(testdata / "readjoiner" / "tiny.fas")])
        got = find_spms(rs, 3, singlestrand=True).lines()
        want = [l.strip() for l in open(
            str(testdata / "readjoiner" / "tiny_singlestrand.spm"))]
        assert sorted(got) == sorted(want)

    def test_tiny_mirrored(self, testdata):
        rs = ReadSet.from_files([str(testdata / "readjoiner" / "tiny.fas")])
        got = find_spms(rs, 3).lines()
        want = [l.strip() for l in open(
            str(testdata / "readjoiner" / "tiny_mirrored.spm"))]
        assert sorted(got) == sorted(want)

    def test_pw_exact(self, testdata):
        """`gt readjoiner spmtest -test bruteforce -l 3` golden."""
        rs = ReadSet.from_files([str(testdata / "readjoiner" / "pw.fas")])
        got = sorted(find_spms(rs, 3).lines())
        want = sorted(l.strip() for l in open(
            str(testdata / "readjoiner" / "pw-ex.spm")))
        assert got == want

    def test_spm_definition(self):
        """Every reported SPM is a true suffix-prefix match."""
        rs = ReadSet.from_seqset(_mkseqs(["acgtacg", "tacgttt", "gtttaca"]))
        spms = find_spms(rs, 3)
        for sr, ss, pr, ps, l in zip(spms.suf_read, spms.suf_strand,
                                     spms.pref_read, spms.pref_strand,
                                     spms.length):
            a = rs.reads[sr] if ss else rs.rc(sr)
            b = rs.reads[pr] if ps else rs.rc(pr)
            assert (a[len(a) - l:] == b[:l]).all()


def _mkseqs(strs):
    from genometools_tpu.core.seqio import SeqSet
    return SeqSet(seqs=[np.frombuffer(s.encode(), np.uint8) for s in strs],
                  descs=[""] * len(strs))


class TestContained:
    def test_duplicate_and_substring(self):
        rs = ReadSet.from_seqset(_mkseqs(
            ["acgtacgtac", "acgtacgtac", "gtacgt", "ttttcccc"]))
        c = find_contained(rs)
        assert c.tolist() == [False, True, True, False]

    def test_rc_contained(self):
        # read1 is rc of a substring of read0
        rs = ReadSet.from_seqset(_mkseqs(["acgtaccggtaa", "ggtacg"]))
        # rc(read1) = cgtacc, substring of read0
        c = find_contained(rs)
        assert c.tolist() == [False, True]

    def test_reference_contained_file(self, testdata):
        rs = ReadSet.from_files(
            [str(testdata / "readjoiner" / "contained_eqlen.fas")])
        c = find_contained(rs)
        # at least the duplicates collapse; kept set must be unique
        kept = [rs.reads[i].tobytes() for i in range(rs.num_reads) if not c[i]]
        assert len(set(kept)) == len(kept)


class TestAssembly:
    def test_3_varlen_contig_golden(self, testdata):
        got = assemble([str(testdata / "readjoiner" / "3_varlen_seq.fas")],
                       minlen=5, min_depth=2, min_length=31)
        want = open(str(testdata / "readjoiner" /
                        "3_varlen_seq.contigs.fas")).read().splitlines()
        got_lines = []
        for h, s in got:
            got_lines.append(">" + h)
            got_lines.append(s)
        assert got_lines == want

    def test_transitive_reduction(self):
        # overlapping tiling of one source string: r0 -> r1 -> r2 with the
        # direct r0 -> r2 edge transitive (l_ac = l_ab + l_bc - len(r1))
        src = "acctagcgttaagc"
        rs = ReadSet.from_seqset(_mkseqs([src[0:10], src[2:12], src[4:14]]))
        spms = find_spms(rs, 4, irreducible=False)
        g = StringGraph.from_spms(rs, spms)
        g.reduce_self()
        removed = g.reduce_transitive()
        assert removed >= 1
        contigs = g.spell_contigs(min_depth=3)
        assert len(contigs) == 1
        seq, depth, desc = contigs[0]
        assert depth == 3
        assert seq == src


class TestGraphFormats:
    def test_gfa_and_asqg(self, testdata):
        from genometools_tpu.assembly.readjoiner import (find_spms, write_asqg,
                                                         write_gfa)
        rs = ReadSet.from_files([str(testdata / "readjoiner" / "pw.fas")])
        spms = find_spms(rs, 3)
        gfa1 = write_gfa(rs, spms, 1)
        assert gfa1.startswith("H\tVN:Z:1.0")
        assert gfa1.count("\nS\t") == 5
        assert gfa1.count("\nL\t") == spms.length.size
        gfa2 = write_gfa(rs, spms, 2)
        assert "VN:Z:2.0" in gfa2
        asqg = write_asqg(rs, spms)
        assert asqg.count("VT\t") == 5
        assert asqg.count("ED\t") == spms.length.size


class TestErrorCorrection:
    def test_planted_errors_fixed(self):
        from genometools_tpu.assembly.readjoiner import correct_reads
        rng = np.random.default_rng(4)
        genome = rng.integers(0, 4, 600).astype(np.uint8)
        reads = []
        for _ in range(60):
            s = int(rng.integers(0, 500))
            reads.append(genome[s:s + 100].copy())
        # plant one error in three reads
        for i in (3, 17, 40):
            p = 50
            reads[i][p] = (reads[i][p] + 1) % 4
        rs = ReadSet(list(reads))
        fixed, ncorr = correct_reads(rs, k=15, min_count=3)
        assert ncorr >= 2
        # corrected reads must match the genome again
        ok = 0
        for i in (3, 17, 40):
            s = None
            # find original source offset by first 20 error-free bases
            for cand in range(0, 501):
                if (genome[cand:cand + 30] == fixed.reads[i][:30]).all():
                    s = cand
                    break
            if s is not None and \
                    (genome[s:s + 100] == fixed.reads[i]).all():
                ok += 1
        assert ok >= 2


class TestContfinderSortDesign:
    """The SA-IS/run-scan contfinder (ref: rdj-contfinder.c:928 radix
    design): brute-force cross-check incl. rc-duplicates + a scaling
    smoke test far beyond what the pairwise scan could handle."""

    def _brute(self, reads):
        n = len(reads)
        out = np.zeros(n, bool)

        def occurs(a, b):
            m = len(a)
            return any((b[s:s + m] == a).all()
                       for s in range(len(b) - m + 1))

        for r in range(n):
            for o in range(n):
                if o == r:
                    continue
                ro = reads[o]
                rc = (3 - ro[::-1]).astype(np.uint8)
                if len(ro) > len(reads[r]):
                    if occurs(reads[r], ro) or occurs(reads[r], rc):
                        out[r] = True
                        break
                elif len(ro) == len(reads[r]) and o < r:
                    if (ro == reads[r]).all() or (rc == reads[r]).all():
                        out[r] = True
                        break
        return out

    def test_varlen_vs_bruteforce(self):
        for seed in range(3):
            rng = np.random.default_rng(seed)
            reads = [rng.integers(0, 4, rng.integers(5, 30)).astype(np.uint8)
                     for _ in range(50)]
            reads[3] = reads[10][2:2 + min(8, len(reads[10]) - 2)].copy()
            reads[7] = reads[20].copy()
            reads[9] = (3 - reads[21][::-1]).astype(np.uint8)
            rs = ReadSet(reads)
            got = find_contained(rs)
            assert (got == self._brute(rs.reads)).all()

    def test_eqlen_20k_reads_scale(self):
        rng = np.random.default_rng(1)
        genome = rng.integers(0, 4, 50_000).astype(np.uint8)
        reads = []
        for _ in range(20_000):
            p = rng.integers(0, 50_000 - 80)
            r = genome[p:p + 80]
            if rng.random() < 0.5:
                r = (3 - r[::-1]).astype(np.uint8)
            reads.append(r)
        rs = ReadSet(reads)
        c = find_contained(rs)
        # duplicates exist with 20k reads over 50kb; smallest index of
        # each duplicate group must survive
        assert c.sum() > 0
        first = {}
        keep = np.zeros(len(reads), bool)
        for i, r in enumerate(rs.reads):
            kf = r.tobytes()
            kr = (3 - r[::-1]).astype(np.uint8).tobytes()
            k = min(kf, kr)
            if k not in first:
                first[k] = i
                keep[i] = True
        # every kept-first read is not contained (eqlen => dup rule only)
        assert not c[keep].any()


class TestSpmBinaryFormat:
    def test_bin_roundtrip_both_widths(self):
        rng = np.random.default_rng(3)
        reads = [rng.integers(0, 4, 40).astype(np.uint8)
                 for _ in range(12)]
        spm = find_spms(ReadSet(reads), 4)
        import tempfile
        for bits in (32, 64):
            with tempfile.NamedTemporaryFile(suffix=".spm") as f:
                spm.write_bin(f.name, bits=bits)
                # header byte per rdj-spmlist.h: BIN32=2, BIN64=3
                assert open(f.name, "rb").read(1)[0] == \
                    (2 if bits == 32 else 3)
                back = SpmList.read(f.name)
                assert back.lines() == spm.lines()
                filt = SpmList.read(f.name, min_length=6)
                assert all(l >= 6 for l in filt.length)

    def test_text_reader(self, tmp_path):
        reads = [np.array([0, 1, 2, 3, 0, 1, 2], np.uint8),
                 np.array([3, 0, 1, 2, 0, 0, 1], np.uint8)]
        spm = find_spms(ReadSet(reads), 3)
        p = tmp_path / "x.spm"
        p.write_text("\n".join(spm.lines()) + "\n")
        assert SpmList.read(str(p)).lines() == spm.lines()


class TestQualityFilter:
    def test_maxlow_rejects_lowq_reads(self, tmp_path):
        fq = tmp_path / "r.fastq"
        # read 1: all high quality; read 2: 5 low positions
        fq.write_text("@r1\nacgtacgtac\n+\nIIIIIIIIII\n"
                      "@r2\nacgtacgtac\n+\n!!!!!IIIII\n")
        rs = ReadSet.from_files([str(fq)], maxlow=2, lowqual=0)
        assert rs.num_reads == 1
        rs2 = ReadSet.from_files([str(fq)], maxlow=5, lowqual=0)
        assert rs2.num_reads == 2
        rs3 = ReadSet.from_files([str(fq)])       # no filter
        assert rs3.num_reads == 2


class TestContigsGraph:
    def test_junction_merge(self):
        from genometools_tpu.assembly.readjoiner import ContigsGraph
        rng = np.random.default_rng(11)
        genome = rng.integers(0, 4, 400).astype(np.uint8)
        # overlapping reads tiling the genome
        reads = [genome[i:i + 50] for i in range(0, 350, 10)]
        rs = ReadSet(reads)
        spm = find_spms(rs, 30, singlestrand=True)
        cg = ContigsGraph.from_assembly(rs, spm)
        cg.simplify()
        dot = cg.show_dot()
        assert dot.startswith("digraph ContigsGraph {")
        live = [i for i in range(len(cg.seqs)) if i not in cg.deleted]
        assert live, "no contigs"
        paths = cg.output_paths()
        assert all(p.startswith("contig_") for p in paths)


class TestStringGraphReductionParity:
    """Reduction parity vs the compiled reference on engineered input
    (tests/golden_readjoiner_red: two haplotypes of a 1200bp genome ->
    a p-bubble at the SNP; a truncated chimeric branch -> a dead-end
    path; goldens from `gt readjoiner prefilter/overlap/assembly
    -errors -v`, ref: rdj-strgraph.c:1131/:1230)."""

    GOLD = "tests/golden_readjoiner_red"

    def _pipeline(self):
        from genometools_tpu.assembly.readjoiner import (ReadSet,
                                                         SpmList,
                                                         StringGraph,
                                                         find_contained,
                                                         find_spms)
        rs = ReadSet.from_files([f"{self.GOLD}/reads.fna"])
        contained = find_contained(rs)
        keep = [i for i in range(rs.num_reads) if not contained[i]]
        import numpy as np
        rs2 = ReadSet(reads=[rs.reads[i] for i in keep])
        spms = find_spms(rs2, 45)
        return rs2, StringGraph.from_spms(rs2, spms)

    def test_bubble_counts_match_reference(self):
        # bubble phase in isolation (golden: assembly -errors -deadend 0)
        import re
        rs2, g = self._pipeline()
        assert rs2.num_reads == 63          # reference filtered readset
        bub = 0
        for _ in range(3):
            r = g.reduce_bubbles()
            bub += r
            if r == 0:
                break
        log = open(f"{self.GOLD}/bubble_only.log").read()
        ref_bub = int(re.search(r"p-bubble edges \[\d+ rounds\] = (\d+)",
                                log).group(1))
        assert bub == ref_bub, (bub, ref_bub)

    def test_deadend_counts_match_reference(self):
        # dead-end phase in isolation (golden: assembly -errors -bubble 0)
        import re
        rs2, g = self._pipeline()
        dead = 0
        for _ in range(10):
            r = g.reduce_dead_paths(10)
            dead += r
            if r == 0:
                break
        log = open(f"{self.GOLD}/deadend_only.log").read()
        ref_dead = int(re.search(
            r"dead-end path edges \[\d+ rounds\] = (\d+)", log).group(1))
        assert dead == ref_dead, (dead, ref_dead)

    def test_contigs_consistent_with_reference(self):
        # Full -errors pipeline. WHICH bubble arm dies is a qsort tie
        # among equal-(dest,width) paths in the reference (comparator
        # returns 0), so the reduced graphs legitimately differ beyond
        # the per-phase counts (goldens above pin those in isolation).
        # Structural consistency check instead: every reference contig
        # must be spelled by our contigs up to the single SNP column.
        rs2, g = self._pipeline()
        bub, dead = g.error_correction()
        assert bub == 12 and dead >= 4
        ours = [seq for seq, depth, desc
                in g.spell_contigs(min_length=100)]
        ours += [_rc_str(s) for s in list(ours)]
        ref = []
        cur = []
        for line in open(f"{self.GOLD}/rs.contigs.fas"):
            if line.startswith(">"):
                if cur:
                    ref.append("".join(cur))
                cur = []
            else:
                cur.append(line.strip())
        if cur:
            ref.append("".join(cur))
        assert ref and ours
        for rc_ in ref:
            found = False
            for oc in ours:
                # anchor on a 40bp exact block, then compare the rest
                # allowing <= 1 mismatch (the SNP)
                a = oc.find(rc_[:40])
                if a < 0:
                    a = oc.find(rc_[-40:])
                    if a < 0:
                        continue
                    a = a - (len(rc_) - 40)
                if a < 0 or a + len(rc_) > len(oc):
                    continue
                diff = sum(1 for x, y in zip(oc[a:a + len(rc_)], rc_)
                           if x != y)
                if diff <= 1:
                    found = True
                    break
            assert found, "reference contig not spelled by our graph"


def _rc_str(s):
    comp = {"a": "t", "c": "g", "g": "c", "t": "a"}
    return "".join(comp[c] for c in reversed(s))
