"""FM-index + LTRharvest tests."""

import numpy as np
import pytest

from genometools_tpu.core.alphabet import dna_alphabet
from genometools_tpu.core.encseq import Encseq
from genometools_tpu.index.esa import build_esa
from genometools_tpu.index.fmindex import FMIndex, build_fmindex
from genometools_tpu.ltr.ltrharvest import (LTRHarvestParams, LTRPrediction,
                                            ltrharvest)


def _codes(s):
    return dna_alphabet().encode(s.encode())


class TestFMIndex:
    def _random_enc(self, n=800, seed=0):
        rng = np.random.default_rng(seed)
        s = "".join(rng.choice(list("acgt"), n))
        return Encseq.from_string(s), s

    def test_count_matches_naive(self):
        enc, s = self._random_enc()
        fm = build_fmindex(enc)
        rng = np.random.default_rng(1)
        for _ in range(30):
            plen = int(rng.integers(1, 12))
            start = int(rng.integers(0, len(s) - plen))
            pat = s[start:start + plen]
            naive = sum(1 for i in range(len(s) - plen + 1)
                        if s[i:i + plen] == pat)
            assert fm.count(_codes(pat)) == naive

    def test_locate_matches_naive(self):
        enc, s = self._random_enc(400, 2)
        esa = build_esa(enc, with_lcp=False)
        fm = FMIndex.from_esa(esa)
        rng = np.random.default_rng(3)
        for _ in range(15):
            plen = int(rng.integers(2, 10))
            start = int(rng.integers(0, len(s) - plen))
            pat = s[start:start + plen]
            naive = [i for i in range(len(s) - plen + 1)
                     if s[i:i + plen] == pat]
            got = fm.locate(_codes(pat), esa_sa=esa.suftab).tolist()
            assert got == naive

    def test_multiseq_with_separators(self):
        enc = Encseq.from_string("acgtacgt|tacgta")
        esa = build_esa(enc, with_lcp=False)
        fm = FMIndex.from_esa(esa)
        assert fm.count(_codes("acgt")) == 3
        assert fm.count(_codes("acgta")) == 2  # pos 4 hits separator

    def test_save_load(self, tmp_path):
        enc, s = self._random_enc(200, 4)
        fm = build_fmindex(enc)
        fm.save(str(tmp_path / "idx"))
        fm2 = FMIndex.load(str(tmp_path / "idx"))
        assert fm2.count(_codes(s[10:20])) == fm.count(_codes(s[10:20]))


class TestLTRharvest:
    def _make_genome(self, seed=0):
        """Plant an LTR element: LTR .. internal .. LTR with TSD."""
        rng = np.random.default_rng(seed)

        def rand(n):
            return "".join(rng.choice(list("acgt"), n))

        ltr = rand(250)
        internal = rand(1200)
        tsd = "gatca"
        genome = rand(500) + tsd + ltr + internal + ltr + tsd + rand(500)
        return genome, 500 + len(tsd), ltr, internal, tsd

    def test_finds_planted_element(self):
        genome, ltr_start, ltr, internal, tsd = self._make_genome()
        enc = Encseq.from_string(genome)
        params = LTRHarvestParams(seedlength=30, minlenltr=100,
                                  maxlenltr=1000, mindistltr=1000,
                                  maxdistltr=15000, with_tsd=True)
        preds = ltrharvest(enc, params)
        assert len(preds) == 1
        p = preds[0]
        assert abs(p.start1 - ltr_start) <= 3
        assert abs((p.end1 - p.start1 + 1) - len(ltr)) <= 6
        assert p.similarity >= 99.0
        assert p.tsd_length >= 4

    def test_no_element_in_random(self):
        rng = np.random.default_rng(9)
        genome = "".join(rng.choice(list("acgt"), 4000))
        enc = Encseq.from_string(genome)
        assert ltrharvest(enc) == []

    def test_distance_filter(self):
        # two close copies (distance < mindistltr) must not be predicted
        rng = np.random.default_rng(10)
        ltr = "".join(rng.choice(list("acgt"), 200))
        genome = ltr + "".join(rng.choice(list("acgt"), 300)) + ltr
        enc = Encseq.from_string(genome)
        assert ltrharvest(enc) == []

    def test_gff3_output(self):
        genome, *_ = self._make_genome(1)
        enc = Encseq.from_string(genome)
        preds = ltrharvest(enc, LTRHarvestParams(with_tsd=True))
        from genometools_tpu.ltr.ltrharvest import gff3_nodes
        from genometools_tpu.anno.gff3 import gff3_to_string
        nodes = gff3_nodes(preds, enc)
        text = gff3_to_string(nodes)
        assert "repeat_region" in text
        assert "LTR_retrotransposon" in text
        assert text.count("long_terminal_repeat") == 2 * len(preds)


class TestLtrClustering:
    def _setup(self, tmp_path):
        import numpy as np
        from genometools_tpu.core.encseq import Encseq
        rng = np.random.default_rng(13)
        ltr_a = "".join(rng.choice(list("acgt"), 80))
        ltr_b = "".join(rng.choice(list("acgt"), 80))
        mid = lambda: "".join(rng.choice(list("acgt"), 200))
        # two elements sharing LTR family A, one with family B
        seq = (mid() + ltr_a + mid() + ltr_a + mid()
               + ltr_a + mid() + ltr_a + mid()
               + ltr_b + mid() + ltr_b + mid())
        e = Encseq.from_string(seq)
        # feature trees around the planted LTR coordinates (1-based)
        from genometools_tpu.anno.genome_node import FeatureNode
        nodes = []
        offs = []
        pos = 200
        for _ in range(3):
            offs.append((pos + 1, pos + 80, pos + 281, pos + 360))
            pos += 560
        for a1, a2, b1, b2 in offs:
            el = FeatureNode("seq0", "LTR_retrotransposon", a1, b2, "+")
            l1 = FeatureNode("seq0", "long_terminal_repeat", a1, a2, "+")
            l2 = FeatureNode("seq0", "long_terminal_repeat", b1, b2, "+")
            el.add_child(l1)
            el.add_child(l2)
            nodes.append(el)
        return e, nodes

    def test_clusters_and_families(self, tmp_path):
        from genometools_tpu.ltr.ltrclustering import ltrclustering
        e, nodes = self._setup(tmp_path)
        ltrclustering(e, nodes, psmall=80, plarge=30)
        clids = []
        for el in nodes:
            ltrs = [c for c in el.traverse()
                    if c.type == "long_terminal_repeat"]
            assert all("clid" in l.attributes for l in ltrs)
            clids.append(ltrs[0].attributes["clid"])
        # elements 0 and 1 share the same LTR sequence -> same cluster;
        # element 2 uses a different LTR -> different cluster
        assert clids[0] == clids[1]
        assert clids[2] != clids[0]
        fams = [el.attributes.get("ltrfam") for el in nodes]
        assert fams[0] == fams[1] and fams[2] != fams[0]


class TestLTRHarvestOutputStreams:
    def _mk(self, tmp_path):
        import numpy as np

        from genometools_tpu.core.encseq import Encseq
        rng = np.random.default_rng(4)
        ltr = "".join(rng.choice(list("acgt"), 150))
        mid = "".join(rng.choice(list("acgt"), 1200))
        flank = "".join(rng.choice(list("acgt"), 300))
        tsd = "acgta"
        seq = flank + tsd + ltr + mid + ltr + tsd + flank
        return Encseq.from_string(seq)

    def test_fasta_out_and_tabout(self, tmp_path):
        from genometools_tpu.ltr.ltrharvest import (LTRHarvestParams,
                                                    fasta_out_entries,
                                                    ltrharvest,
                                                    tabout_lines)
        enc = self._mk(tmp_path)
        preds = ltrharvest(enc, LTRHarvestParams(
            seedlength=30, minlenltr=100, maxlenltr=400,
            mindistltr=500, maxdistltr=3000, mintsd=4, with_tsd=True))
        assert preds, "expected one prediction"
        fa = fasta_out_entries(preds, enc, inner=False)
        assert fa[0].startswith(">") and "(dbseq-nr 0) [" in fa[0]
        body = "".join(x for x in fa[1:] if not x.startswith(">"))
        p = preds[0]
        assert len(body) == p.end2 - p.start1 + 1
        inner = fasta_out_entries(preds, enc, inner=True)
        ibody = "".join(x for x in inner[1:] if not x.startswith(">"))
        assert len(ibody) == p.start2 - p.end1 - 1
        lines = tabout_lines(preds, enc, longoutput=True)
        assert lines and str(p.seqnum) == lines[0].split()[-1]
        if p.tsd_length:
            assert str(p.tsd_length) in lines[0].split()

    def test_cli_out_files(self, tmp_path, capsys):
        import numpy as np

        from genometools_tpu.cli import main as gt_main
        from genometools_tpu.core.esq import write_all
        enc = self._mk(tmp_path)
        write_all(enc, str(tmp_path / "idx"))
        rc = gt_main(["ltrharvest", "-index", str(tmp_path / "idx"),
                      "-seed", "30", "-minlenltr", "100", "-maxlenltr",
                      "400", "-mindistltr", "500", "-maxdistltr",
                      "3000", "-out", str(tmp_path / "o.fas"),
                      "-outinner", str(tmp_path / "i.fas"),
                      "-gff3", str(tmp_path / "g.gff3"), "--cpu"])
        assert rc == 0
        assert (tmp_path / "o.fas").read_text().startswith(">")
        assert (tmp_path / "i.fas").read_text().startswith(">")
        assert "##gff-version" in (tmp_path / "g.gff3").read_text()
