"""LTRdigest PPT/PBS annotation (ref: ltrdigest_ppt_visitor.c,
ltrdigest_pbs_visitor.c; synthetic validation — the reference goldens
live in the external gttestdata collection)."""

import random

import pytest

from genometools_tpu.anno.genome_node import FeatureNode, Range
from genometools_tpu.ltr.ltrdigest import (LTRdigestParams, ltrdigest,
                                           pbs_find, ppt_find)
from genometools_tpu.utils.seqtools import revcomp_str


def _rnd(rng, n):
    return "".join(rng.choice("acgt") for _ in range(n))


class TestPPT:
    def test_forward_ppt(self):
        rng = random.Random(7)
        left, right = _rnd(rng, 100), _rnd(rng, 100)
        internal = _rnd(rng, 285) + "gaaaggaggggaaag"
        elem = left + internal + right
        hits = ppt_find(elem, Range(1001, 1100), Range(1401, 1500), 1001)
        assert hits
        best = hits[0]
        assert best.strand == "+"
        # PPT ends just before the 3' LTR start
        assert 1395 <= best.rng.end <= 1400
        assert 8 <= best.rng.length <= 30

    def test_reverse_ppt(self):
        rng = random.Random(9)
        # purine tract on the minus strand = pyrimidines just after the
        # left LTR on the plus strand
        left, right = _rnd(rng, 100), _rnd(rng, 100)
        internal = "ctttcctcccttttc" + _rnd(rng, 285)
        elem = left + internal + right
        hits = ppt_find(elem, Range(1001, 1100), Range(1401, 1500), 1001)
        assert hits and hits[0].strand == "-"
        # hit covers the planted pyrimidine tract (the HMM may extend
        # over adjacent chance pyrimidines)
        assert hits[0].rng.start <= 1101 and hits[0].rng.end >= 1110

    def test_no_ppt_in_random(self):
        rng = random.Random(11)
        elem = _rnd(rng, 500)
        hits = ppt_find(elem, Range(1, 100), Range(401, 500), 1)
        # random sequence rarely yields long purine stretches
        assert all(h.rng.length <= 30 for h in hits)


class TestPBS:
    def test_forward_pbs(self):
        rng = random.Random(5)
        left, right = _rnd(rng, 100), _rnd(rng, 100)
        trna = _rnd(rng, 60)
        pbs_region = revcomp_str(trna)[:14]
        internal = pbs_region + _rnd(rng, 286)
        elem = left + internal + right
        hits = pbs_find(elem, Range(1, 100), Range(401, 500), 1001,
                        [("tRNA-Phe", trna)])
        assert hits
        b = hits[0]
        assert b.strand == "+" and b.trna == "tRNA-Phe"
        assert b.edist <= 1
        assert b.rng.start == 1101

    def test_edist_filter(self):
        rng = random.Random(5)
        left, right = _rnd(rng, 100), _rnd(rng, 100)
        trna = _rnd(rng, 60)
        region = list(revcomp_str(trna)[:14])
        # two mismatches exceed pbsmaxedist=1
        region[3] = "a" if region[3] != "a" else "c"
        region[7] = "a" if region[7] != "a" else "c"
        elem = left + "".join(region) + _rnd(rng, 286) + right
        hits = pbs_find(elem, Range(1, 100), Range(401, 500), 1001,
                        [("tRNA-Phe", trna)])
        assert not hits


class TestLTRdigestStream:
    def test_annotates_element(self):
        rng = random.Random(3)
        left, right = _rnd(rng, 100), _rnd(rng, 100)
        internal = _rnd(rng, 285) + "gaaaggaggggaaag"
        seq = _rnd(rng, 50) + left + internal + right + _rnd(rng, 50)

        class Mapping:
            def get_sequence(self, seqid, start, end):
                return seq[start - 1:end]

        elem = FeatureNode("chr", "repeat_region", 51, 550, "?", "test")
        ltr = FeatureNode("chr", "LTR_retrotransposon", 51, 550, "?",
                          "test")
        elem.add_child(ltr)
        ltr.add_child(FeatureNode("chr", "long_terminal_repeat", 51,
                                  150, "?", "test"))
        ltr.add_child(FeatureNode("chr", "long_terminal_repeat", 451,
                                  550, "?", "test"))
        ltrdigest([elem], Mapping())
        types = [c.type for c in ltr.children]
        assert "RR_tract" in types
        # canonical strand propagated
        assert ltr.strand == "+"


class TestLTRdigestCLI:
    def test_cli(self, tmp_path, capsys):
        import random

        from genometools_tpu.cli import main
        from genometools_tpu.utils.seqtools import revcomp_str
        rng = random.Random(3)
        left, right = _rnd(rng, 100), _rnd(rng, 100)
        trna = _rnd(rng, 60)
        internal = (revcomp_str(trna)[:14] + _rnd(rng, 271) +
                    "gaaaggaggggaaag")
        seq = _rnd(rng, 50) + left + internal + right + _rnd(rng, 50)
        (tmp_path / "s.fas").write_text(">chr test\n" + seq + "\n")
        (tmp_path / "t.fas").write_text(">tRNA-Phe\n" + trna + "\n")
        (tmp_path / "in.gff3").write_text(
            "##gff-version 3\n"
            "##sequence-region chr 1 600\n"
            "chr\tltrh\trepeat_region\t51\t550\t.\t?\t.\tID=rr1\n"
            "chr\tltrh\tLTR_retrotransposon\t51\t550\t.\t?\t.\t"
            "ID=ltr1;Parent=rr1\n"
            "chr\tltrh\tlong_terminal_repeat\t51\t150\t.\t?\t.\t"
            "Parent=ltr1\n"
            "chr\tltrh\tlong_terminal_repeat\t451\t550\t.\t?\t.\t"
            "Parent=ltr1\n")
        rc = main(["ltrdigest", str(tmp_path / "in.gff3"),
                   "-seqfile", str(tmp_path / "s.fas"), "-matchdesc",
                   "-trnas", str(tmp_path / "t.fas")])
        out = capsys.readouterr().out
        assert rc == 0
        assert "primer_binding_site\t151\t" in out
        assert "trna=tRNA-Phe" in out and "edist=0" in out
        assert "RR_tract" in out
        # strand propagated onto the element and its LTRs
        assert ("LTR_retrotransposon\t51\t550\t.\t+" in out)


class TestLTRdigestFileOut:
    def test_file_family(self, tmp_path):
        import random

        from genometools_tpu.anno.genome_node import FeatureNode
        from genometools_tpu.ltr.ltrdigest import (ltrdigest,
                                                   ltrdigest_file_out)
        rng = random.Random(7)
        left, right = _rnd(rng, 100), _rnd(rng, 100)
        internal = _rnd(rng, 285) + "gaaaggaggggaaag"
        seq = _rnd(rng, 1000) + left + internal + right + _rnd(rng, 200)

        class Mapping:
            def get_sequence(self, seqid, start, end):
                return seq[start - 1:end]

        region = FeatureNode("chr1", "repeat_region", 997, 1504, "?",
                             "LTRharvest")
        elem = FeatureNode("chr1", "LTR_retrotransposon", 1001, 1500,
                           "?", "LTRharvest")
        region.add_child(elem)
        for s, e in ((1001, 1100), (1401, 1500)):
            elem.add_child(FeatureNode("chr1", "long_terminal_repeat",
                                       s, e, "?", "LTRharvest"))
        nodes = ltrdigest([region], Mapping())
        pre = str(tmp_path / "dig")
        ltrdigest_file_out(nodes, Mapping(), pre)
        tab = (tmp_path / "dig_tabout.csv").read_text().splitlines()
        assert tab[0].startswith("element start\telement end")
        assert len(tab) == 2
        cols = tab[1].split("\t")
        assert cols[0] == "1001" and cols[1] == "1500"
        assert cols[3] == "chr1"
        assert (tmp_path / "dig_5ltr.fas").read_text().startswith(">")
        assert (tmp_path / "dig_complete.fas").read_text().count(">") == 1
        # the planted forward PPT must appear in the PPT columns + fasta
        assert cols[16] and cols[19] == "+"
        assert (tmp_path / "dig_ppt.fas").read_text().startswith(">")
