"""gt snpper: SNP effect annotation
(ref: src/extended/snp_annotator_visitor.c, snp_annotator_stream.c)."""

import subprocess
import sys

import pytest

from genometools_tpu.anno.cds import RegionMapping
from genometools_tpu.anno.gff3 import parse_gff3
from genometools_tpu.anno.node_stream import sort_stream
from genometools_tpu.anno.snpper import snp_annotator_stream
from genometools_tpu.core.trans_table import TransTable, \
    scheme_descriptions

#            123456789-123456789-123456789-
GENOME = "ATGGCTTGTACTACATCATAAAAAAAAAAA"
# fwd gene 1..9:  ATG GCT TGT  (M A C)
# rev gene 11..19: genome CTACATCAT -> mRNA revcomp = ATGATGTAG (M M *)

GFF = """##gff-version 3
chr1\t.\tgene\t1\t9\t.\t+\t.\tID=gene1
chr1\t.\tmRNA\t1\t9\t.\t+\t.\tID=mRNA1;Parent=gene1
chr1\t.\tCDS\t1\t9\t.\t+\t0\tID=CDS1;Parent=mRNA1
chr1\t.\tgene\t11\t19\t.\t-\t.\tID=gene2
chr1\t.\tmRNA\t11\t19\t.\t-\t.\tID=mRNA2;Parent=gene2
chr1\t.\tCDS\t11\t19\t.\t-\t0\tID=CDS2;Parent=mRNA2
"""

GVF = """##gff-version 3
chr1\t.\tSNV\t4\t4\t.\t+\t.\tID=snp1;Reference_seq=G;Variant_seq=A
chr1\t.\tSNV\t9\t9\t.\t+\t.\tID=snp2;Reference_seq=T;Variant_seq=C,A
chr1\t.\tSNV\t13\t13\t.\t+\t.\tID=snp3;Reference_seq=A;Variant_seq=G
chr1\t.\tSNV\t25\t25\t.\t+\t.\tID=snp4;Reference_seq=A;Variant_seq=C
"""


def _run():
    rmap = RegionMapping(["chr1"], [GENOME])
    gff = list(sort_stream(parse_gff3(GFF)))
    gvf = list(sort_stream(parse_gff3(GVF)))
    out = [n for n in snp_annotator_stream(gvf, gff, rmap)
           if getattr(n, "type", None) == "SNV"]
    return {n.get_attribute("ID"): n.get_attribute("Variant_effect")
            for n in out}


class TestSnpAnnotator:
    def test_effects(self):
        eff = _run()
        # GCT->ACT: Ala->Thr
        assert eff["snp1"] == \
            "non_conservative_missense_variant 0 mRNA mRNA1"
        # TGT->TGC: Cys->Cys; TGT->TGA: stop gained
        assert eff["snp2"] == ("synonymous_variant 0 mRNA mRNA1,"
                               "stop_gained 1 mRNA mRNA1")
        # reverse strand: TAG stop -> CAG
        assert eff["snp3"] == "stop_lost 0 mRNA mRNA2"
        # outside any gene: passes through unannotated
        assert eff["snp4"] is None

    def test_variant_matching_reference_is_skipped(self):
        rmap = RegionMapping(["chr1"], [GENOME])
        gff = list(sort_stream(parse_gff3(GFF)))
        gvf_text = GVF.replace("Variant_seq=A\n", "Variant_seq=G\n", 1)
        gvf = list(sort_stream(parse_gff3(gvf_text)))
        out = [n for n in snp_annotator_stream(gvf, gff, rmap)
               if getattr(n, "type", None) == "SNV"]
        snp1 = next(n for n in out if n.get_attribute("ID") == "snp1")
        assert snp1.get_attribute("Variant_effect") is None

    def test_stop_retained_with_table_6(self):
        # table 6 (Ciliate): TAA/TAG code Q, only TGA is a stop.
        # fwd CDS ...TGA -> variant respells TGA as TAA?  In table 6
        # TAA=Q so that's stop_lost; retained needs TGA->TGA impossible;
        # use standard table: TAA -> TGA both stops.
        genome = "ATGGCTTAA"
        gff = ("##gff-version 3\n"
               "chr1\t.\tgene\t1\t9\t.\t+\t.\tID=g\n"
               "chr1\t.\tmRNA\t1\t9\t.\t+\t.\tID=m;Parent=g\n"
               "chr1\t.\tCDS\t1\t9\t.\t+\t0\tParent=m\n")
        gvf = ("##gff-version 3\n"
               "chr1\t.\tSNV\t8\t8\t.\t+\t.\t"
               "ID=s;Reference_seq=A;Variant_seq=G\n")
        rmap = RegionMapping(["chr1"], [genome])
        out = [n for n in snp_annotator_stream(
            list(sort_stream(parse_gff3(gvf))),
            list(sort_stream(parse_gff3(gff))), rmap)
            if getattr(n, "type", None) == "SNV"]
        assert out[0].get_attribute("Variant_effect") == \
            "stop_retained_variant 0 mRNA m"

    def test_multi_exon_cds_offset(self):
        # SNP in the 2nd CDS: upstream CDS lengths must accumulate into
        # the mRNA position (ref: snp_annotator_visitor.c — non-hit CDS
        # add gt_range_length to mrnasnppos).
        # spliced mRNA = ATGGCT + TCATAA = ATG GCT TCA TAA (M A S *)
        gff = ("##gff-version 3\n"
               "chr1\t.\tgene\t1\t21\t.\t+\t.\tID=g\n"
               "chr1\t.\tmRNA\t1\t21\t.\t+\t.\tID=m;Parent=g\n"
               "chr1\t.\tCDS\t1\t6\t.\t+\t0\tParent=m\n"
               "chr1\t.\tCDS\t16\t21\t.\t+\t0\tParent=m\n")
        # genomic pos 17 = 'C' (mRNA pos 7, codon TCA); C->G gives TGA
        gvf = ("##gff-version 3\n"
               "chr1\t.\tSNV\t17\t17\t.\t+\t.\t"
               "ID=s;Reference_seq=C;Variant_seq=G\n")
        rmap = RegionMapping(["chr1"], [GENOME])
        out = [n for n in snp_annotator_stream(
            list(sort_stream(parse_gff3(gvf))),
            list(sort_stream(parse_gff3(gff))), rmap)
            if getattr(n, "type", None) == "SNV"]
        assert out[0].get_attribute("Variant_effect") == \
            "stop_gained 0 mRNA m"

    def test_variant_index_after_matching_allele(self):
        # 'G,A' where G equals the reference base: the A allele must be
        # reported with index 1 (ref increments i for matching alleles).
        gvf_text = GVF.replace("ID=snp1;Reference_seq=G;Variant_seq=A",
                               "ID=snp1;Reference_seq=G;Variant_seq=G,A")
        rmap = RegionMapping(["chr1"], [GENOME])
        out = [n for n in snp_annotator_stream(
            list(sort_stream(parse_gff3(gvf_text))),
            list(sort_stream(parse_gff3(GFF))), rmap)
            if getattr(n, "type", None) == "SNV"]
        snp1 = next(n for n in out if n.get_attribute("ID") == "snp1")
        assert snp1.get_attribute("Variant_effect") == \
            "non_conservative_missense_variant 1 mRNA mRNA1"


class TestTransTable:
    def test_standard(self):
        tt = TransTable()
        assert tt.translate("A", "T", "G") == "M"
        assert tt.is_start_codon("A", "T", "G")
        assert tt.is_stop_codon("T", "A", "A")
        assert tt.is_stop_codon("T", "G", "A")
        assert not tt.is_stop_codon("T", "G", "G")
        assert tt.translate_str("ATGGCTTGT") == "MAC"

    def test_vertebrate_mito(self):
        tt = TransTable(2)
        assert tt.is_stop_codon("A", "G", "A")     # AGA stop in table 2
        assert tt.translate("T", "G", "A") == "W"  # TGA = Trp

    def test_invalid_number(self):
        with pytest.raises(ValueError):
            TransTable(7)
        with pytest.raises(ValueError):
            TransTable(99)

    def test_descriptions(self):
        descs = scheme_descriptions()
        assert descs[0] == "1: Standard"
        assert len(descs) == 19


class TestSnpperCLI:
    def test_cli(self, tmp_path):
        (tmp_path / "g.gff3").write_text(GFF)
        (tmp_path / "v.gvf").write_text(GVF)
        (tmp_path / "chr1.fna").write_text(f">chr1\n{GENOME}\n")
        r = subprocess.run(
            [sys.executable, "-m", "genometools_tpu", "snpper",
             "-seqfile", str(tmp_path / "chr1.fna"), "-matchdesc",
             str(tmp_path / "g.gff3"), str(tmp_path / "v.gvf")],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        assert "non_conservative_missense_variant 0 mRNA mRNA1" in r.stdout
        assert "stop_lost 0 mRNA mRNA2" in r.stdout
        # genes are consumed, SNVs pass through
        assert "\tgene\t" not in r.stdout
        assert r.stdout.count("\tSNV\t") == 4
