"""gt cds engine vs reference goldens
(ref: testsuite/gt_cds_include.rb)."""

import pytest

from genometools_tpu.anno.cds import (RegionMapping, add_cds,
                                      determine_orfs)
from genometools_tpu.anno.gff3 import GFF3Writer, parse_gff3


def _run(testdata, inf, fasf, outf, usedesc=False, **kw):
    nodes = parse_gff3((testdata / inf).read_text())
    rm = RegionMapping.from_file(str(testdata / fasf),
                                 matchdesc=not usedesc, usedesc=usedesc)
    got = GFF3Writer().render(add_cds(nodes, rm, **kw))
    assert got == (testdata / outf).read_text()


class TestCDSGoldens:
    @pytest.mark.parametrize("i", range(1, 15))
    def test_matchdesc(self, testdata, i):
        _run(testdata, f"gt_cds_test_{i}.in", f"gt_cds_test_{i}.fas",
             f"gt_cds_test_{i}.out", minorflen=1, start_codon=True)

    @pytest.mark.parametrize("i", range(1, 15))
    def test_usedesc(self, testdata, i):
        _run(testdata, f"gt_cds_test_{i}.in", f"gt_cds_test_{i}.fas",
             f"gt_cds_test_{i}.out", usedesc=True, minorflen=1,
             start_codon=True)

    def test_descrange(self, testdata):
        _run(testdata, "gt_cds_test_descrange.in",
             "gt_cds_test_descrange.fas", "gt_cds_test_descrange.out",
             usedesc=True, minorflen=1)

    def test_descrange_multi(self, testdata):
        _run(testdata, "gt_cds_descrange_multi.in",
             "gt_cds_descrange_multi.fas", "gt_cds_descrange_multi.out",
             usedesc=True, minorflen=1)

    def test_nostartcodon_nofinalstopcodon(self, testdata):
        _run(testdata, "gt_cds_nostartcodon_nofinalstopcodon.in",
             "U89959_genomic.fas",
             "gt_cds_nostartcodon_nofinalstopcodon.out")

    def test_u89959(self, testdata):
        _run(testdata, "U89959_csas.gff3", "U89959_genomic.fas",
             "U89959_cds.gff3")

    def test_ngasp(self, testdata):
        _run(testdata, "nGASP/resIII.gff3", "nGASP/III.fas",
             "nGASP/resIIIcds.gff3", usedesc=True, start_codon=True)


class TestCDSErrors:
    @pytest.mark.parametrize("fas,msg", [
        ("gt_cds_descrange_multi_fail_1.fas",
         "contain multiple sequences with ID"),
        ("gt_cds_descrange_multi_fail_2.fas",
         "contain multiple sequences with ID"),
        ("gt_cds_descrange_wrong_id.fas", 'sequence with ID'),
        ("gt_cds_descrange_wrong_range.fas", 'sequence with ID'),
    ])
    def test_usedesc_errors(self, testdata, fas, msg):
        nodes = parse_gff3(
            (testdata / "gt_cds_test_descrange.in").read_text())
        with pytest.raises(ValueError, match=msg):
            rm = RegionMapping.from_file(str(testdata / fas), usedesc=True)
            add_cds(nodes, rm, minorflen=1)

    def test_out_of_range(self, testdata):
        text = (testdata / "gt_cds_test_1.in").read_text()
        shifted = []
        for line in text.splitlines():
            cols = line.split("\t")
            if len(cols) == 9:
                cols[3] = str(int(cols[3]) + 1000)
                cols[4] = str(int(cols[4]) + 1000)
                shifted.append("\t".join(cols))
            elif line.startswith("##sequence-region"):
                parts = line.split()
                parts[2] = str(int(parts[2]) + 1000)
                parts[3] = str(int(parts[3]) + 1000)
                shifted.append("   ".join(parts))
            else:
                shifted.append(line)
        nodes = parse_gff3("\n".join(shifted) + "\n")
        rm = RegionMapping.from_file(str(testdata / "gt_cds_test_1.fas"),
                                     matchdesc=True)
        with pytest.raises(ValueError, match="Has the sequence-region to "
                           "sequence mapping been defined correctly"):
            add_cds(nodes, rm, minorflen=1, start_codon=True)

    def test_not_sorted(self, testdata):
        nodes = parse_gff3((testdata / "not_sorted.gff3").read_text())
        rm = RegionMapping.from_file(str(testdata / "U89959_genomic.fas"),
                                     matchdesc=True)
        with pytest.raises(ValueError, match="is not sorted"):
            add_cds(nodes, rm)


class TestOrfUnit:
    def test_basic(self):
        # MGG* in frame 0 -> ORF covering the stop codon
        assert determine_orfs("MG*", 0, True, True) == [(0, 8)]

    def test_no_start_required(self):
        assert determine_orfs("GG*", 0, False, True) == [(0, 8)]
        # after a stop, the next ORF begins at the next non-stop codon
        assert determine_orfs("G*G", 0, False, False) == [(0, 5), (6, 8)]

    def test_final_stop_codon(self):
        assert determine_orfs("MGG", 0, True, True) == []
        assert determine_orfs("MGG", 0, True, False) == [(0, 8)]

    def test_frame_offset(self):
        assert determine_orfs("MG*", 2, True, True) == [(2, 10)]


class TestSpliceSiteInfo:
    """ref: testsuite/gt_splicesiteinfo_include.rb."""

    @pytest.mark.parametrize("i,addintrons", [(1, False), (2, False),
                                              (4, False), (5, True)])
    def test_goldens(self, testdata, i, addintrons):
        from genometools_tpu.anno.splicesite import splice_site_info
        nodes = parse_gff3(
            (testdata / f"gt_splicesiteinfo_test_{i}.gff3").read_text())
        rm = RegionMapping.from_file(
            str(testdata / f"gt_splicesiteinfo_test_{i}.fas"),
            matchdesc=True)
        got = splice_site_info(nodes, rm, addintrons=addintrons)
        assert got == \
            (testdata / f"gt_splicesiteinfo_test_{i}.out").read_text()

    def test_unknown_orientation_warns(self, testdata):
        import warnings
        from genometools_tpu.anno.splicesite import splice_site_info
        nodes = parse_gff3(
            (testdata / "gt_splicesiteinfo_test_3.gff3").read_text())
        rm = RegionMapping.from_file(
            str(testdata / "gt_splicesiteinfo_test_1.fas"), matchdesc=True)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            splice_site_info(nodes, rm)
        assert any("unknown orientation" in str(x.message) for x in w)

    def test_no_introns_returns_none(self, testdata):
        from genometools_tpu.anno.splicesite import splice_site_info
        nodes = parse_gff3((testdata / "gt_cds_test_1.in").read_text())
        rm = RegionMapping.from_file(str(testdata / "gt_cds_test_1.fas"),
                                     matchdesc=True)
        assert splice_site_info(nodes, rm) is None


class TestOrfFinder:
    """ref: testsuite/gt_orffinder_include.rb + orf_iterator.c."""

    def test_orf_iterator(self):
        from genometools_tpu.anno.orffinder import orf_iterator
        # atg gga taa -> ORF [0, 5] frame 0 (stop codon excluded)
        assert list(orf_iterator("atgggataa")) == [(0, 5, 0)]
        # no stop codon -> no ORF
        assert list(orf_iterator("atggga")) == []

    def test_u89959_reading_frames(self, testdata):
        from genometools_tpu.anno.orffinder import find_orfs
        from genometools_tpu.anno.gff3 import GFF3Writer
        nodes = parse_gff3((testdata / "U89959_cds.gff3").read_text())
        rm = RegionMapping.from_file(str(testdata / "U89959_genomic.fas"),
                                     matchdesc=True)
        out = GFF3Writer().render(find_orfs(nodes, rm, types={"gene"}))
        assert "reading_frame" in out
        # every ORF lies inside its parent and is >= 30nt
        for line in out.splitlines():
            cols = line.split("\t")
            if len(cols) == 9 and cols[2] == "reading_frame":
                assert cols[1] == "GenomeTools"
                assert int(cols[4]) - int(cols[3]) + 1 >= 30
                assert "frame=" in cols[8]
