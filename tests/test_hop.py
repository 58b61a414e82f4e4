"""gt hop homopolymer correction vs reference goldens
(ref: testsuite/gt_hop_include.rb)."""

import pytest

from genometools_tpu.assembly.hop import (HopParams, alignments_from_bam,
                                          alignments_from_sam, hop_correct,
                                          hop_output)
from genometools_tpu.core.seqio import read_seqfile


@pytest.fixture(scope="module")
def hop_data(testdata):
    td = testdata / "hop"
    genome = read_seqfile(str(td / "genome.fas"))
    refs = [(d, s.tobytes().decode().lower())
            for d, s in zip(genome.descs, genome.seqs)]
    sam = alignments_from_sam((td / "map.sam").read_text())
    reads = read_seqfile(str(td / "reads.fastq"))
    return td, refs, sam, reads.descs


class TestHopGoldens:
    @pytest.mark.parametrize("mode,golden", [
        ("aggressive", "hop_aggressive.fastq"),
        ("moderate", "hop_moderate.fastq"),
        ("conservative", "hop_conservative.fastq"),
    ])
    def test_modes(self, hop_data, mode, golden):
        td, refs, sam, descs = hop_data
        res = hop_correct(refs, sam, getattr(HopParams, mode)())
        assert hop_output(res, descs, None) == (td / golden).read_text()

    @pytest.mark.parametrize("kw,golden", [
        ({"hmin": 4}, "hop_hmin4.fastq"),
        ({"read_hmin": 3}, "hop_read-hmin3.fastq"),
    ])
    def test_expert(self, hop_data, kw, golden):
        td, refs, sam, descs = hop_data
        res = hop_correct(refs, sam, HopParams(**kw))
        assert hop_output(res, descs, None) == (td / golden).read_text()

    def test_bam_equals_sam(self, hop_data):
        td, refs, sam, descs = hop_data
        bam = alignments_from_bam(str(td / "map.bam"))
        assert bam == sam

    def test_two_read_files(self, hop_data):
        td, refs, _, _ = hop_data
        alns = alignments_from_bam(str(td / "map2.bam"))
        res = hop_correct(refs, alns, HopParams.aggressive())
        for rf, golden in [("10reads.fastq", "hop_10reads.fastq"),
                           ("other10reads.fastq",
                            "hop_other10reads.fastq")]:
            descs = read_seqfile(str(td / rf)).descs
            assert hop_output(res, descs, None) == \
                (td / golden).read_text()


class TestHopThresholds:
    """-cogmin / -altmax / -covmin threshold pairs on smallgenome
    (ref: gt_hop_include.rb expert threshold tests)."""

    def _run(self, testdata, **kw):
        td = testdata / "hop"
        genome = read_seqfile(str(td / "smallgenome.fas"))
        refs = [(d, s.tobytes().decode().lower())
                for d, s in zip(genome.descs, genome.seqs)]
        alns = alignments_from_bam(str(td / "sg_map.bam"))
        res = hop_correct(refs, alns, HopParams(**kw))
        return sum(1 for a in res.values() if a.edited)

    def test_cogmin(self, testdata):
        assert self._run(testdata, refmin=0.25) == 0
        assert self._run(testdata, refmin=0.24) == 4

    def test_altmax(self, testdata):
        assert self._run(testdata, altmax=0.49) == 0
        assert self._run(testdata, altmax=0.50) == 4

    def test_covmin(self, testdata):
        assert self._run(testdata, covmin=6) == 0
        assert self._run(testdata, covmin=4) == 4
