"""Byte-parity of the reference .esq/.ssp/.des/.sds/.md5 formats.

Goldens in tests/golden_esa/ were written by the compiled reference gt
binary; our writers (core/esq.py) must reproduce every byte, and our
reader must load the reference's files back into an identical Encseq.
The reverse direction (the real `gt dev sfxmap -esa` consuming an index
we wrote) was verified out-of-band when the goldens were generated."""

import pathlib

import numpy as np
import pytest

from genometools_tpu.core import esq
from genometools_tpu.core.encseq import Encseq

GOLDEN = pathlib.Path(__file__).parent / "golden_esa"

ALL = ["Atinsert.fna", "Duplicate.fna", "Random.fna", "Random159.fna",
       "Random160.fna", "TTT-small.fna", "trna_glutamine.fna",
       "small_poly.fas", "at1MB"]

# access types the reference picked (pinned: a change in our
# determine_sat would silently change every downstream byte)
WANT_SAT = {"TTT-small.fna": esq.SAT_UCHAR, "Random159.fna": esq.SAT_BITACCESS,
            "Atinsert.fna": esq.SAT_BITACCESS, "Duplicate.fna": esq.SAT_UCHAR,
            "Random.fna": esq.SAT_BITACCESS, "Random160.fna": esq.SAT_BITACCESS,
            "trna_glutamine.fna": esq.SAT_EQUALLENGTH,
            "small_poly.fas": esq.SAT_UCHAR, "at1MB": esq.SAT_UCHAR}


@pytest.mark.parametrize("db", ALL)
def test_esq_write_byte_identical(testdata, tmp_path, db):
    enc = Encseq.from_files([str(testdata / db)])
    idx = str(tmp_path / "idx")
    sat = esq.write_all(enc, idx)
    assert sat == WANT_SAT[db]
    for f in ["esq", "ssp", "des", "sds", "md5"]:
        golden = GOLDEN / db / f"idx.{f}"
        if not golden.exists():
            continue
        got = pathlib.Path(f"{idx}.{f}").read_bytes()
        assert got == golden.read_bytes(), f"{db} .{f}"


@pytest.mark.parametrize("db", ALL)
def test_esq_read_reference_files(testdata, db):
    enc = Encseq.from_files([str(testdata / db)])
    got, meta = esq.read_esq(str(GOLDEN / db / "idx"))
    assert np.array_equal(got.codes, enc.codes)
    assert np.array_equal(got.ssp, enc.ssp)
    assert got.descs == enc.descs
    assert meta.totallength == enc.total_length
    assert meta.numofdbsequences == enc.num_sequences


def test_save_load_roundtrip_esq(testdata, tmp_path):
    enc = Encseq.from_files([str(testdata / "Duplicate.fna")])
    idx = str(tmp_path / "rt")
    enc.save(idx)
    assert (tmp_path / "rt.esq").exists()   # DNA -> reference format
    back = Encseq.load(idx)
    assert np.array_equal(back.codes, enc.codes)
    assert back.descs == enc.descs
