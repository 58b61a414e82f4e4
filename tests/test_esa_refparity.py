"""Byte-parity of our ESA writers vs the compiled reference gt binary.

tests/golden_esa/ holds .suf/.lcp/.llv/.bwt/.bck/.prj written by the real
`gt suffixerator -suf -lcp -tis -bwt -bck` (see golden_esa/README.md);
our writers must reproduce every byte (ref: sfx-run.c writers,
bcktab.c gt_bcktab_flush_to_file, sfx-outprj.c)."""

import gzip
import pathlib

import pytest

from genometools_tpu.core.encseq import Encseq
from genometools_tpu.index.esa import build_esa, write_esa

GOLDEN = pathlib.Path(__file__).parent / "golden_esa"

SMALL = ["Atinsert.fna", "Duplicate.fna", "Random.fna", "Random159.fna",
         "Random160.fna", "TTT-small.fna", "trna_glutamine.fna",
         "small_poly.fas"]

FILES = ["suf", "lcp", "llv", "bwt", "bck", "prj"]


def _build_and_write(testdata, db, tmp_path):
    enc = Encseq.from_files([str(testdata / db)])
    esa = build_esa(enc, with_lcp=True, with_bck=True)
    out = tmp_path / "idx"
    write_esa(esa, str(out), suf=True, lcp=True, bwt=True, bck=True)
    return out


@pytest.mark.parametrize("db", SMALL)
def test_esa_files_byte_identical(testdata, tmp_path, db):
    out = _build_and_write(testdata, db, tmp_path)
    for f in FILES:
        want = (GOLDEN / db / f"idx.{f}").read_bytes()
        got = pathlib.Path(f"{out}.{f}").read_bytes()
        assert got == want, f"{db} .{f} differs from reference binary output"


def test_esa_files_byte_identical_at1MB(testdata, tmp_path):
    out = _build_and_write(testdata, "at1MB", tmp_path)
    for f in ["lcp", "llv", "bck", "prj"]:
        want = (GOLDEN / "at1MB" / f"idx.{f}").read_bytes()
        assert pathlib.Path(f"{out}.{f}").read_bytes() == want, f".{f}"
    for f in ["suf", "bwt"]:
        want = gzip.decompress((GOLDEN / "at1MB" / f"idx.{f}.gz").read_bytes())
        assert pathlib.Path(f"{out}.{f}").read_bytes() == want, f".{f}"
