"""suffixerator_e2e fast path: byte-identical to the slow path.

The slow path (esa.write_esa + esq.write_all) is itself byte-parity-
tested against the compiled reference binary (test_esa_refparity.py),
so equality here chains to reference byte parity.
"""

import filecmp
import os

import numpy as np
import pytest

from genometools_tpu.core.encseq import Encseq
from genometools_tpu.core.esq import write_all
from genometools_tpu.index.esa import build_esa, write_esa
from genometools_tpu.index.fastpipe import suffixerator_e2e

TD = "/root/reference/testdata"

EXTS = [".esq", ".ssp", ".des", ".sds", ".md5", ".suf", ".lcp", ".llv",
        ".prj"]


def _slow(path, indexname):
    enc = Encseq.from_files([path])
    write_all(enc, indexname)
    esa = build_esa(enc, with_lcp=True)
    write_esa(esa, indexname, suf=True, lcp=True)


@pytest.mark.parametrize("db", ["Atinsert.fna", "Duplicate.fna",
                                "Random.fna", "TTT-small.fna",
                                "at1MB"])
def test_fastpipe_matches_slow_path(db, tmp_path):
    src = os.path.join(TD, db)
    slow = str(tmp_path / "slow")
    fast = str(tmp_path / "fast")
    _slow(src, slow)
    suffixerator_e2e([src], fast)
    for ext in EXTS:
        sp, fp = slow + ext, fast + ext
        if not os.path.exists(sp):
            assert not os.path.exists(fp) or \
                os.path.getsize(fp) == 0, ext
            continue
        assert os.path.exists(fp), f"missing {ext}"
        if ext == ".prj":
            # the filenames recorded differ only via provenance; compare
            # the full text (identical inputs => identical content)
            a = open(sp).read()
            b = open(fp).read()
            assert a == b, f".prj differs:\n{a}\nvs\n{b}"
        else:
            assert filecmp.cmp(sp, fp, shallow=False), f"{ext} differs"


def test_fastpipe_wildcards(tmp_path):
    # input with wildcard runs + multiple sequences
    p = tmp_path / "wc.fna"
    rng = np.random.default_rng(7)
    seqs = []
    for i in range(3):
        s = "".join(rng.choice(list("acgtn"), 211,
                               p=[0.23] * 4 + [0.08]))
        seqs.append(f">s{i}\n{s}\n")
    p.write_text("".join(seqs))
    slow = str(tmp_path / "slow")
    fast = str(tmp_path / "fast")
    _slow(str(p), slow)
    suffixerator_e2e([str(p)], fast)
    for ext in EXTS:
        sp, fp = slow + ext, fast + ext
        if os.path.exists(sp) and os.path.getsize(sp):
            assert filecmp.cmp(sp, fp, shallow=False), f"{ext} differs"


@pytest.mark.parametrize("db", ["Atinsert.fna", "at1MB"])
def test_device_pipeline_still_exact(db, tmp_path, monkeypatch):
    # GT_E2E_HOST_MAX=0 disables the small-input host SA-IS path so the
    # device pipeline keeps its own byte-parity coverage
    monkeypatch.setenv("GT_E2E_HOST_MAX", "0")
    src = os.path.join(TD, db)
    slow = str(tmp_path / "slow")
    fast = str(tmp_path / "fast")
    _slow(src, slow)
    suffixerator_e2e([src], fast)
    for ext in EXTS:
        sp, fp = slow + ext, fast + ext
        if os.path.exists(sp) and os.path.getsize(sp) and ext != ".prj":
            assert filecmp.cmp(sp, fp, shallow=False), f"{ext} differs"


def test_host_path_threshold_env(tmp_path, monkeypatch):
    # the branch respects GT_E2E_HOST_MAX
    src = os.path.join(TD, "Atinsert.fna")
    monkeypatch.setenv("GT_E2E_HOST_MAX", "10")   # too small -> device
    suffixerator_e2e([src], str(tmp_path / "d"))
    monkeypatch.setenv("GT_E2E_HOST_MAX", str(64 << 20))
    suffixerator_e2e([src], str(tmp_path / "h"))
    for ext in (".suf", ".lcp", ".llv", ".esq"):
        assert filecmp.cmp(str(tmp_path / "d") + ext,
                           str(tmp_path / "h") + ext,
                           shallow=False), f"{ext} differs"
