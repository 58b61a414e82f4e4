"""dev sfxmap / show_seedext, congruence, repfind -q, gff3 -xrfcheck."""

import subprocess
import sys

import numpy as np
import pytest

TD = "/root/reference/testdata"


def _run(args, cwd=None, cpu=True):
    cmd = [sys.executable, "-m", "genometools_tpu", *args]
    if cpu:
        cmd.append("--cpu")
    return subprocess.run(
        cmd, capture_output=True, text=True, cwd=cwd,
        env={"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
             "HOME": "/root"})


class TestXrfCheck:
    def test_valid(self):
        r = _run(["gff3", "-xrfcheck", "GO", f"{TD}/dbxref.gff3"],
                 cpu=False)
        assert r.returncode == 0, r.stderr

    @pytest.mark.parametrize("f,msg", [
        ("dbxref_invalid.gff3", "does not conform to syntax"),
        ("dbxref_invalid2.gff3", "unknown database abbreviation"),
    ])
    def test_invalid(self, f, msg):
        r = _run(["gff3", "-xrfcheck", "GO", f"{TD}/{f}"], cpu=False)
        assert r.returncode == 1
        assert msg in r.stderr

    def test_abbr_file_validation(self):
        from genometools_tpu.anno.xrf import XRFError, parse_xrf_abbr
        with pytest.raises(XRFError, match="duplicate abbreviation"):
            parse_xrf_abbr("abbreviation: A\n\nabbreviation: A\n")
        with pytest.raises(XRFError, match="required label"):
            parse_xrf_abbr("database: D\n")
        with pytest.raises(XRFError, match="invalid regular"):
            parse_xrf_abbr("abbreviation: A\nlocal_id_syntax: [\n")


class TestSfxmap(object):
    def test_verifies_good_index(self, tmp_path):
        r = _run(["suffixerator", "-db", f"{TD}/Atinsert.fna",
                  "-indexname", "idx", "-suf", "-lcp", "-tis"],
                 cwd=tmp_path)
        assert r.returncode == 0, r.stderr
        r = _run(["dev", "sfxmap", "idx", "-suf", "-lcp", "-tis"],
                 cwd=tmp_path)
        assert r.returncode == 0, r.stderr
        assert "suftab order verified" in r.stderr
        assert "lcp table verified" in r.stderr

    def test_detects_corruption(self, tmp_path):
        import os
        r = _run(["suffixerator", "-db", f"{TD}/Atinsert.fna",
                  "-indexname", "idx", "-suf", "-tis"],
                 cwd=tmp_path)
        assert r.returncode == 0, r.stderr
        suf = tmp_path / "idx.suf"
        raw = bytearray(suf.read_bytes())
        raw[16:24], raw[24:32] = raw[24:32], raw[16:24]  # swap 2 entries
        suf.write_bytes(bytes(raw))
        r = _run(["dev", "sfxmap", "idx", "-suf"], cwd=tmp_path)
        assert r.returncode == 1
        assert "order violated" in r.stderr


class TestShowSeedext:
    def test_cigar_roundtrip_reference_file(self, tmp_path):
        # rebuild the at1MB index under its recorded name, then the
        # reference's own .matches file must roundtrip byte-for-byte
        r = _run(["suffixerator", "-db", f"{TD}/at1MB", "-indexname",
                  "at1MB", "-suf", "-lcp", "-tis"], cwd=tmp_path)
        assert r.returncode == 0, r.stderr
        r = _run(["dev", "show_seedext", "-f",
                  f"{TD}/see-ext-at1MB-400-cigar.matches",
                  "-outfmt", "cigar"], cwd=tmp_path)
        assert r.returncode == 0, r.stderr
        ours = [l for l in r.stdout.splitlines() if not l.startswith("#")]
        ref = [l for l in
               open(f"{TD}/see-ext-at1MB-400-cigar.matches")
               .read().splitlines() if not l.startswith("#")]
        assert ours == ref


class TestRepfindQuery:
    def test_query_matches(self, tmp_path):
        r = _run(["suffixerator", "-db", f"{TD}/Atinsert.fna",
                  "-indexname", "idx", "-suf", "-lcp", "-tis"],
                 cwd=tmp_path)
        assert r.returncode == 0, r.stderr
        r = _run(["repfind", "-l", "15", "-ii", "idx", "-q",
                  f"{TD}/Atinsert.fna"], cwd=tmp_path)
        assert r.returncode == 0, r.stderr
        lines = [l for l in r.stdout.splitlines() if l]
        assert lines, "self-query must produce matches"
        # every query position matches itself at full suffix length:
        # check a reported row is a genuine match
        from genometools_tpu.core.encseq import Encseq
        e = Encseq.from_files([f"{TD}/Atinsert.fna"])
        ln, ds, dr, _, _, qs, qr = lines[0].split()
        ln, ds, dr, qs, qr = map(int, (ln, ds, dr, qs, qr))
        a = e.codes[int(e.seq_startpos(ds)) + dr:][:ln]
        b = e.codes[int(e.seq_startpos(qs)) + qr:][:ln]
        assert np.array_equal(a, b)


class TestCongruence:
    def test_spacedseed_selfhits(self, tmp_path):
        r = _run(["suffixerator", "-db", f"{TD}/Atinsert.fna",
                  "-indexname", "idx", "-suf", "-tis"], cwd=tmp_path)
        assert r.returncode == 0, r.stderr
        r = _run(["congruence", "spacedseed", "-esa", "idx", "-q",
                  f"{TD}/Atinsert.fna"], cwd=tmp_path)
        assert r.returncode == 0, r.stderr
        lines = [l.split("\t") for l in r.stdout.splitlines() if l]
        assert lines and all(l[0] == "17" for l in lines)
        # at least one hit per valid self window
        from genometools_tpu.core.encseq import Encseq
        from genometools_tpu.match.congruence import (_masked_codes,
                                                      seed_mask)
        e = Encseq.from_files([f"{TD}/Atinsert.fna"])
        _, valid = _masked_codes(e.codes, seed_mask(), 17)
        assert len(lines) >= int(valid.sum())
