"""tirvish: TIR discovery on planted elements (ref: tir_stream.c)."""

import numpy as np
import pytest

from genometools_tpu.core.encseq import Encseq
from genometools_tpu.ltr.tirvish import (TIRvishParams, gff3_nodes,
                                         tirvish)

COMP = {"a": "t", "c": "g", "g": "c", "t": "a"}


def _revcomp(s):
    return "".join(COMP[c] for c in reversed(s))


def _rand(rng, n):
    return "".join(rng.choice(list("acgt"), n))


def _planted(seed=3, armlen=150, spacer=500, tsd="gtcat"):
    rng = np.random.default_rng(seed)
    arm = _rand(rng, armlen)
    left = _rand(rng, 300)
    right = _rand(rng, 300)
    inner = _rand(rng, spacer)
    s = left + tsd + arm + inner + _revcomp(arm) + tsd + right
    elem_start = len(left) + len(tsd)          # 0-based left TIR start
    return s, elem_start, armlen, spacer


class TestTirvish:
    def test_planted_tir_found(self):
        s, start, armlen, spacer = _planted()
        e = Encseq.from_string(s)
        pairs = tirvish(e, TIRvishParams())
        assert pairs, "planted TIR not found"
        q = pairs[0]
        # arm boundaries within a few bp of the plant (TSD adjustment
        # may shift by the TSD search outcome)
        assert abs(q.left_tir_start - start) <= 3
        assert abs((q.left_tir_end - q.left_tir_start + 1) - armlen) <= 6
        assert q.similarity > 95.0
        assert q.tsd_length >= 2

    def test_similarity_threshold_filters(self):
        # mutate the right arm heavily: below 85% similarity -> dropped
        s, start, armlen, spacer = _planted(seed=5)
        chars = list(s)
        rstart = start + armlen + spacer
        rng = np.random.default_rng(0)
        for i in range(rstart, rstart + armlen, 3):
            chars[i] = "acgt"[(("acgt".index(chars[i])) + 1) % 4]
        e = Encseq.from_string("".join(chars))
        pairs = tirvish(e, TIRvishParams())
        assert all(q.similarity >= 85.0 for q in pairs)

    def test_distance_constraints(self):
        # spacer far below min_tir_distance -> no element
        s, *_ = _planted(seed=7, armlen=120, spacer=30)
        e = Encseq.from_string(s)
        pairs = tirvish(e, TIRvishParams())
        assert pairs == []

    def test_gff3_output_shape(self):
        s, *_ = _planted(seed=11)
        e = Encseq.from_string(s)
        pairs = tirvish(e, TIRvishParams())
        nodes = gff3_nodes(pairs, e)
        types = []
        from genometools_tpu.anno.genome_node import FeatureNode

        def walk(n):
            types.append(n.type)
            for c in getattr(n, "children", []):
                walk(c)
        for n in nodes:
            if isinstance(n, FeatureNode):
                walk(n)
        assert "repeat_region" in types
        assert "terminal_inverted_repeat_element" in types
        assert types.count("terminal_inverted_repeat") >= 2
        assert types.count("target_site_duplication") >= 2


def test_refseq_match_annotate():
    import numpy as np

    from genometools_tpu.anno.genome_node import FeatureNode
    from genometools_tpu.core.encseq import Encseq
    from genometools_tpu.ltr.tirvish import refseq_match_annotate
    rng = np.random.default_rng(5)
    elem = "".join(rng.choice(list("acgt"), 400))
    genome = "".join(rng.choice(list("acgt"), 200)) + elem + \
        "".join(rng.choice(list("acgt"), 200))
    enc = Encseq.from_string(genome)
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        ref = os.path.join(td, "ref.fas")
        with open(ref, "w") as f:
            f.write(f">refelem family1\n{elem}\n")
        node = FeatureNode("seq0", "terminal_inverted_repeat_element",
                           201, 600, "?", "TIRvish")
        refseq_match_annotate([node], enc, [ref])
    kids = [c for c in node.children if c.type == "nucleotide_match"]
    assert kids, "expected a refseq match annotation"
    assert kids[0].get_attribute("target") == "refelem"
    assert float(kids[0].get_attribute("similarity")) > 95.0
