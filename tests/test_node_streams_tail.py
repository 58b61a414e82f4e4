"""Buffer/array/visitor/feature stream family (ref: src/extended/
buffer_stream.c, array_*_stream.c, visitor_stream.c, feature_stream.c,
tidy_region_node_stream.c, targetbest_select_stream.c,
cds_check_stream.c)."""

import pytest

from genometools_tpu.anno.feature_index import FeatureIndex
from genometools_tpu.anno.genome_node import (FeatureNode, Range,
                                              RegionNode)
from genometools_tpu.anno.node_stream import (
    BufferStream, array_in_stream, array_out_stream, cds_check_stream,
    feature_in_stream, feature_stream, gff3_in_stream, load_stream,
    script_wrapper_stream, targetbest_select_stream,
    tidy_region_node_stream, visitor_stream)

GFF = """##gff-version 3
##sequence-region ctg123 1 1000
ctg123\t.\tgene\t100\t300\t.\t+\t.\tID=g1
ctg123\t.\tmRNA\t100\t300\t.\t+\t.\tID=m1;Parent=g1
ctg123\t.\tCDS\t100\t150\t.\t+\t0\tParent=m1
ctg123\t.\tCDS\t200\t300\t.\t+\t0\tParent=m1
"""


def _nodes():
    return list(gff3_in_stream(GFF))


class TestBufferArray:
    def test_buffer_stream_replays(self):
        nodes = _nodes()
        bs = BufferStream(array_in_stream(nodes))
        first = [next(bs) for _ in range(len(nodes))]
        bs.dequeue_buffer()
        replay = list(bs)
        assert first == nodes and replay == nodes

    def test_array_out_stream_collects_features(self):
        nodes = _nodes()
        out = []
        passed = list(array_out_stream(iter(nodes), out))
        assert passed == nodes
        assert all(isinstance(f, FeatureNode) for f in out)
        assert len(out) == sum(isinstance(n, FeatureNode) for n in nodes)

    def test_load_and_visitor(self):
        nodes = load_stream(gff3_in_stream(GFF))
        seen = []
        list(visitor_stream(iter(nodes), lambda n: seen.append(n)))
        assert seen == nodes

    def test_script_wrapper_drop_and_replace(self):
        nodes = _nodes()
        kept = list(script_wrapper_stream(
            iter(nodes),
            lambda n: None if isinstance(n, RegionNode) else n))
        assert all(not isinstance(n, RegionNode) for n in kept)


class TestFeatureStreams:
    def test_feature_stream_roundtrip(self):
        fi = FeatureIndex()
        list(feature_stream(gff3_in_stream(GFF), fi))
        assert fi.seqids() == ["ctg123"]
        back = list(feature_in_stream(fi))
        assert isinstance(back[0], RegionNode)
        assert any(isinstance(n, FeatureNode) and n.type == "gene"
                   for n in back)


class TestTidyTargetCds:
    def test_tidy_extends_region(self):
        gff = GFF.replace("##sequence-region ctg123 1 1000",
                          "##sequence-region ctg123 1 50")
        out = list(tidy_region_node_stream(gff3_in_stream(gff, strict=False)))
        region = [n for n in out if isinstance(n, RegionNode)][0]
        assert region.range.end >= 300

    def test_targetbest_keeps_best_score(self):
        a = FeatureNode("s", "match", 1, 10, "+", score=1.0)
        a.set_attribute("Target", "t1 1 10")
        b = FeatureNode("s", "match", 20, 30, "+", score=5.0)
        b.set_attribute("Target", "t1 20 30")
        c = FeatureNode("s", "match", 40, 50, "+", score=3.0)
        c.set_attribute("Target", "t2 1 10")
        out = list(targetbest_select_stream(iter([a, b, c])))
        assert b in out and c in out and a not in out

    @staticmethod
    def _bad_gene():
        # built programmatically: the gff3 parser itself already
        # corrects phases in tidy (non-strict) mode, so a parsed tree
        # cannot carry a bad phase
        g = FeatureNode("s", "gene", 100, 300, "+")
        m = FeatureNode("s", "mRNA", 100, 300, "+")
        c1 = FeatureNode("s", "CDS", 100, 150, "+", phase="0")
        c2 = FeatureNode("s", "CDS", 200, 300, "+", phase="1")
        g.add_child(m)
        m.add_child(c1)
        m.add_child(c2)
        return g

    def test_cds_check_detects_bad_phase(self):
        # first CDS len 51, phase 0 -> next expected (3 - 51%3)%3 = 0;
        # good input passes, phase-1 second CDS raises
        list(cds_check_stream(gff3_in_stream(GFF)))
        with pytest.raises(ValueError):
            list(cds_check_stream(iter([self._bad_gene()])))

    def test_cds_check_tidy_fixes(self):
        out = list(cds_check_stream(iter([self._bad_gene()]),
                                    tidy=True))
        cds = [f for n in out if isinstance(n, FeatureNode)
               for f in n.traverse() if f.type == "CDS"]
        assert all(str(f.phase) == "0" for f in cds)


class TestRound4bStreams:
    """dot_out / linesorted / numsorted / sequence-node / add_ids
    streams (ref: src/extended/dot_out_stream.c,
    gff3_linesorted_out_stream.c, gff3_numsorted_out_stream.c,
    sequence_node_{add,out}_stream.c, add_ids_stream.c)."""

    def _nodes(self):
        from genometools_tpu.anno.gff3 import parse_gff3
        return parse_gff3(open(
            "/root/reference/testdata/standard_gene_as_tree.gff3"
        ).read())

    def test_dot_out_stream(self):
        import io
        from genometools_tpu.anno.node_stream import dot_out_stream
        buf = io.StringIO()
        nodes = list(dot_out_stream(self._nodes(), out=buf))
        text = buf.getvalue()
        assert text.strip().startswith("digraph nodes {")
        assert text.strip().endswith("}")
        assert "shape=record" in text and "->" in text
        assert nodes  # pass-through preserved

    def test_linesorted_and_numsorted(self):
        import io
        from genometools_tpu.anno.node_stream import (
            gff3_linesorted_out_stream, gff3_numsorted_out_stream)
        b1, b2 = io.StringIO(), io.StringIO()
        gff3_linesorted_out_stream(self._nodes(), out=b1)
        gff3_numsorted_out_stream(self._nodes(), out=b2)
        l1 = b1.getvalue().splitlines()
        l2 = b2.getvalue().splitlines()
        assert l1 == sorted(l1)
        assert set(l1) == set(l2)
        starts = [(x.split("\t")[0], int(x.split("\t")[3]))
                  for x in l2]
        assert starts == sorted(starts)

    def test_sequence_node_add_and_out(self):
        import io
        from genometools_tpu.anno.genome_node import SequenceNode
        from genometools_tpu.anno.node_stream import (
            sequence_node_add_stream, sequence_node_out_stream)
        seqs = {"ctg123": "ACGT" * 25}
        st = sequence_node_add_stream(self._nodes(), seqs)
        buf = io.StringIO()
        rest = list(sequence_node_out_stream(st, out=buf))
        assert not any(isinstance(x, SequenceNode) for x in rest)
        fasta = buf.getvalue()
        assert fasta.startswith(">ctg123")
        assert "ACGT" in fasta

    def test_add_ids_stream(self):
        from genometools_tpu.anno.genome_node import FeatureNode
        from genometools_tpu.anno.node_stream import add_ids_stream
        parent = FeatureNode("c", "gene", 1, 10, "+")
        child = FeatureNode("c", "exon", 1, 10, "+")
        parent.children.append(child)
        out = list(add_ids_stream([parent]))
        assert out[0].get_attribute("ID") == "gene1"
