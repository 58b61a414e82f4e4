"""gt eval engine vs reference goldens
(ref: testsuite/gt_eval_include.rb)."""

import pytest

from genometools_tpu.anno.eval import StreamEvaluator, evaluate
from genometools_tpu.anno.gff3 import parse_gff3


def _run(testdata, rf, pf, outf, **kw):
    reality = parse_gff3((testdata / rf).read_text())
    prediction = parse_gff3((testdata / pf).read_text())
    got = evaluate(reality, prediction, **kw)
    assert got == (testdata / outf).read_text()


class TestEvalGoldens:
    @pytest.mark.parametrize("i", [1, 9, 10])
    def test_self(self, testdata, i):
        _run(testdata, f"gt_eval_test_{i}.in", f"gt_eval_test_{i}.in",
             f"gt_eval_test_{i}.out")

    @pytest.mark.parametrize("i", range(2, 9))
    def test_nuc(self, testdata, i):
        _run(testdata, f"gt_eval_test_{i}.reality",
             f"gt_eval_test_{i}.prediction", f"gt_eval_test_{i}.nuc")

    @pytest.mark.parametrize("i", range(2, 9))
    def test_nonuc(self, testdata, i):
        _run(testdata, f"gt_eval_test_{i}.reality",
             f"gt_eval_test_{i}.prediction", f"gt_eval_test_{i}.out",
             nuceval=False)

    def test_prob1(self, testdata):
        _run(testdata, "gt_eval_prob_1.reality", "gt_eval_prob_1.prediction",
             "gt_eval_prob_1.out", nuceval=False)

    def test_prob1_swapped(self, testdata):
        _run(testdata, "gt_eval_prob_1.prediction", "gt_eval_prob_1.reality",
             "gt_eval_prob_1.out_swapped", nuceval=False)


class TestEvalLTR:
    def test_self(self, testdata):
        _run(testdata, "gt_eval_ltr_test_1.in", "gt_eval_ltr_test_1.in",
             "gt_eval_ltr_test_1.out", evalLTR=True)

    @pytest.mark.parametrize("i", range(2, 10))
    def test_pairs(self, testdata, i):
        _run(testdata, f"gt_eval_ltr_test_{i}.reality",
             f"gt_eval_ltr_test_{i}.prediction",
             f"gt_eval_ltr_test_{i}.out", evalLTR=True)

    def test_unsorted_errors(self, testdata):
        reality = parse_gff3(
            (testdata / "gt_eval_ltr_prob_1.reality").read_text())
        prediction = parse_gff3(
            (testdata / "gt_eval_ltr_prob_1.prediction").read_text())
        with pytest.raises(ValueError, match="is not sorted"):
            evaluate(reality, prediction, evalLTR=True, LTRdelta=30)

    def test_prob1_sorted(self, testdata):
        from genometools_tpu.anno.node_stream import sort_stream
        reality = parse_gff3(
            (testdata / "gt_eval_ltr_prob_1.reality").read_text())
        prediction = list(sort_stream(parse_gff3(
            (testdata / "gt_eval_ltr_prob_1.prediction").read_text())))
        got = evaluate(reality, prediction, evalLTR=True, LTRdelta=30)
        assert got == (testdata / "gt_eval_ltr_prob_1.out").read_text()


class TestEvaluatorUnit:
    """Mirrors the reference unit test (ref: evaluator.c
    gt_evaluator_unit_test)."""

    def test_counts(self):
        ev = StreamEvaluator().gene_eval["mRNA"]
        assert ev.sensitivity() == 1.0 and ev.specificity() == 1.0
        ev.A += 1
        assert ev.sensitivity() == 0.0 and ev.specificity() == 1.0
        ev.P += 1
        assert ev.sensitivity() == 0.0 and ev.specificity() == 0.0
        ev.T += 1
        assert ev.sensitivity() == 1.0 and ev.specificity() == 1.0
