"""Confusion-matrix reporting parity with the reference's
fences/core/util.py ConfusionMatrix (accuracy :142-146,
balanced_accuracy :148-153, table layout :94-103, ASCII renderer
:10-41)."""

from fences_spark.report import ConfusionCounts, render_latex, render_table


def test_metrics_match_reference_formulas():
    c = ConfusionCounts(valid_accepted=8, valid_rejected=2,
                        invalid_accepted=1, invalid_rejected=9)
    assert c.total() == 20
    assert c.accuracy() == (8 + 9) / 20
    assert c.balanced_accuracy() == ((8 / 10) + (9 / 10)) / 2
    assert not c.is_diagonal()
    assert ConfusionCounts(5, 0, 0, 7).is_diagonal()


def test_empty_and_one_class_edge_cases():
    assert ConfusionCounts(0, 0, 0, 0).accuracy() == 0.0
    assert ConfusionCounts(0, 0, 0, 0).balanced_accuracy() == 0.0
    # one class empty → balanced accuracy 0 (reference :151-152)
    assert ConfusionCounts(3, 1, 0, 0).balanced_accuracy() == 0.0


def test_merge_is_the_iadd_analog():
    a = ConfusionCounts(1, 2, 3, 4)
    b = ConfusionCounts(10, 20, 30, 40)
    assert a + b == ConfusionCounts(11, 22, 33, 44)


def test_ascii_table_layout():
    lines = render_table(ConfusionCounts(8, 2, 1, 9).to_table())
    assert lines[0].split("|")[1].strip() == "Valid"
    assert lines[1] == "-" * len(lines[0])
    assert lines[2].startswith("Accepted")
    acc = [c.strip() for c in lines[2].split("|")]
    assert acc[1:] == ["8", "1", "9"]
    tot = [c.strip() for c in lines[5].split("|")]
    assert tot[1:] == ["10", "10", "20"]
    # all value lines share one width (column alignment)
    assert len({len(ln) for ln in lines}) == 1


def test_latex_table():
    lines = render_latex(ConfusionCounts(1, 0, 0, 1).to_table())
    assert lines[0] == "\\begin{tabular}{llll}"
    assert lines[-1] == "\\end{tabular}"
    assert lines.count("\\hline") == 2
    assert any(ln.startswith("Accepted & 1 & 0 & 1") for ln in lines)


def test_from_confusion_dataframe(spark):
    from fences_spark.compiler.ruleset import RuleSet

    df = spark.createDataFrame(
        [(True, "ok"), (True, "ok"), (False, "")],
        "truth boolean, s string",
    )
    res = RuleSet().add("nonempty", "s", {"type": "string", "minLength": 1}).apply(df)
    c = ConfusionCounts.from_row(res.confusion("truth").first())
    assert c == ConfusionCounts(2, 0, 0, 1)
    assert c.is_diagonal()
