"""Evaluation harness (operators/evaluate.py): hand-computed PR sweep
including ties, AUC closed forms (perfect / inverted / all-tied /
hand-interleaved / degenerate single-class), and NULL exclusion."""

from schemasaurus_spark.operators.evaluate import auc_exact, pr_curve


def _df(spark, rows):
    return spark.createDataFrame(rows, "score bigint, label boolean")


def test_pr_curve_hand_computed_with_ties(spark):
    # scores desc: 9(pos), 7(pos,neg), 5(neg), 3(pos)
    rows = [(9, True), (7, True), (7, False), (5, False), (3, True)]
    got = {r.threshold: r for r in pr_curve(_df(spark, rows), "score", "label").collect()}
    assert set(got) == {9, 7, 5, 3}
    r9 = got[9]
    assert (r9.tp, r9.fp, r9.fn) == (1, 0, 2)
    assert (r9.precision, r9.recall) == (1.0, round(1 / 3, 6))
    r7 = got[7]
    assert (r7.tp, r7.fp, r7.fn) == (2, 1, 1)
    assert (r7.precision, r7.recall) == (round(2 / 3, 6), round(2 / 3, 6))
    assert r7.f1 == round(2 * (2 / 3) * (2 / 3) / (2 / 3 + 2 / 3), 6)
    r3 = got[3]
    assert (r3.tp, r3.fp, r3.fn) == (3, 2, 0)
    assert r3.recall == 1.0


def test_pr_curve_zero_tp_rows_have_null_f1(spark):
    rows = [(10, False), (1, True)]
    got = {r.threshold: r for r in pr_curve(_df(spark, rows), "score", "label").collect()}
    assert got[10].precision == 0.0 and got[10].f1 is None
    assert got[1].precision == 0.5 and got[1].recall == 1.0


def test_auc_perfect_and_inverted(spark):
    perfect = [(10, True), (9, True), (2, False), (1, False)]
    inverted = [(s, not l) for s, l in perfect]
    assert auc_exact(_df(spark, perfect), "score", "label").collect()[0].auc == 1.0
    assert auc_exact(_df(spark, inverted), "score", "label").collect()[0].auc == 0.0


def test_auc_all_tied_is_half(spark):
    rows = [(5, True), (5, False), (5, True), (5, False)]
    r = auc_exact(_df(spark, rows), "score", "label").collect()[0]
    assert r.auc == 0.5 and r.n_pos == 2 and r.n_neg == 2


def test_auc_hand_computed_interleaved(spark):
    # pos scores {8, 4}, neg scores {6, 2}: pairs (8>6),(8>2),(4<6),(4>2)
    # -> 3 of 4 wins -> AUC 0.75
    rows = [(8, True), (6, False), (4, True), (2, False)]
    assert auc_exact(_df(spark, rows), "score", "label").collect()[0].auc == 0.75


def test_auc_tie_counts_half(spark):
    # pos {8, 4}, neg {4, 2}: (8>4),(8>2),(4=4 half),(4>2) -> 3.5/4
    rows = [(8, True), (4, False), (4, True), (2, False)]
    assert auc_exact(_df(spark, rows), "score", "label").collect()[0].auc == 0.875


def test_auc_single_class_is_null(spark):
    rows = [(8, True), (4, True)]
    r = auc_exact(_df(spark, rows), "score", "label").collect()[0]
    assert r.auc is None and r.n_pos == 2 and r.n_neg == 0


def test_null_rows_excluded(spark):
    rows = [(8, True), (None, True), (4, None), (2, False)]
    r = auc_exact(_df(spark, rows), "score", "label").collect()[0]
    assert r.n_pos == 1 and r.n_neg == 1 and r.auc == 1.0
    sweep = pr_curve(_df(spark, rows), "score", "label").collect()
    assert {x.threshold for x in sweep} == {8, 2}


def test_calibration_table_closed_form(spark):
    from schemasaurus_spark.operators.evaluate import calibration_table

    df = spark.createDataFrame(
        [(10, True), (20, False), (30, True), (40, True), (50, False), (60, True)],
        "score long, label boolean",
    )
    got = {
        r["bin"]: r for r in calibration_table(df, "score", "label", n_bins=3).collect()
    }
    assert set(got) == {0, 1, 2}
    assert (got[0]["n"], got[0]["n_pos"], got[0]["pos_rate_bp"]) == (2, 1, 5000)
    assert (got[0]["score_min"], got[0]["score_max"]) == (10, 20)
    assert (got[1]["n"], got[1]["n_pos"], got[1]["pos_rate_bp"]) == (2, 2, 10000)
    assert (got[2]["n"], got[2]["n_pos"], got[2]["pos_rate_bp"]) == (2, 1, 5000)


def test_calibration_tie_group_never_splits(spark):
    from schemasaurus_spark.operators.evaluate import calibration_table

    df = spark.createDataFrame(
        [(1, True), (1, False), (1, True), (2, False)],
        "score long, label boolean",
    )
    got = {
        r["bin"]: r for r in calibration_table(df, "score", "label", n_bins=2).collect()
    }
    # the 3-row tie group at score 1 stays whole in bin 0
    assert (got[0]["n"], got[0]["n_pos"]) == (3, 2)
    assert (got[1]["n"], got[1]["n_pos"]) == (1, 0)
    assert got[0]["pos_rate_bp"] == 6666  # 20000 DIV 3


def test_calibration_null_exclusion_and_validation(spark):
    import pytest as _pytest

    from schemasaurus_spark.operators.evaluate import calibration_table

    df = spark.createDataFrame(
        [(1, True), (None, True), (2, None)],
        "score long, label boolean",
    )
    rows = calibration_table(df, "score", "label", n_bins=1).collect()
    assert len(rows) == 1 and rows[0]["n"] == 1
    with _pytest.raises(ValueError):
        calibration_table(df, "score", "label", n_bins=0)
