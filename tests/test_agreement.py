"""Cohen's kappa agreement (evaluate.agreement_report): exact-arithmetic
checks against hand-computed contingency tables."""

from schemasaurus_spark.operators.evaluate import agreement_report

SCHEMA = "label string, predicted string"


def _report(spark, rows):
    return agreement_report(spark.createDataFrame(rows, SCHEMA)).collect()[0]


def test_hand_computed_kappa(spark):
    # classic 2x2: a=20 agree-yes, d=15 agree-no, b=5, c=10 (n=50)
    rows = (
        [("y", "y")] * 20 + [("n", "n")] * 15 + [("y", "n")] * 5 + [("n", "y")] * 10
    )
    r = _report(spark, rows)
    assert (r.n, r.n_agree, r.po_bp) == (50, 35, 7000)
    # margA: y=25, n=25; margB: y=30, n=20 -> pe_num = 25*30 + 25*20 = 1250
    # kappa = (50*35 - 1250) / (2500 - 1250) = 500/1250 = 0.4
    assert r.kappa == 0.4


def test_perfect_agreement(spark):
    r = _report(spark, [("a", "a")] * 3 + [("b", "b")] * 4)
    assert r.po_bp == 10000 and r.kappa == 1.0


def test_independent_raters_near_zero(spark):
    # rater B says 'y' regardless: po == pe exactly -> kappa 0
    rows = [("y", "y")] * 6 + [("n", "y")] * 4
    r = _report(spark, rows)
    assert r.kappa == 0.0


def test_both_constant_is_undefined(spark):
    r = _report(spark, [("y", "y")] * 5)
    assert r.po_bp == 10000 and r.kappa is None


def test_disjoint_label_sets_zero_pe(spark):
    # raters never use the same category: pe_num = 0, po = 0
    r = _report(spark, [("a", "b"), ("a", "c")])
    assert (r.n_agree, r.po_bp, r.kappa) == (0, 0, 0.0)


def test_null_judgments_excluded(spark):
    rows = [("y", "y"), ("y", None), (None, "n"), (None, None)]
    r = _report(spark, rows)
    assert (r.n, r.n_agree) == (1, 1)


def test_partition_invariance(spark):
    rows = ([("y", "y")] * 9 + [("n", "y")] * 3 + [("y", "n")] * 2 + [("n", "n")] * 6)
    df = spark.createDataFrame(rows, SCHEMA)
    a = agreement_report(df).collect()[0]
    b = agreement_report(df.repartition(7)).collect()[0]
    assert tuple(a) == tuple(b)
