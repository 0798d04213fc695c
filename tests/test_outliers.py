"""IQR outlier detection (operators/outliers.py): hand-computed fences,
per-group isolation, NULL/constant-group edges, approx path shape."""

from schemasaurus_spark.operators.outliers import iqr_fences, iqr_outliers


def test_fences_and_flags_hand_computed(spark):
    # values 1..9 in group g: q1=3, q3=7, iqr=4 -> fences [-3, 13]
    rows = [("g", float(v)) for v in range(1, 10)]
    rows += [("g", -10.0), ("g", 20.0)]  # planted outliers
    df = spark.createDataFrame(rows, "grp string, v double")
    f = {r.grp: r for r in iqr_fences(df, "v", ["grp"]).collect()}
    # q1/q3 shift slightly with the planted rows: 11 values sorted
    # [-10,1..9,20]: q1 = 2.5, q3 = 7.5, iqr = 5 -> [-5, 15]
    assert (f["g"].q1, f["g"].q3, f["g"].lo, f["g"].hi) == (2.5, 7.5, -5.0, 15.0)
    out = iqr_outliers(df, "v", ["grp"]).collect()
    assert {(r.v, r.side, r.fence) for r in out} == {
        (-10.0, "low", -5.0),
        (20.0, "high", 15.0),
    }


def test_groups_isolated_and_nulls_skipped(spark):
    rows = [("a", float(v)) for v in range(100)] + [("b", 1000.0 + v) for v in range(100)]
    rows += [("a", 1000.0), ("b", 0.0), ("a", None)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = iqr_outliers(df, "v", ["grp"]).collect()
    got = {(r.grp, r.v, r.side) for r in out}
    assert got == {("a", 1000.0, "high"), ("b", 0.0, "low")}


def test_constant_group_and_global_mode(spark):
    df = spark.createDataFrame(
        [(5.0,)] * 10 + [(6.0,)], "v double"
    )
    out = iqr_outliers(df, "v").collect()  # global (no group cols)
    assert {(r.v, r.side) for r in out} == {(6.0, "high")}


def test_approx_path_runs(spark):
    rows = [("a", float(v)) for v in range(1000)] + [("a", 1e9)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = iqr_outliers(df, "v", ["grp"], approx=True).collect()
    assert any(r.v == 1e9 and r.side == "high" for r in out)
