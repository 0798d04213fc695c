"""Cross-table coverage report: exact counts under duplicates, NULL keys,
one-sided keys, empty sides; single-shuffle plan shape."""

from schemasaurus_spark.operators.coverage import coverage_report


def _row(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, "k string, x int")
    right = spark.createDataFrame(right_rows, "k string, y int")
    return coverage_report(left, right, "k", **kw).collect()[0].asDict()


def test_counts_with_dups_nulls_and_one_sided_keys(spark):
    left = [("a", 1), ("a", 2), ("b", 1), ("c", 1), (None, 1), (None, 2)]
    right = [("a", 9), ("c", 9), ("c", 8), ("d", 9), (None, 9)]
    got = _row(spark, left, right)
    assert got == {
        "n_left": 6,
        "n_right": 5,
        "n_left_keys": 3,  # a b c
        "n_right_keys": 3,  # a c d
        "n_shared_keys": 2,  # a c
        "n_left_only_keys": 1,  # b
        "n_right_only_keys": 1,  # d
        "n_left_null_rows": 2,
        "n_right_null_rows": 1,
        "left_coverage": 2 / 3,
        "right_coverage": 2 / 3,
    }


def test_full_coverage_and_distinct_key_names(spark):
    left = spark.createDataFrame([("a", 1), ("b", 2)], "k string, x int")
    right = spark.createDataFrame([("a", 1), ("b", 2)], "j string, y int")
    got = coverage_report(left, right, "k", right_key="j").collect()[0]
    assert got["left_coverage"] == 1.0 and got["right_coverage"] == 1.0
    assert got["n_left_only_keys"] == 0 and got["n_right_only_keys"] == 0


def test_empty_sides_give_null_coverage_not_nan(spark):
    got = _row(spark, [], [("a", 1)])
    assert got["n_left"] == 0 and got["n_left_keys"] == 0
    assert got["left_coverage"] is None  # explicit NULL, never NaN
    assert got["right_coverage"] == 0.0
    both = _row(spark, [], [])
    assert both["n_left"] == 0 and both["n_right"] == 0
    assert both["left_coverage"] is None and both["right_coverage"] is None


def test_numeric_keys_cast_consistently(spark):
    left = spark.createDataFrame([(1, 1), (2, 1)], "k int, x int")
    right = spark.createDataFrame([(1, 1), (3, 1)], "k bigint, y int")
    got = coverage_report(left, right, "k").collect()[0]
    assert got["n_shared_keys"] == 1 and got["n_left_only_keys"] == 1


def test_single_key_shuffle_in_plan(spark):
    left = spark.createDataFrame([("a", 1)], "k string, x int")
    right = spark.createDataFrame([("b", 1)], "k string, y int")
    plan = (
        coverage_report(left, right, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one hashpartitioning exchange on the key; the final reduce is a
    # SinglePartition exchange over <=#partitions pre-aggregated rows
    assert plan.count("hashpartitioning") == 1, plan
