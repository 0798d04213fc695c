"""Range-bucketed exact prefix sums (operators/prefix.py): value parity
against a driver-side cumsum in both directions, degenerate shapes, and
the plan-shape guarantee the module exists for — NO partition-less
WindowExec even when the ordering column is a continuous double."""

import random

from pyspark.sql import functions as F

from schemasaurus_spark.operators.prefix import exclusive_prefix


def _expected(rows, ascending):
    """Driver-side exclusive prefix: rows = [(v, a, b)] distinct v."""
    srt = sorted(rows, key=lambda r: r[0], reverse=not ascending)
    out = {}
    ca = cb = 0
    for v, a, b in srt:
        out[v] = (ca, cb)
        ca += a
        cb += b
    return out


def _check(spark, rows, ascending, n_buckets):
    df = spark.createDataFrame(rows, "v double, a long, b long")
    got = {
        r["v"]: (r["_cum_a"], r["_cum_b"])
        for r in exclusive_prefix(
            df, "v", ["a", "b"], ascending=ascending, n_buckets=n_buckets
        ).collect()
    }
    assert got == _expected(rows, ascending)


def test_matches_driver_cumsum_both_directions(spark):
    rng = random.Random(7)
    vals = rng.sample(range(100000), 500)
    rows = [(v / 7.0, rng.randint(0, 9), rng.randint(0, 99)) for v in vals]
    for ascending in (True, False):
        for n_buckets in (1, 4, 64):
            _check(spark, rows, ascending, n_buckets)


def test_degenerate_shapes(spark):
    # single row: exclusive prefix is 0
    _check(spark, [(1.0, 5, 7)], True, 64)
    # fewer rows than buckets
    _check(spark, [(float(i), i, 1) for i in range(5)], False, 64)
    # empty input -> empty output with the cum columns present
    df = spark.createDataFrame([], "v double, a long, b long")
    out = exclusive_prefix(df, "v", ["a", "b"])
    assert {"_cum_a", "_cum_b"} <= set(out.columns)
    assert out.count() == 0


def test_no_partitionless_window_on_continuous_signal(spark):
    """The round-4 cliff: a continuous double signal used to serialize
    through one task.  The plan must contain Window nodes ONLY with a
    partition spec (3 top-level bracket groups) and no SinglePartition
    exchange feeding a sort."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.plan_lint import _global_window_count
    from schemasaurus_spark.operators.fuse import fuse_rank_scores
    from schemasaurus_spark.operators.evaluate import pr_curve, auc_exact

    rng = random.Random(11)
    df = spark.createDataFrame(
        [
            (str(i), rng.random(), rng.random(), rng.random() > 0.5)
            for i in range(300)
        ],
        "doc_id string, s1 double, s2 double, label boolean",
    ).cache()
    for frame in (
        fuse_rank_scores(df, {"s1": 2, "s2": 1}),
        pr_curve(df, "s1", "label"),
        auc_exact(df, "s1", "label"),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert _global_window_count(plan) == 0, plan
    df.unpersist()


def test_fuse_still_exact_on_continuous_doubles(spark):
    """End-to-end: midrank bp on a continuous signal matches the
    closed-form midrank computed driver-side."""
    rng = random.Random(3)
    rows = [(str(i), rng.random()) for i in range(200)]
    from schemasaurus_spark.operators.fuse import rank_bp

    df = spark.createDataFrame(rows, "doc_id string, s double")
    got = {r["doc_id"]: r["s_bp"] for r in rank_bp(df, "s").collect()}
    n = len(rows)
    order = sorted(rows, key=lambda r: r[1])
    for idx, (doc, _v) in enumerate(order):
        # distinct values: n_lt = idx, n_eq = 1
        assert got[doc] == ((2 * idx + 1 - 1) * 5000) // (n - 1)
