"""Misra-Gries heavy hitters (operators/heavy.py): exactness vs the
plain groupBy across partitionings (the MG + pigeonhole + verify chain
must never lose a true heavy hitter), threshold strictness, and the
bounded-state trim path."""

import random

from pyspark.sql import functions as F

from schemasaurus_spark.operators.heavy import heavy_hitters


def _truth(items, k):
    n = len(items)
    from collections import Counter

    return {(t, c) for t, c in Counter(items).items() if c * k > n}


def _got(spark, items, k, parts):
    df = spark.createDataFrame([(t,) for t in items], "v string").repartition(parts)
    return {(r.item, r.cnt) for r in heavy_hitters(df, "v", k).collect()}


def test_exact_vs_brute_force_across_partitionings(spark):
    rng = random.Random(7)
    # zipf-ish: few hot items + a long unique tail (the MG trim fires
    # constantly: domain >> k)
    items = (
        ["hot_a"] * 400 + ["hot_b"] * 250 + ["warm"] * 90
        + [f"tail_{i}" for i in range(1200)]
    )
    rng.shuffle(items)
    for k in (4, 10, 40):
        want = _truth(items, k)
        for parts in (1, 3, 32):
            assert _got(spark, items, k, parts) == want, (k, parts)


def test_threshold_is_strict(spark):
    # 4 items x 25 each, n=100, k=4: cnt*k == n exactly -> NOT a hitter
    items = ["a"] * 25 + ["b"] * 25 + ["c"] * 25 + ["d"] * 25
    assert _got(spark, items, 4, 8) == set()
    # k=5: 25*5 > 100 -> all four qualify
    assert _got(spark, items, 5, 8) == {("a", 25), ("b", 25), ("c", 25), ("d", 25)}


def test_nulls_and_empty(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",), (None,)], "v string")
    got = {(r.item, r.cnt) for r in heavy_hitters(df, "v", 2).collect()}
    assert got == {("a", 2)}  # NULLs excluded from items AND from n
    empty = spark.createDataFrame([], "v string")
    assert heavy_hitters(empty, "v", 3).count() == 0


def test_k_validation(spark):
    df = spark.createDataFrame([("a",)], "v string")
    try:
        heavy_hitters(df, "v", 1)
        assert False
    except ValueError:
        pass
