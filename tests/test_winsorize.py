"""Exact order-statistic winsorization (outliers.winsorize): ungrouped
and grouped closed forms, tie handling, NULL passthrough, rank edge
clamps, validation, partition invariance."""

import pytest

from schemasaurus_spark.operators.outliers import winsor_bounds, winsorize


def test_ungrouped_closed_form(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "id long, v double"
    )
    b = winsor_bounds(df, "v", lo_bp=500, hi_bp=9500).collect()[0]
    # k = ceil(100 * 500 / 10000) = 5 -> 5th smallest; hi -> 95th
    assert (b["lo"], b["hi"], b["n"]) == (5.0, 95.0, 100)
    got = {r["id"]: r for r in winsorize(df, "v", lo_bp=500, hi_bp=9500).collect()}
    assert got[1]["v_w"] == 5.0 and got[1]["winsor_side"] == "low"
    assert got[4]["v_w"] == 5.0
    assert got[5]["v_w"] == 5.0 and got[5]["winsor_side"] is None
    assert got[96]["v_w"] == 95.0 and got[96]["winsor_side"] == "high"
    assert got[50]["v_w"] == 50.0 and got[50]["winsor_side"] is None


def test_grouped_bounds_and_ties(spark):
    rows = [("a", float(v)) for v in [1, 1, 1, 2, 3, 100]] + [
        ("b", float(v)) for v in [10, 20, 30, 40]
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    b = {r["g"]: r for r in winsor_bounds(df, "v", ["g"], 2000, 8000).collect()}
    # group a: n=6, rank_lo = ceil(6*0.2) = 2 -> 2nd smallest = 1 (tie mass),
    # rank_hi = ceil(6*0.8) = 5 -> 3
    assert (b["a"]["lo"], b["a"]["hi"]) == (1.0, 3.0)
    # group b: n=4, rank_lo = ceil(0.8)=1 -> 10, rank_hi = ceil(3.2)=4 -> 40
    assert (b["b"]["lo"], b["b"]["hi"]) == (10.0, 40.0)
    got = winsorize(df, "v", ["g"], 2000, 8000).collect()
    a100 = [r for r in got if r["g"] == "a" and r["v"] == 100.0][0]
    assert a100["v_w"] == 3.0 and a100["winsor_side"] == "high"


def test_null_passthrough_and_edges(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 9.0)], "id long, v double"
    )
    got = {r["id"]: r for r in winsorize(df, "v", lo_bp=0, hi_bp=10000).collect()}
    # bp 0/10000 -> bounds are min/max: nothing clamps
    assert got[1]["v_w"] == 5.0 and got[1]["winsor_side"] is None
    assert got[3]["v_w"] == 9.0
    assert got[2]["v_w"] is None and got[2]["winsor_side"] is None


def test_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError):
        winsor_bounds(df, "v", lo_bp=9000, hi_bp=100)
    with pytest.raises(ValueError):
        winsor_bounds(df, "v", lo_bp=-1)


def test_partition_invariance(spark):
    rows = [(i, "g" + str(i % 3), float((i * 37) % 101)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    a = sorted(
        winsorize(df, "v", ["g"]).collect(), key=lambda r: r["id"]
    )
    b = sorted(
        winsorize(df.repartition(7, "id"), "v", ["g"]).collect(),
        key=lambda r: r["id"],
    )
    assert a == b


def test_percentile_bands_hand_computed(spark):
    import pytest as _pytest

    from schemasaurus_spark.operators.outliers import percentile_bands

    rows = [("a", float(v)) for v in range(1, 101)] + [("b", 7.0), ("b", 9.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r.g: r.asDict()
        for r in percentile_bands(
            df, "v", ["g"], qs_bp=(5000, 9500, 9900)
        ).collect()
    }
    # group a: 1..100 -> p50 = 50th smallest = 50, p95 = 95, p99 = 99
    assert got["a"] == {"g": "a", "p5000": 50.0, "p9500": 95.0,
                        "p9900": 99.0, "n": 100}
    # group b: n=2 -> k(50%) = 1 -> 7.0; k(95%/99%) = 2 -> 9.0
    assert got["b"] == {"g": "b", "p5000": 7.0, "p9500": 9.0,
                        "p9900": 9.0, "n": 2}
    # ungrouped + duplicate values
    dup = spark.createDataFrame(
        [(float(v),) for v in [1, 1, 1, 1, 9]], "v double"
    )
    one = percentile_bands(dup, "v", qs_bp=(5000, 10000)).first()
    assert (one.p5000, one.p10000, one.n) == (1.0, 9.0, 5)
    with _pytest.raises(ValueError):
        percentile_bands(df, "v", qs_bp=(5000, 5000))
    with _pytest.raises(ValueError):
        percentile_bands(df, "v", qs_bp=(10001,))
    # partition invariance
    base = sorted(map(tuple, percentile_bands(df, "v", ["g"]).collect()))
    re7 = sorted(
        map(tuple, percentile_bands(df.repartition(7, "g"), "v", ["g"]).collect())
    )
    assert base == re7
