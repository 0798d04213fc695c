"""Declarative quality-rule gate: metric exactness, op semantics,
single-pass dedup, and fail-closed empty/NULL behavior."""

import pytest

from schemasaurus_spark.operators.quality_gate import QualityRule, quality_gate


def _df(spark):
    rows = [
        ("a", 10, "en"),
        ("b", 20, "en"),
        ("c", 30, None),
        ("d", 40, "fr"),
        ("a", None, "fr"),  # duplicate key, NULL num
    ]
    return spark.createDataFrame(rows, "k string, num int, lang string")


def _run(spark, rules, df=None):
    out = quality_gate(df if df is not None else _df(spark), rules)
    return {r["rule_id"]: r.asDict() for r in out.collect()}


def test_metric_values_exact(spark):
    got = _run(
        spark,
        [
            QualityRule("rc", "row_count", "ge", 5),
            QualityRule("nr", "null_rate", "le", 0.5, column="num"),
            QualityRule("dc", "distinct_count", "eq", 4, column="k"),
            QualityRule("dr", "distinct_ratio", "ge", 0.5, column="k"),
            QualityRule("mn", "min", "ge", 10, column="num"),
            QualityRule("mx", "max", "le", 40, column="num"),
            QualityRule("me", "mean", "eq", 25.0, column="num"),
            QualityRule("ml", "max_length", "le", 2, column="lang"),
            QualityRule("mnl", "min_length", "ge", 2, column="lang"),
        ],
    )
    assert got["rc"]["value"] == 5.0 and got["rc"]["passed"]
    assert got["nr"]["value"] == 1 / 5 and got["nr"]["passed"]
    assert got["dc"]["value"] == 4.0 and got["dc"]["passed"]
    assert got["dr"]["value"] == 4 / 5 and got["dr"]["passed"]
    assert got["mn"]["value"] == 10.0 and got["mn"]["passed"]
    assert got["mx"]["value"] == 40.0 and got["mx"]["passed"]
    # mean over non-NULL num: (10+20+30+40)/4
    assert got["me"]["value"] == 25.0 and got["me"]["passed"]
    assert got["ml"]["value"] == 2.0 and got["ml"]["passed"]
    assert got["mnl"]["value"] == 2.0 and got["mnl"]["passed"]


def test_op_semantics_and_between_bounds(spark):
    got = _run(
        spark,
        [
            QualityRule("lt_f", "row_count", "lt", 5),
            QualityRule("gt_f", "row_count", "gt", 5),
            QualityRule("eq_p", "row_count", "eq", 5),
            QualityRule("bt_lo", "row_count", "between", 5, threshold_hi=9),
            QualityRule("bt_hi", "row_count", "between", 1, threshold_hi=5),
            QualityRule("bt_out", "row_count", "between", 6, threshold_hi=9),
        ],
    )
    assert not got["lt_f"]["passed"] and not got["gt_f"]["passed"]
    assert got["eq_p"]["passed"]
    # between is inclusive on BOTH ends
    assert got["bt_lo"]["passed"] and got["bt_hi"]["passed"]
    assert not got["bt_out"]["passed"]


def test_single_aggregate_pass_dedup(spark):
    """N rules over the same metric produce ONE aggregate expression and
    the whole suite stays a single Aggregate node (one scan)."""
    rules = [
        QualityRule(f"r{i}", "null_rate", "le", 0.1 * i, column="num")
        for i in range(1, 8)
    ] + [QualityRule("rc", "row_count", "ge", 1)]
    out = quality_gate(_df(spark), rules)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1
    got = {r["rule_id"]: r for r in out.collect()}
    assert len(got) == 8
    # 0.2 rate: r1 (<=0.1) fails, r2.. pass
    assert not got["r1"]["passed"] and got["r2"]["passed"]


def test_fail_closed_on_empty_and_all_null(spark):
    empty = _df(spark).limit(0)
    got = _run(
        spark,
        [
            QualityRule("nr", "null_rate", "le", 1.0, column="num"),
            QualityRule("mn", "min", "ge", -1e9, column="num"),
            QualityRule("rc", "row_count", "ge", 0),
        ],
        df=empty,
    )
    assert got["nr"]["value"] is None and got["nr"]["passed"] is False
    assert got["mn"]["value"] is None and got["mn"]["passed"] is False
    # row_count is measurable on an empty table
    assert got["rc"]["value"] == 0.0 and got["rc"]["passed"]

    allnull = _df(spark).selectExpr("k", "CAST(NULL AS INT) AS num", "lang")
    got2 = _run(
        spark,
        [QualityRule("mx", "max", "le", 100, column="num")],
        df=allnull,
    )
    assert got2["mx"]["value"] is None and got2["mx"]["passed"] is False


def test_approx_distinct_within_rsd(spark):
    df = spark.range(0, 2000).selectExpr("CAST(id AS STRING) AS k")
    got = _run(
        spark,
        [QualityRule("ad", "approx_distinct", "between", 1800, column="k", threshold_hi=2200)],
        df=df,
    )
    assert got["ad"]["passed"], got["ad"]


def test_spec_validation(spark):
    with pytest.raises(ValueError, match="unknown op"):
        QualityRule("x", "row_count", "??", 1)
    with pytest.raises(ValueError, match="threshold_hi"):
        QualityRule("x", "row_count", "between", 1)
    with pytest.raises(ValueError, match="takes no column"):
        QualityRule("x", "row_count", "le", 1, column="k")
    with pytest.raises(ValueError, match="needs a column"):
        QualityRule("x", "null_rate", "le", 1)
    with pytest.raises(ValueError, match="unknown metric"):
        QualityRule("x", "median", "le", 1, column="k")
    with pytest.raises(ValueError, match="duplicate rule_ids"):
        quality_gate(_df(spark), [QualityRule("a", "row_count", "le", 1)] * 2)
    with pytest.raises(ValueError, match="empty rule suite"):
        quality_gate(_df(spark), [])


def test_load_rules_roundtrip_and_validation():
    from schemasaurus_spark.operators.quality_gate import load_rules

    rules = load_rules(
        [
            {"rule_id": "a", "metric": "row_count", "op": "ge", "threshold": 1},
            {
                "rule_id": "b",
                "metric": "null_rate",
                "op": "between",
                "threshold": 0,
                "threshold_hi": 0.5,
                "column": "x",
            },
        ]
    )
    assert [r.rule_id for r in rules] == ["a", "b"]
    with pytest.raises(ValueError, match="JSON list"):
        load_rules({"rule_id": "a"})
    with pytest.raises(ValueError, match="unknown keys"):
        load_rules([{"rule_id": "a", "metric": "row_count", "op": "ge", "threshold": 1, "extra": 2}])
    with pytest.raises(ValueError, match="missing keys"):
        load_rules([{"rule_id": "a"}])
    with pytest.raises(ValueError, match="unknown metric"):
        load_rules([{"rule_id": "a", "metric": "p99", "op": "ge", "threshold": 1, "column": "x"}])


def test_snapshot_gate_matches_scan_path_and_rejects_unsupported(spark):
    from schemasaurus_spark.operators.quality_gate import snapshot_gate
    from schemasaurus_spark.operators.snapshot import SnapshotSpec, compute_snapshot

    df = _df(spark)
    snap = compute_snapshot(df, SnapshotSpec(numeric=("num",), categorical=("lang",)))
    rules = [
        QualityRule("rc", "row_count", "ge", 5),
        QualityRule("nr", "null_rate", "le", 0.5, column="num"),
        QualityRule("mn", "min", "ge", 10, column="num"),
        QualityRule("mx", "max", "le", 40, column="num"),
        QualityRule("ad", "approx_distinct", "between", 2, column="lang", threshold_hi=6),
        QualityRule("adr", "approx_distinct_ratio", "le", 1.0, column="lang"),
    ]
    got = {r["rule_id"]: r.asDict() for r in snapshot_gate(spark, snap, rules).collect()}
    scan = {r["rule_id"]: r.asDict() for r in quality_gate(df, rules).collect()}
    # deterministic metrics agree EXACTLY with the scan path
    for rid in ("rc", "nr", "mn", "mx"):
        assert got[rid]["value"] == scan[rid]["value"], rid
        assert got[rid]["passed"] == scan[rid]["passed"], rid
    # sketch metrics: tiny cardinality -> HLL is exact in practice (NULLs
    # excluded by the sketch, same as approx_count_distinct); gate passes
    assert got["ad"]["value"] == 2.0 and got["ad"]["passed"]  # {en, fr}
    assert got["adr"]["passed"]
    # schema identical to the scan path (modulo nullability flags)
    shape = lambda d: [(f.name, f.dataType) for f in d.schema.fields]  # noqa: E731
    assert shape(snapshot_gate(spark, snap, rules)) == shape(quality_gate(df, rules))

    import pytest as _pytest

    with _pytest.raises(ValueError, match="cannot answer"):
        snapshot_gate(spark, snap, [QualityRule("x", "mean", "le", 1, column="num")])
    with _pytest.raises(ValueError, match="does not track"):
        snapshot_gate(spark, snap, [QualityRule("x", "null_rate", "le", 1, column="k")])
    with _pytest.raises(ValueError, match="non-numeric"):
        snapshot_gate(spark, snap, [QualityRule("x", "min", "ge", 0, column="lang")])


def test_drift_gate_thresholds_and_fail_closed():
    from schemasaurus_spark.operators.quality_gate import drift_gate

    report = [
        {
            "column": "value",
            "test": "ks",
            "statistic": 0.30,
            "psi": 0.25,
            "p_value": 0.001,
            "drifted": True,
            "null_rate_base": 0.01,
            "null_rate_cur": 0.05,
            "distinct_base": 100.0,
            "distinct_cur": 150.0,
        }
    ]
    rules = [
        QualityRule("ks_cap", "statistic", "le", 0.2, column="value"),
        QualityRule("psi_cap", "psi", "le", 0.3, column="value"),
        QualityRule("p_floor", "p_value", "ge", 0.05, column="value"),
        QualityRule("nulls_stable", "null_rate_delta", "le", 0.05, column="value"),
        QualityRule("card_band", "distinct_ratio_change", "between", 0.5, column="value", threshold_hi=2.0),
        QualityRule("untracked", "psi", "le", 1.0, column="ghost"),
    ]
    got = {r["rule_id"]: r for r in drift_gate(report, rules)}
    assert not got["ks_cap"]["passed"] and got["ks_cap"]["value"] == 0.30
    assert got["psi_cap"]["passed"]
    assert not got["p_floor"]["passed"]
    assert got["nulls_stable"]["passed"] and abs(got["nulls_stable"]["value"] - 0.04) < 1e-12
    assert got["card_band"]["passed"] and got["card_band"]["value"] == 1.5
    # a column that fell out of monitoring fails closed
    assert got["untracked"]["value"] is None and got["untracked"]["passed"] is False

    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-drift metrics"):
        drift_gate(report, [QualityRule("x", "null_rate", "le", 1, column="value")])


def test_drift_gate_over_real_report_and_scan_path_rejects_drift_metrics(spark):
    from schemasaurus_spark.operators.quality_gate import drift_gate
    from schemasaurus_spark.operators.snapshot import (
        SnapshotSpec,
        compute_snapshot,
        drift_vs_snapshot,
    )

    spec = SnapshotSpec(numeric=("v",), n_bins=32)
    base_df = spark.range(0, 2000).selectExpr("CAST(id % 100 AS DOUBLE) AS v")
    snap = compute_snapshot(base_df, spec)
    shifted = spark.range(0, 2000).selectExpr("CAST(id % 100 + 50 AS DOUBLE) AS v")
    report = drift_vs_snapshot(shifted, snap, spec)
    got = {
        r["rule_id"]: r
        for r in drift_gate(
            report,
            [
                QualityRule("ks_cap", "statistic", "le", 0.1, column="v"),
                QualityRule("psi_cap", "psi", "le", 0.1, column="v"),
            ],
        )
    }
    # a +50 shift on a 0..99 grid is gross drift: both rules must trip
    assert not got["ks_cap"]["passed"] and not got["psi_cap"]["passed"]

    with pytest.raises(ValueError, match="drift metrics"):
        quality_gate(base_df, [QualityRule("x", "psi", "le", 1, column="v")])
