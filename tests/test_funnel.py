"""Event funnel (operators/funnel.py): strict-order semantics, horizon
cut, earliest-completion path, repeated events, and contract parity."""

from datetime import datetime

import pytest

from schemasaurus_spark.operators.funnel import funnel


def _ts(day, hour=0):
    return datetime(2024, 1, day, hour)


def _run(spark, rows, steps, horizon=None):
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = funnel(df, steps, horizon_seconds=horizon).collect()
    return {r["step"]: (r["event_type"], r["n_users"], r["conv_from_prev"], r["conv_from_first"]) for r in out}


def test_strict_order_required(spark):
    rows = [
        (1, "a", _ts(1)), (1, "b", _ts(2)),          # completes a->b
        (2, "b", _ts(1)), (2, "a", _ts(2)),          # b BEFORE a: no conversion
        (3, "a", _ts(1)), (3, "b", _ts(1)),          # same instant: strict > fails
    ]
    got = _run(spark, rows, ["a", "b"])
    assert got[1] == ("a", 3, None, 1.0)
    assert got[2] == ("b", 1, round(1 / 3, 6), round(1 / 3, 6))


def test_earliest_completion_path(spark):
    # user does a@d1, b@d2, a@d5 — t1 must be d1 (the earliest), so b@d2 counts
    rows = [(1, "a", _ts(1)), (1, "b", _ts(2)), (1, "a", _ts(5))]
    got = _run(spark, rows, ["a", "b"])
    assert got[2][1] == 1


def test_horizon_cut(spark):
    rows = [
        (1, "a", _ts(1)), (1, "b", _ts(2)),   # within 2 days
        (2, "a", _ts(1)), (2, "b", _ts(10)),  # outside 2-day horizon
    ]
    got = _run(spark, rows, ["a", "b"], horizon=2 * 24 * 3600)
    assert got[1][1] == 2 and got[2][1] == 1


def test_horizon_counts_from_first_step(spark):
    # a@d1, b@d2, c@d4 with 2-day horizon: c is >2d after a even though <2d after b
    rows = [(1, "a", _ts(1)), (1, "b", _ts(2)), (1, "c", _ts(4))]
    got = _run(spark, rows, ["a", "b", "c"], horizon=2 * 24 * 3600)
    assert got[2][1] == 1 and got[3][1] == 0


def test_three_step_chain_uses_step2_time(spark):
    # c occurs AFTER a but BEFORE b: must not count
    rows = [(1, "a", _ts(1)), (1, "c", _ts(2)), (1, "b", _ts(3))]
    got = _run(spark, rows, ["a", "b", "c"])
    assert got[3][1] == 0


def test_rejects_single_step(spark):
    df = spark.createDataFrame([(1, "a", _ts(1))], "user_id long, event_type string, ts timestamp")
    with pytest.raises(ValueError):
        funnel(df, ["a"])


def test_contract_query_matches_oracle(spark):
    import duckdb

    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.001"
    sdf = entrymod.event_funnel(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    odf = con.sql(entrymod._FUNNEL_ORACLE).df()
    cols = ["step", "event_type", "n_users", "conv_from_prev", "conv_from_first"]
    key = lambda d: sorted(
        tuple(None if v != v else v for v in row) for row in d[cols].values.tolist()
    )
    assert key(sdf) == key(odf)
    assert len(sdf) == 3
