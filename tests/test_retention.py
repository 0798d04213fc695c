"""Retention cohorts (operators/retention.py): closed-form matrix on a
planted timeline, distinct-week semantics, week-boundary truncation,
and contract-vs-oracle parity."""

from datetime import datetime

from schemasaurus_spark.operators.retention import retention_cohorts


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def _run(spark, rows):
    out = retention_cohorts(_ev(spark, rows)).collect()
    return {
        (str(r["cohort_week"]), r["weeks_since"]): (
            r["n_active"],
            r["cohort_size"],
            r["retention"],
        )
        for r in out
    }


# 2024-01-01 is a Monday: week boundaries land exactly on it
W0, W1, W2 = datetime(2024, 1, 1), datetime(2024, 1, 8), datetime(2024, 1, 15)


def test_closed_form_matrix(spark):
    rows = [
        (1, W0), (1, W1), (1, W2),        # cohort W0, active weeks 0,1,2
        (2, W0), (2, W2),                 # cohort W0, active 0,2 (skips 1)
        (3, W1),                          # cohort W1, active 0 only
    ]
    got = _run(spark, rows)
    assert got == {
        ("2024-01-01 00:00:00", 0): (2, 2, 1.0),
        ("2024-01-01 00:00:00", 1): (1, 2, 0.5),
        ("2024-01-01 00:00:00", 2): (2, 2, 1.0),
        ("2024-01-08 00:00:00", 0): (1, 1, 1.0),
    }


def test_multiple_events_one_week_count_once(spark):
    rows = [(1, datetime(2024, 1, 2)), (1, datetime(2024, 1, 3)), (1, datetime(2024, 1, 6))]
    got = _run(spark, rows)
    assert got == {("2024-01-01 00:00:00", 0): (1, 1, 1.0)}


def test_sunday_belongs_to_monday_week(spark):
    # Sunday 2024-01-07 truncates to Monday 2024-01-01
    rows = [(1, datetime(2024, 1, 1)), (1, datetime(2024, 1, 7, 23))]
    got = _run(spark, rows)
    assert got == {("2024-01-01 00:00:00", 0): (1, 1, 1.0)}


def test_contract_query_matches_oracle(spark):
    import duckdb

    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.001"
    sdf = entrymod.event_retention(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    odf = con.sql(entrymod._RETENTION_ORACLE).df()
    cols = ["cohort_week", "weeks_since", "n_active", "cohort_size", "retention"]
    key = lambda d: sorted(
        tuple(str(v) for v in row) for row in d[cols].values.tolist()
    )
    assert key(sdf) == key(odf)
    assert len(sdf) > 0
