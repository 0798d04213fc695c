"""Sessionization: gaps-and-islands batch operator vs ``F.session_window``.

Two independent implementations of the same semantics — the lag-based
window pass (operators/sessionize.py) and Spark's native session windows
(streaming/window_stream.session_counts) — must produce row-identical
sessions, including at the exact-gap boundary (which merges: verified
Spark behavior, see sessionize.py module doc).  The streaming path is
additionally checked for watermark-driven emission and late-row drops.
"""

from pyspark.sql import functions as F

from schemasaurus_spark.operators.sessionize import assign_sessions, session_stats
from schemasaurus_spark.streaming.window_stream import (
    session_counts,
    stream_session_counts,
)

SESSION_COLS = ["user_id", "session_start", "session_end", "n_events", "sum_value"]


def _user_events(spark, rows):
    """rows: (event_id, user_id, ts_str, value)"""
    return (
        spark.createDataFrame(rows, ["event_id", "user_id", "ts_s", "value"])
        .select(
            "event_id",
            "user_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "value",
        )
        .coalesce(1)
    )


def test_exact_gap_boundary_merges_and_one_microsecond_over_splits(spark):
    df = _user_events(
        spark,
        [
            (1, 1, "2024-01-01 00:00:00", 1.0),
            (2, 1, "2024-01-01 00:30:00", 1.0),  # exactly gap apart: SAME session
            (3, 2, "2024-01-01 00:00:00", 1.0),
            (4, 2, "2024-01-01 00:30:00.000001", 1.0),  # 1 µs over: splits
        ],
    )
    got = {
        (r.user_id, r.session_seq): r.n_events
        for r in session_stats(df, 1800).collect()
    }
    assert got == {(1, 1): 2, (2, 1): 1, (2, 2): 1}

    sw = {
        (r.user_id, str(r.session_start)): r.n_events
        for r in session_counts(df, "30 minutes").collect()
    }
    assert sw == {
        (1, "2024-01-01 00:00:00"): 2,
        (2, "2024-01-01 00:00:00"): 1,
        (2, "2024-01-01 00:30:00.000001"): 1,
    }


def test_timestamp_ties_land_in_one_session(spark):
    df = _user_events(
        spark,
        [
            (1, 9, "2024-01-01 00:00:00", 1.0),
            (2, 9, "2024-01-01 00:00:00", 2.0),  # tie: gap 0, never opens
            (3, 9, "2024-01-01 12:00:00", 4.0),
        ],
    )
    tagged = assign_sessions(df, 1800)
    per_session = {
        r.session_seq: r.cnt
        for r in tagged.groupBy("session_seq").agg(F.count("*").alias("cnt")).collect()
    }
    assert per_session == {1: 2, 2: 1}


def test_lag_based_matches_session_window_on_events_table(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = session_stats(ev, gap_seconds=28800).select(*SESSION_COLS)
    b = session_counts(ev, "8 hours").select(*SESSION_COLS)
    n = a.count()
    assert n > 0
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    # sanity: sessions partition the events (counts add up)
    assert (
        a.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    )


def test_session_stream_emits_closed_sessions_and_drops_late(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")

    # file 1: one two-event session for user 7 (gap 30 min)
    _user_events(
        spark,
        [(0, 7, "2024-01-01 00:01:00", 1.0), (1, 7, "2024-01-01 00:10:00", 2.0)],
    ).write.mode("append").parquet(in_dir)
    # file 2: advances the watermark to 01:30 (> 00:10 session end + gap),
    # closing and emitting the first session; its own session stays open
    _user_events(spark, [(2, 7, "2024-01-01 02:00:00", 4.0)]).write.mode(
        "append"
    ).parquet(in_dir)

    q = stream_session_counts(spark, in_dir, out_dir)
    q.awaitTermination(120)
    emitted = {
        (r.user_id, str(r.session_start)): (str(r.session_end), r.n_events, r.sum_value)
        for r in spark.read.parquet(f"{out_dir}/sessions").collect()
    }
    assert emitted[(7, "2024-01-01 00:01:00")] == ("2024-01-01 00:10:00", 2, 3.0)
    assert (7, "2024-01-01 02:00:00") not in emitted  # still open

    # a row 85 min below the restored watermark: dropped, session not revised
    _user_events(spark, [(3, 7, "2024-01-01 00:05:00", 100.0)]).write.mode(
        "append"
    ).parquet(in_dir)
    q2 = stream_session_counts(spark, in_dir, out_dir)
    q2.awaitTermination(120)
    again = {
        (r.user_id, str(r.session_start)): (str(r.session_end), r.n_events, r.sum_value)
        for r in spark.read.parquet(f"{out_dir}/sessions").collect()
    }
    assert again[(7, "2024-01-01 00:01:00")] == ("2024-01-01 00:10:00", 2, 3.0)
    assert len(again) == len(emitted)

    # batch parity: the same input in batch mode COUNTS the late row
    # (watermark is a no-op), merging it into the first session
    batch = {
        (r.user_id, str(r.session_start)): (r.n_events, r.sum_value)
        for r in session_stats(spark.read.parquet(in_dir), 1800).collect()
    }
    assert batch[(7, "2024-01-01 00:01:00")] == (3, 103.0)


def test_session_paths_hand_computed(spark):
    import datetime as dt

    from schemasaurus_spark.operators.sessionize import session_paths

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, user, minutes, typ):
        return (eid, t0 + dt.timedelta(minutes=minutes), user, typ)

    rows = [
        # user 1: two sessions (gap > 30min): view>click, view>click
        ev(1, 1, 0, "view"), ev(2, 1, 1, "click"),
        ev(3, 1, 60, "view"), ev(4, 1, 61, "click"),
        # user 2: one session view>click, one lone purchase
        ev(5, 2, 0, "view"), ev(6, 2, 2, "click"),
        ev(7, 2, 120, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = session_paths(df, gap_seconds=1800, top_k=10).collect()
    assert [(r.rank, r.path, r.n_sessions) for r in got] == [
        (1, "view>click", 3),
        (2, "purchase", 1),
    ]
    # top_k truncates deterministically
    got1 = session_paths(df, gap_seconds=1800, top_k=1).collect()
    assert [(r.rank, r.path) for r in got1] == [(1, "view>click")]
    # equal timestamps: tiebreak pins the order
    tie = spark.createDataFrame(
        [ev(11, 9, 0, "b"), ev(10, 9, 0, "a")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    assert session_paths(tie, top_k=5).collect()[0].path == "a>b"
    # partition invariance
    re7 = session_paths(df.repartition(7, "event_id"), gap_seconds=1800, top_k=10).collect()
    assert [tuple(r) for r in re7] == [tuple(r) for r in got]
