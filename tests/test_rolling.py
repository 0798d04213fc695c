"""Trailing RANGE-frame stats (operators/rolling.py): hand-computed
frames including the inclusive boundary, equal-timestamp peers, NULL
values inside frames, NULL ts/user exclusion, and partition invariance."""

import datetime as dt

from schemasaurus_spark.operators.rolling import trailing_stats

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(eid, user, sec, val):
    return (eid, T0 + dt.timedelta(seconds=sec), user, val)


SCHEMA = "event_id bigint, ts timestamp_ntz, user_id bigint, value double"


def test_hand_computed_frames(spark):
    rows = [
        _ev(1, 1, 0, 1.0),
        _ev(2, 1, 50, 2.0),   # frame(60s): {1,2}
        _ev(3, 1, 60, 4.0),   # frame: {1,2,3} — 60s boundary INCLUSIVE
        _ev(4, 1, 121, 8.0),  # frame: {3?} 121-60=61 > 60 excl id1,2; id3 at 60: 121-60=61>60 -> excluded too; {4}
        _ev(5, 2, 55, 16.0),  # other user isolated
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.event_id: (r.n_events, r.sum_value, r.avg_value)
           for r in trailing_stats(df, window_seconds=60).collect()}
    assert got[1] == (1, 1.0, 1.0)
    assert got[2] == (2, 3.0, 1.5)
    assert got[3] == (3, 7.0, round(7 / 3, 6))
    assert got[4] == (1, 8.0, 8.0)
    assert got[5] == (1, 16.0, 16.0)


def test_equal_timestamp_peers_share_frame(spark):
    rows = [_ev(1, 1, 10, 1.0), _ev(2, 1, 10, 2.0)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.event_id: (r.n_events, r.sum_value)
           for r in trailing_stats(df, window_seconds=5).collect()}
    # RANGE frames include all peers of the boundary value for BOTH rows
    assert got[1] == (2, 3.0) and got[2] == (2, 3.0)


def test_null_value_counts_but_does_not_sum(spark):
    rows = [_ev(1, 1, 0, 1.0), _ev(2, 1, 10, None), _ev(3, 1, 20, 3.0)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.event_id: (r.n_events, r.sum_value, r.avg_value)
           for r in trailing_stats(df, window_seconds=60).collect()}
    assert got[2] == (2, 1.0, 1.0)       # NULL counted in n, not in sum/avg
    assert got[3] == (3, 4.0, 2.0)       # avg over the 2 non-NULL values


def test_all_null_frame_yields_null_stats(spark):
    rows = [_ev(1, 1, 0, None)]
    df = spark.createDataFrame(rows, SCHEMA)
    r = trailing_stats(df, window_seconds=60).collect()[0]
    assert r.n_events == 1 and r.sum_value is None and r.avg_value is None


def test_null_ts_or_user_excluded(spark):
    rows = [(1, None, 1, 1.0), (2, T0, None, 1.0), (3, T0, 1, 1.0)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = [r.event_id for r in trailing_stats(df, window_seconds=60).collect()]
    assert got == [3]


def test_partition_invariance(spark):
    rows = [_ev(i, i % 3, (i * 37) % 500, float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(map(tuple, trailing_stats(df, 60).collect()))
    b = sorted(map(tuple, trailing_stats(df.repartition(17), 60).collect()))
    assert a == b
