"""Freshness + volume monitoring: hand-checkable lags/spans, corpus-max
vs explicit as_of semantics, zero-filled gap buckets, and the exact
integer-sums z-score chain."""

from __future__ import annotations

import datetime as dt
import math

from schemasaurus_spark.operators.monitor import freshness_profile, volume_anomalies

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "src string, ts timestamp")


def test_freshness_against_corpus_max(spark):
    df = _ev(spark, [
        ("a", T0), ("a", T0 + dt.timedelta(seconds=10)),
        ("b", T0 + dt.timedelta(seconds=5)),
    ])
    out = {r["src"]: r for r in freshness_profile(df, "ts", by="src").collect()}
    a, b = out["a"], out["b"]
    assert a["n"] == 2 and a["lag_seconds"] == 0.0 and a["span_seconds"] == 10.0
    assert a["mean_interarrival_seconds"] == 10.0
    assert b["n"] == 1 and b["lag_seconds"] == 5.0 and b["span_seconds"] == 0.0
    assert b["mean_interarrival_seconds"] is None, "single row has no interarrival"


def test_freshness_explicit_as_of_and_global(spark):
    df = _ev(spark, [
        ("a", T0), ("a", T0 + dt.timedelta(seconds=10)),
        ("b", T0 + dt.timedelta(seconds=5)),
    ])
    out = {r["src"]: r for r in
           freshness_profile(df, "ts", by="src", as_of="2024-03-01 00:00:20").collect()}
    assert out["a"]["lag_seconds"] == 10.0 and out["b"]["lag_seconds"] == 15.0
    # ungrouped: one row over the whole feed
    whole = freshness_profile(df, "ts").collect()
    assert len(whole) == 1 and whole[0]["n"] == 3 and whole[0]["lag_seconds"] == 0.0


def test_volume_zero_fills_gaps_and_flags(spark):
    rows = []
    for h, cnt in ((0, 3), (2, 3), (3, 10)):  # hour 1 is a silent outage
        rows += [("x", T0 + dt.timedelta(hours=h, minutes=i)) for i in range(cnt)]
    out = {r["bucket_ts"]: r for r in
           volume_anomalies(_ev(spark, rows), "ts", bucket="hour", z=1.5).collect()}
    assert len(out) == 4, "gap hour must be zero-filled into the spine"
    counts = [3, 0, 3, 10]
    nb, s1, s2 = 4, sum(counts), sum(c * c for c in counts)
    mean = s1 / nb
    std = math.sqrt(s2 / nb - mean * mean)
    for h, cnt in zip(range(4), counts):
        r = out[T0 + dt.timedelta(hours=h)]
        assert r["cnt"] == cnt
        assert r["mean"] == round(mean, 6) and r["stddev"] == round(std, 6)
        assert r["zscore"] == round((cnt - mean) / std, 6)
        assert r["anomalous"] == (abs(round((cnt - mean) / std, 6)) > 1.5)
    assert out[T0 + dt.timedelta(hours=3)]["anomalous"]
    assert not out[T0]["anomalous"]


def test_volume_constant_feed_never_anomalous(spark):
    rows = [("x", T0 + dt.timedelta(hours=h, minutes=i))
            for h in range(3) for i in range(5)]
    out = volume_anomalies(_ev(spark, rows), "ts", bucket="hour").collect()
    assert all(r["stddev"] == 0.0 and r["zscore"] is None and not r["anomalous"]
               for r in out)
