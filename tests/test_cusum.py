"""CUSUM changepoints: closed-form == recurrence on a hand-replayed
stream, shift detection, slack, NULLs, validation, partition
invariance, single-exchange plan."""

import math

import pytest
from pyspark.sql import functions as F

from schemasaurus_spark.operators.cusum import (
    FP_SCALE,
    cusum_changepoints,
    quantize,
)

SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _rows(values, entity="a", start=0):
    import datetime as dt

    return [
        (
            start + i,
            dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i),
            entity,
            v,
        )
        for i, v in enumerate(values)
    ]


def _recurrence(values, target, slack):
    up = dn = 0
    qs_up = quantize(target) + quantize(slack)
    qs_dn = quantize(target) - quantize(slack)
    out = []
    for v in values:
        qv = quantize(v)
        up = max(0, up + (qv - qs_up))
        dn = max(0, dn + (qs_dn - qv))
        out.append((up, dn))
    return out


def test_closed_form_equals_recurrence(spark):
    values = [5.0, 1.25, 9.5, 0.0, 3.3, 3.3, 12.0, -2.5, 4.0]
    df = spark.createDataFrame(_rows(values), SCHEMA)
    got = (
        cusum_changepoints(df, target=4.0, threshold=6.0, slack=0.5)
        .orderBy("event_id")
        .collect()
    )
    expect = _recurrence(values, 4.0, 0.5)
    assert [(r.cusum_up_q, r.cusum_down_q) for r in got] == expect
    q_h = quantize(6.0)
    assert [r.alarm_up for r in got] == [
        1 if u > q_h else 0 for u, _ in expect
    ]
    assert [r.alarm_down for r in got] == [
        1 if d > q_h else 0 for _, d in expect
    ]


def test_detects_mean_shift_up_only_after_shift(spark):
    values = [10.0] * 20 + [13.0] * 20  # shift +3 at i=20
    df = spark.createDataFrame(_rows(values), SCHEMA)
    got = (
        cusum_changepoints(df, target=10.0, threshold=10.0, slack=1.0)
        .orderBy("event_id")
        .collect()
    )
    # before the shift: d = -1 each step -> statistic pinned at 0
    assert all(r.cusum_up_q == 0 for r in got[:20])
    # after: +2 per step, alarm once cumulative excess > 10 (6 steps)
    alarms = [i for i, r in enumerate(got) if r.alarm_up]
    assert alarms and alarms[0] == 25
    assert all(r.alarm_down == 0 for r in got)


def test_entities_independent_and_null_excluded(spark):
    rows = _rows([100.0, 100.0], "hot") + _rows([1.0, None], "cold", start=10)
    df = spark.createDataFrame(rows, SCHEMA)
    got = cusum_changepoints(df, target=5.0, threshold=50.0).collect()
    assert len(got) == 3  # NULL value row dropped
    hot = sorted(
        (r.event_id, r.cusum_up_q) for r in got if r.event_type == "hot"
    )
    assert hot == [
        (0, quantize(95.0)),
        (1, quantize(95.0) * 2),
    ]


def test_validation(spark):
    df = spark.createDataFrame(_rows([1.0]), SCHEMA)
    with pytest.raises(ValueError):
        cusum_changepoints(df, target=0.0, threshold=0.0)


def test_partition_invariance(spark):
    values = [math.sin(i) * 10 + 5 for i in range(60)]
    df = spark.createDataFrame(
        _rows(values) + _rows(values[:30], "b", start=1000), SCHEMA
    )
    kw = dict(target=5.0, threshold=8.0, slack=0.25)
    base = sorted(map(tuple, cusum_changepoints(df, **kw).collect()))
    re7 = sorted(
        map(
            tuple,
            cusum_changepoints(df.repartition(7, "event_id"), **kw).collect(),
        )
    )
    assert base == re7


def test_single_exchange_plan(spark):
    df = spark.createDataFrame(_rows([1.0, 2.0]), SCHEMA)
    plan = (
        cusum_changepoints(df, target=1.0, threshold=5.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
