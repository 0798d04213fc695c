"""Fixed-grid resampling + forward fill (operators/resample.py):
closed-form grids, gap fill, in-bucket last-observation tie-breaks,
NULL handling, and partition invariance."""

import datetime as dt

import pytest

from schemasaurus_spark.operators.resample import resample_ffill

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes, micros=0):
    return T0 + dt.timedelta(minutes=minutes, microseconds=micros)


def test_resample_gap_fill_and_ffill_closed_form(spark):
    step_us = 600_000_000  # 10-minute buckets
    rows = [
        # user 1: obs in buckets b, b+1, gap at b+2/b+3, obs at b+4
        (10, _ts(5), 1, 1.5),
        (11, _ts(12), 1, 2.5),
        (12, _ts(48), 1, 9.0),
        # user 2: single observation -> single-bucket grid
        (20, _ts(25), 2, 7.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    for frame in (df, df.repartition(5)):
        out = resample_ffill(frame, step_us=step_us)
        got = {
            (r.user_id, r.bucket): (r.n_obs, r.value_ffill)
            for r in out.collect()
        }
        b0 = (T0 + dt.timedelta(minutes=5) - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1) // step_us
        assert got == {
            (1, b0): (1, 1.5),
            (1, b0 + 1): (1, 2.5),
            (1, b0 + 2): (0, 2.5),   # gap: carried forward
            (1, b0 + 3): (0, 2.5),
            (1, b0 + 4): (1, 9.0),
            (2, b0 + 2): (1, 7.0),   # grid spans only the observed bucket
        }
        # the first grid bucket per entity is observed by construction
        assert all(v is not None for _, v in got.values())


def test_resample_in_bucket_last_breaks_ties_by_event_id(spark):
    rows = [
        (1, _ts(0, 100), 1, 10.0),
        (3, _ts(0, 100), 1, 30.0),  # same ts -> higher event_id wins
        (2, _ts(0, 200), 1, 20.0),  # later ts beats both ids
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    out = resample_ffill(df, step_us=600_000_000).collect()
    assert len(out) == 1 and out[0].n_obs == 3 and out[0].value_ffill == 20.0
    rows2 = [r for r in rows if r[0] != 2]
    df2 = spark.createDataFrame(rows2, "event_id long, ts timestamp, user_id long, value double")
    out2 = resample_ffill(df2, step_us=600_000_000).collect()
    assert out2[0].value_ffill == 30.0  # equal ts: event_id 3 > 1


def test_resample_drops_null_observations_and_rejects_bad_step(spark):
    rows = [
        (1, _ts(0), 1, 1.0),
        (2, _ts(11), 1, None),   # NULL measure: not an observation
        (3, _ts(21), None, 5.0), # NULL entity: dropped
        (4, None, 1, 9.0),       # NULL ts: dropped
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    out = resample_ffill(df, step_us=600_000_000).collect()
    assert len(out) == 1  # grid span ends at the only real observation
    assert (out[0].user_id, out[0].n_obs, out[0].value_ffill) == (1, 1, 1.0)
    with pytest.raises(ValueError):
        resample_ffill(df, step_us=0)
