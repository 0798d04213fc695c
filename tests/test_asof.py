"""As-of join: planted semantics, pandas.merge_asof parity, and
bucketed-vs-simple equivalence (the skew-bounded plan must be a pure
physical rewrite)."""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest

from pyspark.sql import functions as F

from schemasaurus_spark.operators.asof import asof_join, asof_join_bucketed

T0 = dt.datetime(2024, 1, 1)


def _ts(s: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=s)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


LEFT_SCHEMA = "k long, ts timestamp, lv string"
RIGHT_SCHEMA = "k long, ts timestamp, rid long, rv double"


@pytest.fixture(scope="module")
def planted(spark):
    left = _mk(
        spark,
        [
            (1, _ts(10), "a"),  # before any right row -> no match
            (1, _ts(20), "b"),  # exact tie with right rid=1 (inclusive)
            (1, _ts(35), "c"),  # after rid=2
            (2, _ts(50), "d"),  # key with no right rows at all
            (1, _ts(100), "e"),  # far after -> tolerance kills it
        ],
        LEFT_SCHEMA,
    )
    right = _mk(
        spark,
        [
            (1, _ts(20), 1, 1.0),
            (1, _ts(20), 9, 9.0),  # same (k, ts): max tiebreak wins backward
            (1, _ts(30), 2, 2.0),
        ],
        RIGHT_SCHEMA,
    )
    return left, right


def _rowset(df):
    return sorted(
        tuple(r) for r in df.select(*sorted(df.columns)).collect()
    )


def test_backward_planted(spark, planted):
    left, right = planted
    out = asof_join(
        left, right, on="k", right_cols=["rid", "rv"], tiebreak="rid"
    )
    got = {(r.k, r.lv): (r.rid_right, r.rv_right) for r in out.collect()}
    assert got == {
        (1, "a"): (None, None),
        (1, "b"): (9, 9.0),  # inclusive + max-tiebreak tie rule
        (1, "c"): (2, 2.0),
        (2, "d"): (None, None),
        (1, "e"): (2, 2.0),
    }
    assert out.count() == left.count()


def test_backward_tolerance(spark, planted):
    left, right = planted
    out = asof_join(
        left,
        right,
        on="k",
        right_cols=["rid"],
        tiebreak="rid",
        tolerance_seconds=10,
    )
    got = {(r.k, r.lv): r.rid_right for r in out.collect()}
    # 'e' at t=100 is 70s past rid=2 -> nulled; 'c' (5s) survives
    assert got[(1, "e")] is None and got[(1, "c")] == 2
    assert got[(1, "b")] == 9  # 0s diff


def test_forward_planted(spark, planted):
    left, right = planted
    out = asof_join(
        left,
        right,
        on="k",
        right_cols=["rid"],
        direction="forward",
        tiebreak="rid",
    )
    got = {(r.k, r.lv): r.rid_right for r in out.collect()}
    assert got == {
        (1, "a"): 1,  # earliest at-or-after; min tiebreak at the tie
        (1, "b"): 1,
        (1, "c"): None,
        (2, "d"): None,
        (1, "e"): None,
    }


def _random_frames(seed: int, n_left=120, n_right=60, n_keys=5):
    rng = random.Random(seed)
    lrows = [
        (rng.randrange(n_keys), _ts(rng.randrange(0, 500)), f"l{i}")
        for i in range(n_left)
    ]
    rrows = [
        (rng.randrange(n_keys), _ts(rng.randrange(0, 500)), i, round(rng.random(), 3))
        for i in range(n_right)
    ]
    return lrows, rrows


def _pandas_asof(lrows, rrows, direction, tolerance=None):
    lp = pd.DataFrame(lrows, columns=["k", "ts", "lv"]).sort_values(["ts", "lv"])
    # tiebreak-sort so pandas' positional tie rule (last row backward,
    # first row forward) coincides with our max/min-tiebreak rule
    rp = pd.DataFrame(rrows, columns=["k", "ts", "rid", "rv"]).sort_values(
        ["ts", "rid"], kind="stable"
    )
    out = pd.merge_asof(
        lp,
        rp,
        on="ts",
        by="k",
        direction=direction,
        tolerance=None if tolerance is None else pd.Timedelta(seconds=tolerance),
    )
    return {
        (r.k, r.lv): (None if pd.isna(r.rid) else int(r.rid))
        for r in out.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("seed", [7, 21])
def test_merge_asof_parity_random(spark, direction, seed):
    lrows, rrows = _random_frames(seed)
    left = _mk(spark, lrows, LEFT_SCHEMA)
    right = _mk(spark, rrows, RIGHT_SCHEMA)
    out = asof_join(
        left, right, on="k", right_cols=["rid"], direction=direction, tiebreak="rid"
    )
    got = {(r.k, r.lv): r.rid_right for r in out.collect()}
    assert got == _pandas_asof(lrows, rrows, direction)


def test_merge_asof_parity_tolerance(spark):
    lrows, rrows = _random_frames(3)
    left = _mk(spark, lrows, LEFT_SCHEMA)
    right = _mk(spark, rrows, RIGHT_SCHEMA)
    out = asof_join(
        left,
        right,
        on="k",
        right_cols=["rid"],
        tiebreak="rid",
        tolerance_seconds=30,
    )
    got = {(r.k, r.lv): r.rid_right for r in out.collect()}
    assert got == _pandas_asof(lrows, rrows, "backward", tolerance=30)


@pytest.mark.parametrize("bucket_seconds", [1, 17, 60, 10_000])
def test_bucketed_equals_simple(spark, bucket_seconds):
    lrows, rrows = _random_frames(11)
    left = _mk(spark, lrows, LEFT_SCHEMA)
    right = _mk(spark, rrows, RIGHT_SCHEMA)
    kw = dict(on="k", right_cols=["rid", "rv"], tiebreak="rid")
    simple = asof_join(left, right, **kw)
    bucketed = asof_join_bucketed(left, right, bucket_seconds=bucket_seconds, **kw)
    assert _rowset(simple) == _rowset(bucketed)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_bucketed_equals_simple_directions_tolerance(spark, direction):
    lrows, rrows = _random_frames(13)
    left = _mk(spark, lrows, LEFT_SCHEMA)
    right = _mk(spark, rrows, RIGHT_SCHEMA)
    kw = dict(
        on="k",
        right_cols=["rid"],
        tiebreak="rid",
        direction=direction,
        tolerance_seconds=45,
    )
    simple = asof_join(left, right, **kw)
    bucketed = asof_join_bucketed(left, right, bucket_seconds=20, **kw)
    assert _rowset(simple) == _rowset(bucketed)


def test_bucketed_partitioning_invariance(spark):
    lrows, rrows = _random_frames(17)
    left = _mk(spark, lrows, LEFT_SCHEMA).repartition(7)
    right = _mk(spark, rrows, RIGHT_SCHEMA).repartition(3)
    a = asof_join_bucketed(
        left, right, on="k", bucket_seconds=50, right_cols=["rid"], tiebreak="rid"
    )
    b = asof_join_bucketed(
        left.coalesce(1),
        right.coalesce(1),
        on="k",
        bucket_seconds=50,
        right_cols=["rid"],
        tiebreak="rid",
    )
    assert _rowset(a) == _rowset(b)
