"""Range join: brute-force parity (numeric + timestamp domains, keyed +
keyless), exactly-once pair emission across bucket widths, boundary
inclusivity."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from schemasaurus_spark.operators.rangejoin import range_join

T0 = dt.datetime(2024, 1, 1)


def _brute(points, intervals, keyed):
    out = set()
    for p in points:
        for iv in intervals:
            if keyed and p[0] != iv[0]:
                continue
            if iv[-2] <= p[-1] <= iv[-1]:
                out.add((p[1] if keyed else p[0], iv[1] if keyed else iv[0]))
    return out


@pytest.mark.parametrize("bucket_width", [1, 7, 50, 1000])
def test_numeric_parity_and_exactly_once(spark, bucket_width):
    rng = random.Random(5)
    points = [(rng.randrange(3), i, rng.randrange(0, 300)) for i in range(200)]
    intervals = []
    for j in range(40):
        s = rng.randrange(0, 300)
        intervals.append((rng.randrange(3), j, s, s + rng.randrange(0, 40)))
    p = spark.createDataFrame(points, "k long, pid long, x long")
    iv = spark.createDataFrame(intervals, "k long, wid long, lo long, hi long")
    out = range_join(
        p, iv, point_col="x", start_col="lo", end_col="hi",
        bucket_width=bucket_width, keys=["k"],
    )
    rows = [(r.pid, r.wid) for r in out.collect()]
    assert len(rows) == len(set(rows)), "pair emitted more than once"
    assert set(rows) == _brute(
        [(k, pid, x) for k, pid, x in points],
        [(k, wid, lo, hi) for k, wid, lo, hi in intervals],
        keyed=True,
    )


def test_timestamp_keyless_inclusive_bounds(spark):
    p = spark.createDataFrame(
        [(1, T0), (2, T0 + dt.timedelta(seconds=59)), (3, T0 + dt.timedelta(seconds=60)),
         (4, T0 - dt.timedelta(microseconds=1))],
        "pid long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(10, T0, T0 + dt.timedelta(seconds=60))],
        "wid long, w_start timestamp, w_end timestamp",
    )
    out = range_join(
        p, iv, point_col="ts", start_col="w_start", end_col="w_end",
        bucket_width=7,  # seconds; deliberately not dividing 60
    )
    assert sorted(r.pid for r in out.collect()) == [1, 2, 3]


def test_timestamp_parity_random(spark):
    rng = random.Random(19)
    points = [
        (i, T0 + dt.timedelta(seconds=rng.randrange(0, 5000)))
        for i in range(150)
    ]
    intervals = []
    for j in range(25):
        s = rng.randrange(0, 5000)
        intervals.append(
            (j, T0 + dt.timedelta(seconds=s), T0 + dt.timedelta(seconds=s + rng.randrange(0, 600)))
        )
    p = spark.createDataFrame(points, "pid long, ts timestamp")
    iv = spark.createDataFrame(intervals, "wid long, w_start timestamp, w_end timestamp")
    brute = {
        (pid, wid)
        for pid, ts in points
        for wid, s, e in intervals
        if s <= ts <= e
    }
    for bw, bc in [(60, False), (977, True)]:
        out = range_join(
            p, iv, point_col="ts", start_col="w_start", end_col="w_end",
            bucket_width=bw, broadcast_intervals=bc,
        )
        rows = [(r.pid, r.wid) for r in out.collect()]
        assert len(rows) == len(set(rows))
        assert set(rows) == brute


def test_column_collision_rejected(spark):
    p = spark.createDataFrame([(1, 2)], "a long, x long")
    iv = spark.createDataFrame([(1, 0, 5)], "a long, lo long, hi long")
    with pytest.raises(ValueError, match="collide"):
        range_join(p, iv, point_col="x", start_col="lo", end_col="hi", bucket_width=1)


# ------------------------------------------------------- interval x interval


def test_interval_join_brute_force_parity(spark):
    import random

    from schemasaurus_spark.operators.rangejoin import interval_join

    rng = random.Random(13)
    A = [
        ("a%d" % i, rng.choice(["k1", "k2"]), s, s + rng.randrange(0, 40))
        for i, s in enumerate(rng.randrange(0, 300) for _ in range(60))
    ]
    B = [
        ("b%d" % i, rng.choice(["k1", "k2"]), s, s + rng.randrange(0, 25))
        for i, s in enumerate(rng.randrange(0, 300) for _ in range(50))
    ]
    la = spark.createDataFrame(A, "aid string, key string, a_start long, a_end long")
    rb = spark.createDataFrame(B, "bid string, key string, b_start long, b_end long")
    got = sorted(
        (r.aid, r.bid)
        for r in interval_join(
            la, rb,
            left_start="a_start", left_end="a_end",
            right_start="b_start", right_end="b_end",
            bucket_width=16, keys=["key"],
        ).collect()
    )
    want = sorted(
        (aid, bid)
        for aid, ka, s1, e1 in A
        for bid, kb, s2, e2 in B
        if ka == kb and s1 <= e2 and s2 <= e1
    )
    assert got == want  # parity AND exactly-once (sorted lists, not sets)


def test_interval_join_inclusive_touching_endpoints(spark):
    from schemasaurus_spark.operators.rangejoin import interval_join

    la = spark.createDataFrame([("a", 0, 10)], "aid string, a_start long, a_end long")
    rb = spark.createDataFrame(
        [("touch", 10, 20), ("gap", 11, 20), ("inside", 2, 3)],
        "bid string, b_start long, b_end long",
    )
    got = {
        r.bid
        for r in interval_join(
            la, rb,
            left_start="a_start", left_end="a_end",
            right_start="b_start", right_end="b_end",
            bucket_width=4,
        ).collect()
    }
    assert got == {"touch", "inside"}


def test_interval_join_timestamps_and_partition_invariance(spark):
    import datetime as dt

    from schemasaurus_spark.operators.rangejoin import interval_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(h):
        return t0 + dt.timedelta(hours=h)

    la = spark.createDataFrame(
        [("a1", ts(0), ts(5)), ("a2", ts(10), ts(12))],
        "aid string, a_start timestamp, a_end timestamp",
    )
    rb = spark.createDataFrame(
        [("b1", ts(4), ts(11)), ("b2", ts(13), ts(14))],
        "bid string, b_start timestamp, b_end timestamp",
    )
    kw = dict(
        left_start="a_start", left_end="a_end",
        right_start="b_start", right_end="b_end", bucket_width=3600,
    )
    got = sorted((r.aid, r.bid) for r in interval_join(la, rb, **kw).collect())
    assert got == [("a1", "b1"), ("a2", "b1")]
    re7 = sorted(
        (r.aid, r.bid)
        for r in interval_join(la.repartition(7), rb.repartition(5), **kw).collect()
    )
    assert re7 == got


def test_interval_join_validation(spark):
    import pytest as _pytest

    from schemasaurus_spark.operators.rangejoin import interval_join

    la = spark.createDataFrame([("a", 0, 1)], "x string, s long, e long")
    rb = spark.createDataFrame([("b", 0, 1)], "x string, s2 long, e2 long")
    with _pytest.raises(ValueError):  # 'x' collides outside keys
        interval_join(
            la, rb, left_start="s", left_end="e",
            right_start="s2", right_end="e2", bucket_width=1,
        )


def test_interval_join_parity_across_widths_and_negative_coords(spark):
    import random

    from schemasaurus_spark.operators.rangejoin import interval_join

    rng = random.Random(99)
    A = [
        ("a%d" % i, s, s + rng.randrange(0, 30))
        for i, s in enumerate(rng.randrange(-150, 150) for _ in range(40))
    ]
    B = [
        ("b%d" % i, s, s + rng.randrange(0, 18))
        for i, s in enumerate(rng.randrange(-150, 150) for _ in range(35))
    ]
    la = spark.createDataFrame(A, "aid string, a_start long, a_end long")
    rb = spark.createDataFrame(B, "bid string, b_start long, b_end long")
    want = sorted(
        (aid, bid)
        for aid, s1, e1 in A
        for bid, s2, e2 in B
        if s1 <= e2 and s2 <= e1
    )
    for w in (1, 7, 16, 64, 1000):  # incl. width >> spans and width 1
        got = sorted(
            (r.aid, r.bid)
            for r in interval_join(
                la, rb,
                left_start="a_start", left_end="a_end",
                right_start="b_start", right_end="b_end",
                bucket_width=w,
            ).collect()
        )
        assert got == want, f"width {w}"
