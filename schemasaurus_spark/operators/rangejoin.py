"""Distributed range join (points × intervals) — an operator Spark lacks.

``point BETWEEN start AND end`` (inclusive both ends) is a theta-join:
Spark plans it as BroadcastNestedLoop when one side is small and as a
cartesian product otherwise — quadratic and unusable at scale.  The
standard rewrite (same technique as Databricks' range-join hints) turns
it into an EQUI-join on a time/number bucket:

* every interval explodes to the buckets it overlaps
  (``sequence(floor(start/w), floor(end/w))``);
* every point maps to exactly ONE bucket;
* an equi-join on ``(keys…, bucket)`` followed by the exact
  ``BETWEEN`` refinement yields each qualifying (point, interval) pair
  exactly once — no dedup needed, because the point side never
  explodes.

Cost model: interval replication factor is ``len/w + 1`` — pick the
bucket width near the median interval length so intervals replicate
O(1)× while each point meets only the intervals of its own bucket.
The big (points) side never expands and reaches the join shuffle-
partitioned on the bucket, which is time — naturally balanced unless
event time itself is skewed (then AQE skew-join splits the hot
buckets).  With a small interval table, ``broadcast_intervals=True``
makes the whole join a map-only pass over the points.

Works on numeric columns directly and on timestamps via exact
``unix_micros`` canonicalization (``bucket_width`` is then seconds).

No reference counterpart (brettz9/schemasaurus is schema-walk only);
north-rule / training-pipeline surface.  Contract row
``event_range_join`` oracles the full plan against a plain DuckDB
inequality join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

__all__ = ["range_join", "interval_join"]


def _canon(df: DataFrame, col: str) -> tuple[Column, bool]:
    """Column in join-domain units (micros for timestamps)."""
    if isinstance(df.schema[col].dataType, (TimestampType, TimestampNTZType)):
        # lossless under the engine-pinned UTC session timezone
        return F.unix_micros(F.col(col).cast("timestamp")), True
    return F.col(col), False


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    keys: list[str] | None = None,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Inner join of every point row to every interval row with
    ``start <= point <= end`` (and equal ``keys`` when given), planned
    as a bucketed equi-join.  Output carries all columns of both inputs
    (names must not collide outside ``keys``); each qualifying pair
    appears exactly once.  ``bucket_width`` is in the column's native
    units — seconds when the columns are timestamps.
    """
    keys = list(keys or [])
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(f"column names collide outside keys: {sorted(overlap)}")
    p_val, is_ts = _canon(points, point_col)
    s_val, _ = _canon(intervals, start_col)
    e_val, _ = _canon(intervals, end_col)
    w = int(round(bucket_width * 1_000_000)) if is_ts else bucket_width
    if not w or w <= 0:
        raise ValueError("bucket_width must be positive")

    p = points.withColumn("_rj_bkt", F.floor(p_val / F.lit(w)))
    iv = intervals.withColumn(
        "_rj_bkt",
        F.explode(F.sequence(F.floor(s_val / F.lit(w)), F.floor(e_val / F.lit(w)))),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    cond = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) <= F.col(end_col)
    )
    return p.join(iv, on=keys + ["_rj_bkt"]).where(cond).drop("_rj_bkt")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: float,
    keys: list[str] | None = None,
    broadcast_right: bool = False,
) -> DataFrame:
    """Interval × interval OVERLAP join — the second theta-join shape Spark
    lacks: every (left, right) pair with
    ``left_start <= right_end AND right_start <= left_end`` (inclusive —
    touching endpoints overlap), plus equal ``keys`` when given.

    Plan: BOTH sides explode to the buckets they cover and equi-join on
    ``(keys…, bucket)``; after the exact overlap refinement, each pair is
    charged to ONE bucket — the bucket of ``max(left_start, right_start)``
    — so every qualifying pair appears exactly once with no distinct: for
    an overlapping pair, max(start) lies inside both intervals (it is
    <= min(end)), so both sides cover that bucket; any other shared bucket
    fails the responsibility filter.  This is the standard dedup for
    symmetric spatial/temporal bucket joins (charge the pair to the first
    cell where both objects appear).

    Cost model mirrors ``range_join``: replication is ``len/w + 1`` per
    row per side, so pick ``bucket_width`` near the median interval
    length; the join shuffles on the bucket (time — balanced unless event
    time is skewed, then AQE skew-join splits hot buckets).
    ``broadcast_right=True`` makes it a map-only pass over the left side
    for dimension-sized right tables.  Timestamps canonicalize to micros
    (``bucket_width`` then in seconds), numerics join natively.
    """
    keys = list(keys or [])
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(f"column names collide outside keys: {sorted(overlap)}")
    ls, is_ts = _canon(left, left_start)
    le, _ = _canon(left, left_end)
    rs, _ = _canon(right, right_start)
    re_, _ = _canon(right, right_end)
    w = int(round(bucket_width * 1_000_000)) if is_ts else bucket_width
    if not w or w <= 0:
        raise ValueError("bucket_width must be positive")

    lf = left.withColumn(
        "_ij_bkt", F.explode(F.sequence(F.floor(ls / F.lit(w)), F.floor(le / F.lit(w))))
    ).withColumn("_ij_ls", ls)
    rf = right.withColumn(
        "_ij_bkt",
        F.explode(F.sequence(F.floor(rs / F.lit(w)), F.floor(re_ / F.lit(w)))),
    ).withColumn("_ij_rs", rs)
    if broadcast_right:
        rf = F.broadcast(rf)
    overlap_cond = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    responsible = F.col("_ij_bkt") == F.floor(
        F.greatest(F.col("_ij_ls"), F.col("_ij_rs")) / F.lit(w)
    )
    return (
        lf.join(rf, on=keys + ["_ij_bkt"])
        .where(overlap_cond & responsible)
        .drop("_ij_bkt", "_ij_ls", "_ij_rs")
    )
