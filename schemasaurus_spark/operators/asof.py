"""Distributed as-of (point-in-time) join — an operator Spark lacks.

Semantics match ``pandas.merge_asof`` (and DuckDB's native ``ASOF
JOIN``, which the contract oracle uses): for every left row, attach the
payload of the single right row with the same key whose timestamp is
the nearest at-or-before (``direction="backward"``, inclusive) or
at-or-after (``"forward"``, inclusive) the left timestamp, optionally
within ``tolerance_seconds``.  The classic feature-engineering join —
"state of X as of this event" — that neither DataFrame equi-joins nor
window functions express directly (a naive ``l.ts >= r.ts`` theta-join
is quadratic per key and Spark plans it as a nested-loop).

Spark-first plan (``asof_join``): the union trick.  Left and right
union into one keyed stream ordered by ``(ts, side, tiebreak)`` with
right rows sorting BEFORE left rows at equal timestamps (inclusive
match), and ``last(right_payload, ignoreNulls=True)`` over
``UNBOUNDED PRECEDING .. CURRENT ROW`` hands every left row the most
recent right payload.  Cost: ONE shuffle on the key and one
within-partition sort — the same exchange an aggregation would pay; no
theta-join, no per-key loop, rows never expand.

Scale limit of the simple form: a window partition is a whole key's
history, so one pathologically hot key serializes into one task.
``asof_join_bucketed`` bounds that: time is cut into fixed buckets, the
right side collapses to its per-``(key, bucket)`` LATEST payload
(map-side-combinable aggregate), a bucket-granularity running window
over that *tiny* frame derives each bucket's carry-in (latest right
payload from strictly earlier buckets — itself the union trick at
bucket granularity, so carry-in rows for empty-right buckets inherit
correctly), and the final window partitions by ``(key, bucket)`` —
partition size is bounded by bucket width regardless of key heat.
Both forms are parity-tested against each other and against
``pandas.merge_asof`` (tests/test_asof.py).

Determinism: among right rows sharing ``(key, ts)`` the winner is the
max ``tiebreak`` for backward and the min for forward (mirroring
merge_asof's positional rule once the right side is tiebreak-sorted).

Forward direction reuses the backward machinery in negated time, so
``tiebreak`` must be numeric.

No reference counterpart (brettz9/schemasaurus is schema-walk only);
training-pipeline / north-rule surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.sql.window import Window

__all__ = ["asof_join", "asof_join_bucketed"]

_TS = "_asof_ts_us"  # canonical (possibly negated) ordering micros
_SIDE = "_asof_side"  # 0 = right, 1 = left (right visible at equal ts)
_TB = "_asof_tb"  # canonical (possibly negated) right tiebreak
_LPAY = "_asof_lpay"
_RPAY = "_asof_rpay"
_MATCH = "_asof_matched_us"  # real (un-negated) right micros, for tolerance


def _micros(col: Column) -> Column:
    """Exact micros-since-epoch for TIMESTAMP and TIMESTAMP_NTZ alike.
    The NTZ→TIMESTAMP cast is lossless because the engine pins the
    session timezone to UTC (session.py)."""
    return F.unix_micros(col.cast("timestamp"))


def _keys(on) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def _sign(direction: str) -> int:
    if direction == "backward":
        return 1
    if direction == "forward":
        return -1
    raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")


def _prepare(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: str | None,
    sign: int,
) -> tuple[DataFrame, DataFrame, StructType, StructType]:
    """Project both sides onto the canonical union schema pieces."""
    lpay_t = StructType(
        [StructField(c, left.schema[c].dataType, True) for c in left.columns]
    )
    rpay_t = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in right_cols]
        + [StructField(_MATCH, LongType(), True)]
    )
    l_us = _micros(F.col(left_ts))
    r_us = _micros(F.col(right_ts))
    lside = left.select(
        *keys,
        (F.lit(sign) * l_us).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast("long").alias(_TB),
        F.struct(*left.columns).alias(_LPAY),
        F.lit(None).cast(rpay_t).alias(_RPAY),
    )
    tb = (F.lit(sign) * F.col(tiebreak).cast("long")) if tiebreak else F.lit(0).cast("long")
    rside = right.select(
        *keys,
        (F.lit(sign) * r_us).alias(_TS),
        F.lit(0).alias(_SIDE),
        tb.alias(_TB),
        F.lit(None).cast(lpay_t).alias(_LPAY),
        F.struct(*[F.col(c) for c in right_cols], r_us.alias(_MATCH)).alias(_RPAY),
    )
    return lside, rside, lpay_t, rpay_t


def _finish(
    picked: DataFrame,
    left_cols: list[str],
    right_cols: list[str],
    left_ts: str,
    tolerance_seconds: float | None,
    suffix: str,
) -> DataFrame:
    """Drop to left rows, apply tolerance, flatten payloads."""
    out = picked.where(F.col(_SIDE) == 1)
    pick = F.col("_asof_pick")
    if tolerance_seconds is not None:
        tol_us = int(round(tolerance_seconds * 1_000_000))
        diff = F.abs(_micros(F.col(_LPAY)[left_ts]) - pick[_MATCH])
        pick = F.when(diff <= F.lit(tol_us), pick)
    return out.select(
        *[F.col(_LPAY)[c].alias(c) for c in left_cols],
        *[pick[c].alias(c + suffix) for c in right_cols],
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on,
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    tiebreak: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: one output row per left row, right payload
    columns appended as ``<col><suffix>`` (NULL when no match).

    ``on`` — key column name or list (both sides).  ``right_cols`` —
    right payload to attach (default: all non-key right columns).
    ``tiebreak`` — numeric right column making equal-``(key, ts)``
    winners deterministic.  See module doc for semantics and plan.
    """
    sign = _sign(direction)
    keys = _keys(on)
    right_ts = right_ts or left_ts
    rcols = right_cols or [c for c in right.columns if c not in keys]
    lside, rside, _, _ = _prepare(
        left, right, keys, left_ts, right_ts, rcols, tiebreak, sign
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(_TS, _SIDE, _TB)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = lside.unionByName(rside).withColumn(
        "_asof_pick", F.last(_RPAY, ignorenulls=True).over(w)
    )
    return _finish(picked, left.columns, rcols, left_ts, tolerance_seconds, suffix)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    *,
    on,
    bucket_seconds: float,
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    tiebreak: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Skew-bounded as-of join: identical semantics to :func:`asof_join`
    (parity-tested), but the final window partitions by
    ``(key, time-bucket)`` so no single key's full history serializes
    into one task.  ``bucket_seconds`` trades carry-in frame size
    (small buckets) against per-partition sort size (large buckets);
    at petabyte scale pick it near the shuffle-partition time span.

    Cost note: each input subplan is referenced twice (payload pass +
    the column-pruned bucket-key pass feeding the carry-in derivation),
    so expensive upstream plans should be persisted by the caller; on a
    plain table scan the second read prunes to keys+ts.
    """
    sign = _sign(direction)
    keys = _keys(on)
    right_ts = right_ts or left_ts
    rcols = right_cols or [c for c in right.columns if c not in keys]
    bucket_us = int(round(bucket_seconds * 1_000_000))
    if bucket_us <= 0:
        raise ValueError("bucket_seconds must be positive")
    lside, rside, _, rpay_t = _prepare(
        left, right, keys, left_ts, right_ts, rcols, tiebreak, sign
    )
    bucket = F.floor(F.col(_TS) / F.lit(bucket_us))
    lside = lside.withColumn("_asof_bkt", bucket)
    rside = rside.withColumn("_asof_bkt", bucket)

    # per-(key, bucket) latest right payload — map-side-combinable agg
    ord_struct = F.struct(F.col(_TS), F.col(_TB))
    rb = rside.groupBy(*keys, "_asof_bkt").agg(
        F.max_by(F.col(_RPAY), ord_struct).alias("_asof_best")
    )
    # carry-in per LEFT bucket: latest right payload from buckets < B.
    # Union trick at bucket granularity: left buckets (side 1) sort
    # BEFORE the same bucket's rb row (side 2), so the running last()
    # at a left-bucket row has seen only strictly-earlier rb rows.
    lb = lside.select(*keys, "_asof_bkt").distinct()
    bframe = lb.select(
        *keys,
        "_asof_bkt",
        F.lit(1).alias("_asof_bside"),
        F.lit(None).cast(rpay_t).alias("_asof_best"),
    ).unionByName(
        rb.select(*keys, "_asof_bkt", F.lit(2).alias("_asof_bside"), "_asof_best")
    )
    wb = (
        Window.partitionBy(*keys)
        .orderBy("_asof_bkt", "_asof_bside")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        bframe.withColumn("_asof_carry", F.last("_asof_best", ignorenulls=True).over(wb))
        .where((F.col("_asof_bside") == 1) & F.col("_asof_carry").isNotNull())
        .select(
            *keys,
            "_asof_bkt",
            # position at bucket start, NULL tiebreak → sorts before
            # (and is overridden by) every real right row in the bucket
            (F.col("_asof_bkt") * F.lit(bucket_us)).alias(_TS),
            F.lit(0).alias(_SIDE),
            F.lit(None).cast("long").alias(_TB),
            F.lit(None).cast(lside.schema[_LPAY].dataType).alias(_LPAY),
            F.col("_asof_carry").alias(_RPAY),
        )
    )
    w = (
        Window.partitionBy(*keys, "_asof_bkt")
        .orderBy(_TS, _SIDE, _TB)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = lside.unionByName(rside).unionByName(carry).withColumn(
        "_asof_pick", F.last(_RPAY, ignorenulls=True).over(w)
    )
    return _finish(picked, left.columns, rcols, left_ts, tolerance_seconds, suffix)
