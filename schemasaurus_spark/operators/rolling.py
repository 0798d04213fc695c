"""Trailing event-time window statistics — RANGE-frame moving aggregates
per entity ("events/value in the user's last N seconds", the
velocity/burst feature behind rate limiting, abuse detection and
engagement scoring).

This is the one windowing shape the engine had not yet exercised:
``sessionize`` used ROW frames (lag + running sum), the streaming side
uses tumbling/session windows — here the frame is a TIME-RANGE
(``rangeBetween`` over microsecond epochs), so two events 59 minutes
apart share a 1-hour frame regardless of how many rows sit between
them.  No reference counterpart (SURVEY §2E north-rule/events surface).

Exactness discipline: values are quantized once to the int64
``floor(x·1e6 + 0.5)`` grid (the classify.py precedent — engine-portable
rounding), so the sliding SUM is exact integer arithmetic no matter how
either engine's window evaluator associates the adds; the only floats
are the output ratios (one identically-parenthesized division chain,
round-6).  Ordering is by integer microseconds; RANGE frames include
all PEERS of the boundary timestamp by definition, so equal-timestamp
events need no tiebreak — the frame content is deterministic.
Timestamps leave as ``ts_us`` BIGINT epochs (fractional-second
timestamp stringification differs across engines — the
event_attribution precedent).

Scale shape: ONE exchange on the entity key + a per-entity sort; the
sliding frame is evaluated in a single ordered pass (Spark keeps a
moving window buffer, not per-row rescans).  Output is input-sized —
this is a feature-generation pass, meant to be fused with downstream
projections.  Skew: a pathologically hot entity serializes into one
task's sort, the same caveat (and salting remedy) documented in
operators/sessionize.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FP_SCALE = 1_000_000.0


def trailing_stats(
    events: DataFrame,
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per event: (id_col, user_col, ts_us, n_events, sum_value,
    avg_value) over the same entity's events in ``[ts - window_seconds,
    ts]`` (inclusive, microsecond-exact).  ``n_events`` counts all frame
    rows; sum/avg cover non-NULL values (NULL when the frame has none).
    Rows with NULL timestamp or entity are excluded (no frame)."""
    base = events.where(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
    ).select(
        F.col(id_col),
        F.col(user_col),
        # NTZ-safe: the session runs UTC (session.py), so the cast is the
        # identity on the wall clock and matches DuckDB's epoch_us
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.floor(F.col(value_col) * F.lit(FP_SCALE) + F.lit(0.5))
        .cast("long")
        .alias("_vfp"),
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy("ts_us")
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    sfp = F.sum("_vfp").over(w)
    nv = F.count("_vfp").over(w)
    return base.select(
        id_col,
        user_col,
        "ts_us",
        F.count(F.lit(1)).over(w).alias("n_events"),
        F.round(sfp.cast("double") / F.lit(FP_SCALE), 6).alias("sum_value"),
        F.round(
            sfp.cast("double") / nv.cast("double") / F.lit(FP_SCALE), 6
        ).alias("avg_value"),
    )
