"""Time-series resampling: fixed-grid bucketing with gap fill and
forward fill — the missing member of the event-time family next to
as-of joins (operators/asof.py), trailing RANGE-frame stats
(operators/rolling.py) and sessionization (operators/sessionize.py).

Monitoring and feature pipelines consume *regular* series (one row per
entity per step, last-observation-carried-forward), while event logs
are irregular; ``resample_ffill`` converts one to the other.

Scale shape — the corpus is touched exactly once:

1. one map-side-combined groupBy(entity, bucket) collapses the raw
   events to per-bucket (count, last-observation) rows — the ONLY
   data-sized exchange, and ``max_by(value, (ts, tiebreak...))`` is
   algebraic, so a hot entity's bucket collapses map-side instead of
   buffering its history like a rank window would;
2. each entity's grid is exploded from its (min, max) bucket SPAN of
   that aggregated table — grid-sized, never event-sized, and exactly
   the output the caller asked for;
3. the grid left-joins the bucket table on (entity, bucket) — both
   sides grid-sized and co-partitioned by the same keys;
4. forward fill is one ``last(value, ignorenulls=True)`` running window
   per entity over its grid — WindowExec streams an unbounded-preceding
   running frame without buffering the partition.

Determinism: buckets are integer microsecond epochs DIV step (exact in
int64; negative-epoch inputs would need floor semantics — documented
out of scope, matching the rest of the event family).  The in-bucket
"last" observation orders by (ts, tiebreak columns); callers must pass
tiebreakers that total-order equal timestamps (the event family's
standard ``event_id``).  Rows with NULL entity / ts / value are not
observations and are dropped up front (a NULL measure cannot be carried
forward).

No reference counterpart (SURVEY.md §2E training-data mandate).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step_us: int = 3_600_000_000,
    tiebreak_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """(entity, bucket, n_obs, value_ffill): one row per ``step_us``-wide
    bucket from each entity's first observation bucket to its last;
    ``n_obs`` counts raw observations in the bucket (0 for gaps) and
    ``value_ffill`` carries the latest observation at-or-before the
    bucket forward across gaps."""
    if step_us <= 0:
        raise ValueError(f"step_us must be positive, got {step_us}")
    obs = df.where(
        F.col(entity_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(entity_col).alias("entity"),
        # NTZ-safe: the session runs UTC (session.py), so the cast is the
        # identity on the wall clock and matches DuckDB's epoch_us
        F.expr(
            f"unix_micros(CAST({ts_col} AS TIMESTAMP)) DIV {step_us}"
        ).alias("bucket"),
        F.struct(F.col(ts_col), *[F.col(c) for c in tiebreak_cols]).alias(
            "_ord"
        ),
        F.col(value_col).alias("_v"),
    )
    per_bucket = obs.groupBy("entity", "bucket").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.max_by("_v", "_ord").alias("_v_last"),
    )
    grid = (
        per_bucket.groupBy("entity")
        .agg(F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1"))
        .select(
            "entity", F.explode(F.sequence("_b0", "_b1")).alias("bucket")
        )
    )
    joined = grid.join(per_bucket, ["entity", "bucket"], "left")
    w = (
        Window.partitionBy("entity")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("entity").alias(entity_col),
        "bucket",
        F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
        F.last("_v_last", ignorenulls=True).over(w).alias("value_ffill"),
    )
