"""CUSUM sequential changepoint detection over per-entity event streams.

Page's cumulative-sum control chart: the classic online detector for a
persistent mean shift that per-batch KS/chi-square drift checks (which
compare whole distributions) respond to only after the shift has
polluted a full window.  Two one-sided statistics per entity, in event
order:

    up_i   = max(0, up_{i-1}   + (x_i - target - slack))
    down_i = max(0, down_{i-1} + (target - slack - x_i))

with an alarm whenever either exceeds the threshold.  The recurrence
looks inherently sequential, but it has the exact closed form

    up_i = cum_i - min(0, min_{j<=i} cum_j),   cum = prefix sum of d,

so the whole detector is two window functions (running sum + running
min) per side — no UDF, no iteration, and a DuckDB oracle replays it
bit-for-bit.

Exactness discipline: values, target, slack and threshold are quantized
ONCE to the int64 ``floor(x*1e6 + 0.5)`` grid (the rolling.py /
classify.py precedent), so every prefix sum is exact integer arithmetic
regardless of evaluator association order, and the closed form equals
the recurrence EXACTLY (the identity holds over integers; over floats
the two bracketings could diverge by ulps).  Ordering is the total
order (ts_us, id_col) — a unique id column is REQUIRED because prefix
sums under ties would be partition-order-dependent.

Scale shape: ONE exchange on the entity key + a per-entity sort; all
four windows share the same (partition, order) so Catalyst evaluates
them in a single Window operator over one sorted pass.  Rows with NULL
value carry no evidence and are excluded (documented; include them
upstream as d=0 by coalescing if pass-through is wanted).  Skew: a
pathologically hot entity serializes into one task's sort — the
sessionize.py salting caveat applies.

No reference counterpart: schemasaurus has no sequential statistics;
engine-original monitoring machinery (SURVEY §2D drift family).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["FP_SCALE", "quantize", "cusum_changepoints"]

FP_SCALE = 1_000_000.0


def quantize(x: float) -> int:
    """Driver-side twin of the in-plan floor(x*1e6 + 0.5) grid."""
    return int(math.floor(x * FP_SCALE + 0.5))


def cusum_changepoints(
    df: DataFrame,
    target: float,
    threshold: float,
    slack: float = 0.0,
    value_col: str = "value",
    ts_col: str = "ts",
    entity_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """One row per non-NULL-value event:

    ``(<entity_col>, <id_col>, ts_us, value, cusum_up_q, cusum_down_q,
    alarm_up, alarm_down)``

    * ``cusum_*_q``: the one-sided CUSUM statistics on the int64 micro
      grid (divide by 1e6 for engineering units).
    * ``alarm_*``: 0/1 long, statistic strictly above the quantized
      threshold.
    """
    if threshold <= 0:
        raise ValueError("threshold must be positive")
    q_ref_up = quantize(target) + quantize(slack)
    q_ref_dn = quantize(target) - quantize(slack)
    q_h = quantize(threshold)

    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(entity_col),
        F.col(id_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.col(value_col).alias("value"),
        F.floor(F.col(value_col) * F.lit(FP_SCALE) + F.lit(0.5))
        .cast("long")
        .alias("_qv"),
    )
    w = (
        Window.partitionBy(entity_col)
        .orderBy("ts_us", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = base.select(
        "*",
        F.sum(F.col("_qv") - F.lit(q_ref_up)).over(w).alias("_cu"),
        F.sum(F.lit(q_ref_dn) - F.col("_qv")).over(w).alias("_cd"),
    )
    # second Window over the SAME (partition, order) — Catalyst reuses the
    # exchange and sort, so the whole detector is still one shuffle
    s_up = F.col("_cu") - F.least(
        F.lit(0).cast("long"), F.min("_cu").over(w)
    )
    s_dn = F.col("_cd") - F.least(
        F.lit(0).cast("long"), F.min("_cd").over(w)
    )
    return cums.select(
        entity_col,
        id_col,
        "ts_us",
        "value",
        s_up.cast("long").alias("cusum_up_q"),
        s_dn.cast("long").alias("cusum_down_q"),
        (s_up > q_h).cast("long").alias("alarm_up"),
        (s_dn > q_h).cast("long").alias("alarm_down"),
    )
