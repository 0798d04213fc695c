"""Ordered event funnel: how many users complete step 1, then step 2
strictly after their step 1, then step 3 strictly after their step 2 —
the conversion query behind every ingest/engagement dashboard, and the
pipeline-health view of multi-stage event flows (e.g. ingest → validate
→ publish per producer).  No reference counterpart (schemasaurus has no
event analytics) — §2E training-data/pipeline-family mandate.

Semantics (deterministic): per user, ``t_1 = min ts`` of step 1;
``t_k = min ts`` of a step-k event with ``ts > t_{k-1}`` (strict order,
earliest-completion path); an optional ``horizon`` additionally requires
``t_k <= t_1 + horizon``.  Earliest-completion is the standard funnel
definition AND the one with a per-user closed form (a chain of mins), so
any SQL engine reproduces it without sequence-matching state machines.

Scale shape
-----------
* NO per-user event collection (``collect_list`` over a hot user is the
  classic funnel OOM): each step is a filtered scan + user-keyed
  map-side-combined min, then a join against the (shrinking) set of
  users who reached the previous step.
* The per-step join key is the user id — the same key every step, so
  AQE coalesces and the shrinking right side becomes broadcast-sized
  after the first conversion cliff.
* Output is k rows (steps), with conversion ratios rounded to 6 places
  from exact int64 counts (the quartiles-family float discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel"]


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    horizon_seconds: int | None = None,
) -> DataFrame:
    """One row per funnel step: ``(step, event_type, n_users,
    conv_from_prev, conv_from_first)``."""
    if len(steps) < 2:
        raise ValueError(f"funnel: need >= 2 steps, got {len(steps)}")
    ev = events.where(F.col(user_col).isNotNull()).select(
        F.col(user_col).alias("u"), F.col(type_col).alias("t"), F.col(ts_col).alias("ts")
    )
    reached = (
        ev.where(F.col("t") == steps[0]).groupBy("u").agg(F.min("ts").alias("t_prev"))
    )
    # t_first rides along for the horizon cut
    reached = reached.withColumn("t_first", F.col("t_prev"))
    counts = [reached.count()]
    for s in steps[1:]:
        nxt = (
            ev.where(F.col("t") == s)
            .join(reached, "u")
            .where(F.col("ts") > F.col("t_prev"))
        )
        if horizon_seconds is not None:
            nxt = nxt.where(
                F.col("ts") <= F.col("t_first") + F.expr(f"INTERVAL {int(horizon_seconds)} SECONDS")
            )
        reached = nxt.groupBy("u", "t_first").agg(F.min("ts").alias("t_prev"))
        counts.append(reached.count())
    spark = events.sparkSession
    rows = [
        (i + 1, s, n, counts[i - 1] if i > 0 else None, counts[0])
        for i, (s, n) in enumerate(zip(steps, counts))
    ]
    # ratios via the engine's round (HALF_UP), not Python's banker's
    # rounding — the oracle replays the identical expression
    return spark.createDataFrame(
        rows,
        "step int, event_type string, n_users bigint,"
        " prev_n bigint, first_n bigint",
    ).select(
        "step",
        "event_type",
        "n_users",
        F.when(
            F.col("prev_n").isNotNull() & (F.col("prev_n") > 0),
            F.round(F.col("n_users") / F.col("prev_n"), 6),
        ).alias("conv_from_prev"),
        F.when(
            F.col("first_n") > 0, F.round(F.col("n_users") / F.col("first_n"), 6)
        ).alias("conv_from_first"),
    )
