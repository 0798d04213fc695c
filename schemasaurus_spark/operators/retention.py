"""Retention cohort matrix: users grouped by their first-activity week,
tracked by how many are still active k weeks later — the longitudinal
health view of any event flow (user engagement; equally producer
retention in an ingest pipeline: which onboarding cohort of data
producers still delivers k weeks on).  No reference counterpart — §2E
pipeline-observability family.

Semantics (deterministic): cohort(u) = Monday-truncated week of the
user's first event; a user is active in week w if they have ANY event
that week; one output row per (cohort_week, weeks_since) with the
distinct active-user count and the retention ratio vs the cohort's
size.  Week truncation is ISO/Monday in both Spark and DuckDB, and
weeks_since = day-difference DIV 7 is exact because both endpoints are
week-truncated.

Scale shape
-----------
* Two map-side-combined aggregations over the events scan: per-user
  first ts, and the DISTINCT (user, week) activity set (both shuffle on
  the user key — the second reuses the first's partitioning when AQE
  coalesces them).
* The (user-first × activity) join is user-keyed; the output matrix is
  (n_cohorts × horizon) rows — metadata-sized — and cohort sizes join
  BROADCAST.
* Ratios round in-engine to 6 places from exact int64 counts (the
  quartiles-family float discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["retention_cohorts"]


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, weeks_since, n_active, cohort_size, retention)."""
    ev = events.where(F.col(user_col).isNotNull()).select(
        F.col(user_col).alias("u"), F.col(ts_col).alias("ts")
    )
    first = ev.groupBy("u").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "u", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    cohort_sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cells = (
        active.join(first, "u")
        .select(
            "cohort_week",
            F.expr("datediff(week, cohort_week) DIV 7").alias("weeks_since"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return cells.join(F.broadcast(cohort_sizes), "cohort_week").select(
        "cohort_week",
        "weeks_since",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
    )
