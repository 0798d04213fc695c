"""Bidirectional cross-table coverage report — the SUMMARY counterpart of
the row-level referential checks (operators/referential.py).

``dangling_refs`` answers "WHICH left rows have no right match"; this
answers the audit question first: "HOW covered are these two tables in
each direction" — documents vs embedding store, ingest log vs corpus,
changelog vs snapshot — as one tiny verdict row a gate or dashboard can
consume.

Scale shape: ONE shuffle total.  Both sides are tagged and unioned as
thin (key, left_cnt, right_cnt) rows, a single key-groupBy (map-side
combinable sums — also the distinct) collapses to per-key side-counts,
and a second metadata-sized aggregate reduces those to the report.  No
full-outer join, no per-side distinct pass, no row wider than ~24 bytes
ever shuffles.  Hot keys are safe: sums are algebraic, so a key with
10^9 duplicate rows combines map-side.

NULL keys never match anything (SQL join semantics); they are excluded
from key counts and surfaced separately as ``n_left_null_rows`` /
``n_right_null_rows`` so a NULL-ridden key column cannot silently
inflate coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coverage_report(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str | None = None,
) -> DataFrame:
    """One-row bidirectional coverage summary between two tables.

    Columns: n_left / n_right (row counts), n_left_keys / n_right_keys
    (distinct non-NULL keys), n_shared_keys, n_left_only_keys /
    n_right_only_keys, n_left_null_rows / n_right_null_rows,
    left_coverage / right_coverage (shared / side keys, NULL on an
    empty side — consumers decide whether absence passes their gate).
    """
    rk = right_key or left_key
    tagged = left.select(
        F.col(left_key).cast("string").alias("key"),
        F.lit(1).alias("lc"),
        F.lit(0).alias("rc"),
    ).unionAll(
        right.select(
            F.col(rk).cast("string").alias("key"),
            F.lit(0).alias("lc"),
            F.lit(1).alias("rc"),
        )
    )
    per_key = tagged.groupBy("key").agg(
        F.sum("lc").alias("lc"), F.sum("rc").alias("rc")
    )
    k = F.col("key").isNotNull()
    in_l, in_r = F.col("lc") > 0, F.col("rc") > 0
    agg = per_key.agg(
        F.coalesce(F.sum("lc"), F.lit(0)).alias("n_left"),
        F.coalesce(F.sum("rc"), F.lit(0)).alias("n_right"),
        F.count(F.when(k & in_l, 1)).alias("n_left_keys"),
        F.count(F.when(k & in_r, 1)).alias("n_right_keys"),
        F.count(F.when(k & in_l & in_r, 1)).alias("n_shared_keys"),
        F.count(F.when(k & in_l & ~in_r, 1)).alias("n_left_only_keys"),
        F.count(F.when(k & ~in_l & in_r, 1)).alias("n_right_only_keys"),
        F.coalesce(F.sum(F.when(~k, F.col("lc"))), F.lit(0)).alias(
            "n_left_null_rows"
        ),
        F.coalesce(F.sum(F.when(~k, F.col("rc"))), F.lit(0)).alias(
            "n_right_null_rows"
        ),
    )
    shared = F.col("n_shared_keys").cast("double")
    # explicit NULL (not 0/0 = NaN, which DuckDB renders as NULL but Spark
    # as NaN) when a side has no keys at all
    return agg.select(
        "*",
        F.when(F.col("n_left_keys") > 0, shared / F.col("n_left_keys")).alias(
            "left_coverage"
        ),
        F.when(F.col("n_right_keys") > 0, shared / F.col("n_right_keys")).alias(
            "right_coverage"
        ),
    )
