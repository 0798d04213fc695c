"""Key-uniqueness check under skew: salted two-phase aggregation.

Phase 1 groups by (key, salt) so a hot key's rows are spread over ``salt``
reducers; phase 2 sums the per-salt partial counts per key.  Spark's partial
(map-side) aggregation already pre-reduces within a task — the explicit salt
additionally bounds the *reduce-side* row count per reducer for keys hot
enough to dominate a partition at 100TB (SURVEY.md §2D, §7 trap 10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, key: str, salt_buckets: int = 16) -> DataFrame:
    """Keys appearing more than once, with their counts."""
    salted = df.select(
        F.col(key),
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)).alias("_salt"),
    )
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_cnt"))
    return (
        partial.groupBy(key)
        .agg(F.sum("_cnt").alias("cnt"))
        .where(F.col("cnt") > 1)
    )


def uniqueness_report(df: DataFrame, key: str, salt_buckets: int = 16) -> DataFrame:
    """Single-row summary: total, distinct, duplicate keys, duplicate rows."""
    dupes = duplicate_keys(df, key, salt_buckets)
    total = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col(key)).alias("n_keys"),
    )
    dup_agg = dupes.agg(
        F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("dup_keys"),
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("dup_rows"),
    )
    return total.crossJoin(dup_agg)
