"""Key-uniqueness checks under skew (SURVEY.md §2D, §7 trap 10).

Salting policy — measured, not assumed (16M-doc corpus with ~20% hot-prefix
keys, local[32], best of 2):

* **counts** (``duplicate_keys``): one-phase groupBy wins (1.4s vs 2.3s for
  the explicit ``(key, salt)`` pre-phase).  Spark's map-side partial
  aggregation already reduces each task to <=1 row per key before the
  shuffle, so even a key holding half the table contributes only
  ``n_tasks`` rows to its reducer; the salt pre-phase just pays a second
  full shuffle for nothing.
* **non-reducible payloads** (``duplicate_key_rows``: example rows per hot
  key): the salted two-phase IS load-bearing.  A ``collect_list`` over an
  unsalted hot key funnels every occurrence into one reducer; grouping by
  ``(key, salt)`` first caps each reducer's payload at ``limit`` rows per
  salt, then phase 2 merges ``salt_buckets`` bounded lists — reduce-side
  row count changes from O(occurrences) to O(salt_buckets * limit).

The north rule's "salted repartition + hash-aggregate on doc_id" therefore
lives where it changes the reduce-side row count, and the count path stays
on the cheaper plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, key: str) -> DataFrame:
    """Keys appearing more than once, with their counts.  One-phase: the
    map-side partial aggregation bounds reduce-side rows per key at the
    task count, so no salt is needed for a pure count (see module note)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 1)
    )


def duplicate_key_rows(
    df: DataFrame,
    key: str,
    row_id: str,
    limit: int = 5,
    salt_buckets: int = 16,
) -> DataFrame:
    """Up to ``limit`` example row ids per duplicate key — the salted
    two-phase aggregation (north rule).  Phase 1 groups by (key, salt) so a
    hot key's occurrences spread over ``salt_buckets`` reducers, each
    keeping at most ``limit`` examples; phase 2 merges the bounded lists."""
    salted = df.select(
        F.col(key),
        F.col(row_id),
        F.pmod(F.xxhash64(F.col(row_id).cast("string")), F.lit(salt_buckets)).alias("_salt"),
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.slice(F.sort_array(F.collect_list(row_id)), 1, limit).alias("_sample"),
    )
    return (
        partial.groupBy(key)
        .agg(
            F.sum("_cnt").alias("cnt"),
            F.slice(
                F.sort_array(F.flatten(F.collect_list("_sample"))), 1, limit
            ).alias("example_rows"),
        )
        .where(F.col("cnt") > 1)
    )


def uniqueness_report(df: DataFrame, key: str) -> DataFrame:
    """Single-row summary: total, distinct, duplicate keys, duplicate rows."""
    dupes = duplicate_keys(df, key)
    total = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col(key)).alias("n_keys"),
    )
    dup_agg = dupes.agg(
        F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("dup_keys"),
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("dup_rows"),
    )
    return total.crossJoin(dup_agg)
