"""Join-key skew profile: the pre-flight measurement behind every skew
decision this engine makes (uniqueness.py's salted two-phase aggregate,
session.py's AQE skew-join config, dedup.py's bucket caps) — "how hot is
the hottest key, and what salt factor would flatten it?" answered as
data BEFORE a 10^12-row join is launched, instead of discovered as a
straggler task at hour three.

Output (one row per top-N key by count, plus every key above the
reported share even if outside the top N is NOT needed — the top-N by
count IS the set of possible offenders):
``(key, cnt, share, cum_share, rank, salt_factor)`` where

* ``share`` = key's fraction of all rows (exact integer counts, one
  IEEE division — engine-portable);
* ``cum_share`` = running share of the top keys down to this rank (how
  much of the table the head occupies);
* ``salt_factor`` = ``ceil(cnt * n_distinct / n_rows)`` — how many
  salted sub-keys this key needs so its expected per-sub-key load drops
  to the table's average key load (1 = not skewed; the number feeds
  uniqueness.py's salting directly).

Scale shape: one map-side-combined ``groupBy(key).count`` (the thing
being profiled is by definition too big to inspect otherwise), a 1-row
totals aggregate broadcast back, and TakeOrdered for the top-N — the
key-count table is never globally sorted.  NULL keys profile like any
other value (a NULL-heavy join key is the most common real skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["skew_profile"]


def skew_profile(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """Top-``top_n`` hottest values of ``key_col`` with share, cumulative
    share, and the salt factor that would flatten each to average load."""
    if top_n < 1:
        raise ValueError("skew_profile: top_n must be >= 1")
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    totals = counts.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("_n_rows"),
        F.count(F.lit(1)).cast("long").alias("_n_distinct"),
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("key").asc_nulls_last()).limit(
        top_n
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc_nulls_last())
    j = top.crossJoin(F.broadcast(totals))
    share = F.col("cnt") / F.col("_n_rows")
    salt = F.ceil(
        (F.col("cnt") * F.col("_n_distinct")).cast("double") / F.col("_n_rows")
    ).cast("long")
    return (
        j.withColumn("rank", F.row_number().over(w))
        .withColumn("share", share)
        .withColumn("cum_share", F.sum(share).over(w))
        .withColumn("salt_factor", salt)
        .select("rank", "key", "cnt", "share", "cum_share", "salt_factor")
    )
