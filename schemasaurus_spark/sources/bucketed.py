"""Spark-native bucketed table layout: pay the partitioning shuffle ONCE
at write time, then run every doc_id-keyed join / aggregation with NO
Exchange in the plan.

Reference tie-in: the reference validates one document at a time, so key
co-location never arises there; this module is pure 100 TB engineering
for the north-rule workload (BASELINE.json: uniqueness, referential and
enrichment joins over a 10^12-doc corpus).  It is the warehouse-native
sibling of ``sources/io.py``'s Iceberg ``bucket(N, doc_id)`` partition
transform: Iceberg buckets FILES for scan pruning; ``bucketBy`` buckets
files AND records the hash function + bucket count in the catalog, which
is what lets Catalyst drop the Exchange on both sides of a join.

Why this matters at 10^12 docs: the corpus table joins against the
embedding store, the media catalog, per-doc verdict tables, and its own
next daily increment — every one of those is a doc_id equi-join.  Unkeyed
layout ⟹ every join shuffles ~100 TB twice (both sides).  Bucketed layout
⟹ the write shuffles once, and afterwards each join task reads bucket i
of the left table and bucket i of the right table and merges in place:
zero network beyond the scan itself, and bucket pruning turns point
lookups into a 1/N scan (``SelectedBucketsCount: 1 out of N`` in the
scan node).

Sizing guidance: choose ``n_buckets`` so one bucket of the LARGEST
co-located table fits a task comfortably — at 100 TB, 2^16 buckets ≈
1.5 GB/bucket; the count must match across co-located tables (or differ
by a power-of-two multiple with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled=true``, which merges
the finer side k-into-1 instead of shuffling it).

Correctness note: results are IDENTICAL to the unkeyed plan — this module
changes physical layout only, which is why its evidence lives in plan
assertions (``exchange_count == 0``) plus value-equality against the
plain join, not in a SQL oracle row.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed by ``key`` into ``n_buckets`` buckets,
    registered in the session catalog as ``table``.

    ``sort=True`` additionally sorts within each bucket by ``key`` —
    with one file per bucket this lets SortMergeJoin skip even the
    per-partition sort.  ``path`` makes the table external (files land
    there; the catalog holds layout metadata).  The write itself shuffles
    on ``key`` — that is the one-time cost the layout amortizes.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the join key: Catalyst sees matching
    ``HashPartitioning`` output from both scans and plans a SortMergeJoin
    with no Exchange on either side.  Pure convenience wrapper — the
    no-shuffle behavior comes from the catalog metadata, not this code."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def physical_plan(df: DataFrame) -> str:
    """The planned physical plan as a string (pre-execution; with AQE this
    is the initial plan — AQE only coalesces or re-plans EXISTING
    exchanges, so a plan with zero Exchange nodes stays exchange-free)."""
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan — the
    quantity bucketed layout exists to drive to zero.  Broadcast exchanges
    are excluded (they move a metadata-sized side, not the corpus)."""
    # \bExchange\b matches the shuffle operator (hash / range /
    # SinglePartition) but not BroadcastExchange or ReusedExchange — both
    # are single words, so no word boundary precedes their "Exchange"
    return len(re.findall(r"\bExchange\b", physical_plan(df)))


def selected_buckets(df: DataFrame) -> tuple[int, int] | None:
    """Parse the scan's bucket-pruning report: ``(selected, total)`` from
    ``SelectedBucketsCount: k out of N``, or None when the scan is not
    bucket-pruned.

    Planner interaction worth knowing: Spark's
    ``DisableUnnecessaryBucketedScan`` rule (conf
    ``spark.sql.sources.bucketing.autoBucketedScan.enabled``, default on)
    reverts to a plain file scan when no JOIN/AGGREGATE needs the bucket
    distribution — it does not credit filter pruning — so a bare point
    lookup scans all buckets.  For lookup-heavy workloads set that conf
    to ``false`` (scoped; it costs nothing else) and the same query scans
    1/N of the files, which this function makes visible."""
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", physical_plan(df))
    return (int(m.group(1)), int(m.group(2))) if m else None


def bucketed_duplicate_keys(spark: SparkSession, table: str, key: str) -> DataFrame:
    """Duplicate-key detection over a bucketed table with ZERO shuffles:
    ``groupBy(key)`` runs as a per-bucket HashAggregate because the layout
    already co-locates equal keys.  The layout-aware complement to
    ``operators/uniqueness.py``'s salted two-phase (which exists for
    UNKEYED input); on a table that is already bucketed by doc_id the
    salted repartition would be a pure waste of a 100 TB shuffle."""
    return (
        spark.table(table)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 1)
    )
