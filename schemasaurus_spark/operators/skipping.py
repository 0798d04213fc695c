"""Zone maps (data-skipping statistics) + layout pruning evaluation —
the lakehouse metadata family's third member, next to bin-pack
compaction planning (operators/compaction.py) and multi-column
clustering layout (operators/zorder.py).

Every Iceberg/Delta/parquet reader prunes files from per-file min/max
column statistics before touching data; how much a predicate actually
prunes is a property of the LAYOUT (which rows share a file), and the
decision to rewrite 100 TB into a clustered layout is made by comparing
candidate layouts' skipping rates BEFORE the rewrite.  ``zone_maps``
computes the per-file statistics; ``range_skipping_profile`` evaluates
one range predicate against one-or-many candidate layouts in a SINGLE
scan of the table (each row contributes to every candidate's file via a
generator explode — k layouts cost one pass, not k).

Scale shape: the only shuffle carries (layout, file_id) partial
aggregates already combined map-side, so the exchange is
files-per-layout-sized — metadata, never data.  The output exposes both
the metadata decision (``prunable``: max < lo OR min > hi OR all-NULL)
and the ground truth (``n_matching``: exact rows the predicate selects
in that file), so false keeps — files the zone map retains that contain
zero matches, the quantity layout rewrites exist to kill — are read
directly off the result.  NULL semantics: min/max ignore NULLs, a range
predicate matches no NULL, so an all-NULL file (min IS NULL) is
prunable and rows with NULL values never count as matches.

No reference counterpart (SURVEY.md §2E training-data mandate — the
reference is a single-process schema walker with no storage layer).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zone_maps(
    df: DataFrame, file_col: str | Column, value_col: str = "n_chars"
) -> DataFrame:
    """(file_id, n_rows, min_v, max_v, n_nulls) per file — the statistics
    block a manifest stores for one column.  One map-side-combined
    groupBy; ``file_col`` may be any expression assigning rows to files."""
    fc = F.col(file_col) if isinstance(file_col, str) else file_col
    v = F.col(value_col)
    return df.groupBy(fc.alias("file_id")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
        F.sum(v.isNull().cast("long")).alias("n_nulls"),
    )


def range_skipping_profile(
    df: DataFrame,
    layouts: Mapping[str, Column],
    value_col: str,
    lo: int,
    hi: int,
) -> DataFrame:
    """Evaluate ``value_col BETWEEN lo AND hi`` against every candidate
    layout's zone maps in one scan.

    ``layouts`` maps layout name -> file-assignment expression (e.g.
    ingestion order ``doc_id DIV 64`` vs value-clustered ``n_chars DIV
    32``).  Returns one row per (layout, file_id): the file's zone-map
    stats, the metadata verdict ``prunable``, and the exact
    ``n_matching`` row count — so a layout's skipping rate and false-keep
    count need no second pass."""
    v = F.col(value_col)
    tagged = df.select(
        v.alias("_v"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("layout"), expr.alias("file_id")
                    )
                    for name, expr in layouts.items()
                ]
            )
        ).alias("_t"),
    ).select("_v", "_t.layout", "_t.file_id")
    match = (F.col("_v") >= F.lit(lo)) & (F.col("_v") <= F.lit(hi))
    maps = tagged.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("_v").alias("min_v"),
        F.max("_v").alias("max_v"),
        # NULL value -> NULL predicate -> not a match (never NULL the sum)
        F.sum(F.when(match, 1).otherwise(0)).alias("n_matching"),
    )
    return maps.withColumn(
        "prunable",
        F.col("min_v").isNull()
        | (F.col("max_v") < F.lit(lo))
        | (F.col("min_v") > F.lit(hi)),
    )
