"""Small-file compaction planner: group a table's data files into
target-sized rewrite tasks — the maintenance pass every Iceberg/Delta
table needs at scale (streaming ingest and per-partition writes leave
thousands of KB-sized files whose open/seek overhead dominates scans
long before bytes do).

Semantics (deterministic, engine-portable): within each table
partition, files are laid out in ``file_id`` order and binned by the
CUMULATIVE BYTE OFFSET at which each file starts::

    bin = (running_total_before_file) DIV target_bytes

— i.e. output file k covers byte range [k*target, (k+1)*target) of the
partition's concatenated content.  This is the planning shape of
Iceberg's bin-pack rewrite with a defined order instead of first-fit
(first-fit is sequential state; offset binning is one window function,
identical in any SQL engine, and its bins still land within ~1 file of
the target size).  A bin with one file that already meets the target is
a no-op task (``needs_rewrite = false``); everything else is a rewrite
task reading ``n_files`` inputs and writing one output.

No reference counterpart (table layout is engine territory).

Scale shape
-----------
* The input is a FILE MANIFEST, not data: metadata-sized (100 TB at
  256 MB/file = ~400k rows).  One shuffle on the table-partition key;
  the cumulative sum is partition-local (no global sort).
* A pathologically hot table partition (millions of tiny files) sorts
  locally within its task — the window never crosses partitions; if one
  partition alone exceeded executor memory the same plan runs with the
  manifest pre-bucketed by (part, file_id range), which this operator's
  bin ids are stable under (bins depend only on prefix sums).
* Output is bin-sized (≤ total_bytes/target + n_partitions rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["compaction_plan"]


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    part_col: str = "part",
    file_col: str = "file_id",
    size_col: str = "size_bytes",
) -> DataFrame:
    """One row per planned output file:
    ``(part, bin_id, n_files, total_bytes, first_file, last_file,
    needs_rewrite)``.  NULL/negative sizes are rejected upstream
    concerns; files of size 0 are legal (empty commits) and bin with
    their neighbors."""
    if target_bytes <= 0:
        raise ValueError(
            f"compaction_plan: target_bytes must be > 0, got {target_bytes}"
        )
    w = (
        Window.partitionBy(part_col)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # integer DIV, not float '/': byte offsets near 2^53 would round a
    # k*target-1 quotient up across the bin boundary in double arithmetic
    binned = files.select(
        F.col(part_col).alias("part"),
        F.col(file_col).alias("file_id"),
        F.col(size_col).alias("size_bytes"),
        (F.sum(size_col).over(w) - F.col(size_col)).alias("_start"),
    ).select(
        "part",
        "file_id",
        "size_bytes",
        F.expr(f"_start DIV {int(target_bytes)}").alias("bin_id"),
    )
    return binned.groupBy("part", "bin_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("size_bytes").alias("total_bytes"),
        F.min("file_id").alias("first_file"),
        F.max("file_id").alias("last_file"),
        (
            (F.count(F.lit(1)) > 1)
            | (F.sum("size_bytes") < F.lit(target_bytes))
        ).alias("needs_rewrite"),
    )
