"""Z-order (Morton-curve) multi-dimensional clustering: the table-layout
operator behind Delta/Iceberg ``OPTIMIZE ZORDER BY`` — interleave the
bits of several scaled columns into one sort key so that range-
partitioning on THAT key keeps every partition's per-column min/max
ranges tight on ALL dimensions at once.  Tight ranges are what parquet/
Iceberg file-skipping prunes with: a filter on ANY z-ordered column
skips most files, where a single-column sort helps only its own column.

No reference counterpart (layout is engine territory); the construction
is the public Morton code (Morton 1966; used verbatim by Delta OSS and
Iceberg's z-order rewrite action).

Scale shape
-----------
* Column scaling uses global min/max from ONE aggregate, broadcast back
  (``crossJoin(broadcast(1-row))``) — no window, no rank shuffle.  The
  scaled value is EXACT integer arithmetic
  ``((v - mn) * (2^bits - 1)) DIV (mx - mn)`` so any SQL engine
  reproduces the key bit-for-bit (a rank-based variant would need a
  corpus-wide sort; linear scaling is what Iceberg's zorder UDF does).
* The interleave is a folded OR of shift/mask expressions — pure JVM
  codegen in the scan stage, no UDF, no shuffle.
* ``zorder_layout`` reports per-FIXED-WIDTH-bucket stats (bucket = z
  DIV width): deterministic and SQL-replicable, standing in for "one
  file per bucket".  The production write path is ``cluster_by_zorder``
  (``repartitionByRange`` on z — sampled boundaries, balanced output
  files) followed by a partitioned write; its per-file min/max tightness
  is what the layout report measures deterministically.

Overflow bound: ``(v - mn) * (2^bits - 1)`` must fit int64, i.e. the
column span must be < 2^(63-bits); total z width ``bits * len(cols)``
must be <= 62.  Both are validated.  NULL dimension values yield a NULL
z (they cluster together in the NULL bucket, reported as bucket NULL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "with_zorder_key", "zorder_layout", "cluster_by_zorder"]


def zorder_key(scaled: list[Column], bits: int) -> Column:
    """Morton-interleave already-scaled integer columns (each in
    ``[0, 2^bits)``): bit b of dimension j lands at position
    ``b * k + j``."""
    k = len(scaled)
    if k < 1:
        raise ValueError("zorder_key: need at least one column")
    if bits * k > 62:
        raise ValueError(f"zorder_key: bits*k = {bits * k} exceeds 62")
    parts = []
    for j, c in enumerate(scaled):
        for b in range(bits):
            parts.append(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * k + j)
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def with_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8, key_name: str = "_z"
) -> DataFrame:
    """``df`` plus the Morton key over ``cols`` (numeric), each linearly
    scaled to ``[0, 2^bits)`` by its global min/max (one broadcast
    aggregate; constant columns scale to 0)."""
    if not cols:
        raise ValueError("with_zorder_key: need at least one column")
    stats = df.agg(
        *[F.min(c).cast("long").alias(f"_mn_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("long").alias(f"_mx_{i}") for i, c in enumerate(cols)],
    )
    j = df.crossJoin(F.broadcast(stats))
    maxv = (1 << bits) - 1
    scaled = []
    for i, c in enumerate(cols):
        mn, mx = F.col(f"_mn_{i}"), F.col(f"_mx_{i}")
        span = mx - mn
        prod = (F.col(c).cast("long") - mn) * F.lit(maxv)
        # exact int64 division (operands non-negative): subtracting the
        # modulus first keeps the quotient exact even where a float
        # floor(a/b) would round past 2^53
        q = ((prod - prod % span) / span).cast("long")
        s = F.when(span > 0, q).otherwise(F.lit(0))
        scaled.append(s.cast("long"))
    return j.withColumn(key_name, zorder_key(scaled, bits)).drop(
        *[f"_mn_{i}" for i in range(len(cols))],
        *[f"_mx_{i}" for i in range(len(cols))],
    )


def zorder_layout(
    df: DataFrame, cols: list[str], bits: int = 8, n_buckets: int = 16
) -> DataFrame:
    """Deterministic layout report: fixed-width z-buckets with per-bucket
    row counts and per-dimension min/max — the data-skipping ranges a
    z-ordered file layout would expose to a scan planner.  Columns:
    ``bucket, n_rows, <col>_min, <col>_max ...``."""
    if n_buckets < 1:
        raise ValueError("zorder_layout: n_buckets must be >= 1")
    zd = with_zorder_key(df, cols, bits)
    total = 1 << (bits * len(cols))
    width = -(-total // n_buckets)  # ceil
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return (
        zd.withColumn("bucket", F.floor(F.col("_z") / width).cast("long"))
        .groupBy("bucket")
        .agg(*aggs)
    )


def cluster_by_zorder(
    df: DataFrame, cols: list[str], bits: int = 8, n_partitions: int | None = None
) -> DataFrame:
    """The production write path: range-partition on the Morton key
    (sampled boundaries -> balanced files) and drop the key.  Follow
    with ``.write.parquet(...)``; each output file's per-column min/max
    footer ranges are then tight on every z-ordered dimension."""
    zd = with_zorder_key(df, cols, bits)
    parted = (
        zd.repartitionByRange(n_partitions, "_z")
        if n_partitions
        else zd.repartitionByRange("_z")
    )
    return parted.drop("_z")
