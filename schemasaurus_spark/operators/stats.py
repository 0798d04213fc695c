"""Per-column statistics for the validation pass (SURVEY.md §2D):
null rate, distinct count (exact for the correctness gate, HLL++ for scale),
min/max, length histograms, category counts.

Everything is a single groupBy-free aggregate or a map-side-combinable
groupBy — one scan, partial aggregation before any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_stats(df: DataFrame, columns: list[str], approx: bool = False) -> DataFrame:
    """One output row per column: n, nulls, null_rate, distinct, min, max.

    ``approx=True`` switches distinct counting to HyperLogLog++
    (``approx_count_distinct``, rsd 5%) — the 100TB path; exact mode is used
    where results must match a SQL oracle bit-for-bit.
    """
    aggs = []
    for c in columns:
        distinct = (
            F.approx_count_distinct(c).alias(f"{c}__distinct")
            if approx
            else F.count_distinct(F.col(c)).alias(f"{c}__distinct")
        )
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            distinct,
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    # unpivot to (column, n, nulls, null_rate, distinct, min, max)
    rows = []
    for c in columns:
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__n").alias("n"),
                F.col(f"{c}__nulls").alias("nulls"),
                (F.col(f"{c}__nulls") / F.col(f"{c}__n")).alias("null_rate"),
                F.col(f"{c}__distinct").alias("distinct"),
                F.col(f"{c}__min").alias("min"),
                F.col(f"{c}__max").alias("max"),
            )
        )
    return (
        wide.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.*")
    )


def length_histogram(
    df: DataFrame, col: str, lo: int, hi: int, n_buckets: int,
    length_of: bool = False,
) -> DataFrame:
    """width_bucket histogram; ``length_of=True`` measures string length."""
    v = F.length(F.col(col)) if length_of else F.col(col)
    return (
        df.where(F.col(col).isNotNull())
        .select(F.width_bucket(v.cast("double"), F.lit(float(lo)), F.lit(float(hi)), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def category_counts(df: DataFrame, col: str) -> DataFrame:
    """Category frequency table — the chi-square drift input."""
    return df.groupBy(F.col(col).alias("category")).agg(F.count(F.lit(1)).alias("cnt"))


def corpus_rollup(
    df: DataFrame,
    dims: list[str],
    measure_col: str = "n_chars",
    text_col: str = "text",
    cube: bool = False,
) -> DataFrame:
    """Multi-dimensional quality profile via ROLLUP (or CUBE) over the
    grouping dims: per (dim..., aggregation level) one row of
    ``gid, n_docs, n_texts, total_measure, avg_measure``.

    The curation dashboard shape — per-source, per-(source, lang), and
    corpus-total quality in ONE pass.  Grouping sets are strictly better
    at scale than the K separate groupBys they replace: Spark expands the
    sets map-side and partially aggregates each, so the input is scanned
    once and the shuffle carries |groups summed over levels| rows, all
    map-side combined.  ``gid`` is ``grouping_id()`` (bit per dim,
    leftmost dim = most significant), which disambiguates a genuinely
    NULL dim value from a rolled-up level — never rely on the NULL
    placeholder alone.  avg is rounded to 6 places so the cross-engine
    hash compares IEEE-stable text."""
    if not dims:
        raise ValueError("dims must name at least one grouping column")
    grouped = df.cube(*dims) if cube else df.rollup(*dims)
    return grouped.agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.col(text_col)).alias("n_texts"),
        F.sum(F.col(measure_col)).alias("total_measure"),
        F.round(F.avg(F.col(measure_col)), 6).alias("avg_measure"),
    )


def quantile_vector(df: DataFrame, col: str, probs: list[float], rsd: float = 0.01):
    """Approximate quantile vector (the KS drift input); driver-side list."""
    return df.stat.approxQuantile(col, probs, rsd)
