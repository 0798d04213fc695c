"""Cross-source overlap matrix: for every pair of corpus sources, how
much verbatim content they share — the dedup DIAGNOSTIC that tells a
curation pipeline *where* its duplication comes from (mirror sites,
syndicated feeds, re-crawls) before any pairwise doc dedup runs, and
the measurement behind per-source dedup budgets.  No reference
counterpart — §2E dedup family.

Method: every ``window``-token window of every document (the shared
tokenization, operators/tokenize.py) keyed by ``xxhash64``; per source,
the DISTINCT window-hash set; per unordered source pair, the size of
the intersection plus each side's set size and the Jaccard overlap.

Scale shape
-----------
* NOT a self-join on windows: windows are grouped by hash once and the
  bounded per-hash source set (≤ n_sources, single digits) explodes into
  its pairs — corpus-sized data crosses the wire exactly twice (the
  distinct and the group-by-hash, both map-side-combinable), and the
  pair explosion is O(windows × n_sources²) only for windows shared at
  all.
* Per-source totals and the final denominators join BROADCAST (the
  matrix is n_sources² rows — metadata-sized).
* Collision semantics: xxhash64 can only MERGE two distinct windows
  (overstating overlap by ≤1 per collision), P ~ n_windows²/2^64; the
  oracle groups raw window strings, independently confirming the hashed
  engine (the dedup-family convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schemasaurus_spark.operators.dedup import _pin
from schemasaurus_spark.operators.tokenize import tokens_expr

__all__ = ["source_overlap_matrix"]


def source_overlap_matrix(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    window: int = 5,
) -> DataFrame:
    """(source_a, source_b, shared_windows, windows_a, windows_b,
    jaccard) for every source pair sharing at least one window;
    source_a < source_b, jaccard = |∩| / |∪| rounded to 6 places."""
    if window < 1:
        raise ValueError(f"source_overlap_matrix: window must be >= 1, got {window}")
    base = docs.where(
        F.col(text_col).isNotNull()
        & (F.trim(F.col(text_col)) != "")
        & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("src"), tokens_expr(text_col).alias("_toks"))
    # pinned: the distinct feeds three consumers (group-by-hash, and the
    # two per-source denominators) — unpinned, Spark re-scans and
    # re-hashes the corpus once per consumer (measured: 3 FileScans, no
    # exchange reuse across the alias-renamed subplans)
    wins = _pin(
        base.where(F.size("_toks") >= window)
        .select(
            "src",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(_toks) - {window}), "
                    f"i -> xxhash64(concat_ws(' ', slice(_toks, i + 1, {window}))))"
                )
            ).alias("h"),
        )
        .distinct()
    )
    per_source = _pin(wins.groupBy(F.col("src")).agg(F.count(F.lit(1)).alias("n")))
    pairs = (
        wins.groupBy("h")
        .agg(F.sort_array(F.collect_set("src")).alias("ss"))
        .where(F.size("ss") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, size(ss) - 2),"
                    " i -> transform(sequence(i + 1, size(ss) - 1),"
                    " j -> struct(ss[i] AS a, ss[j] AS b))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("shared_windows"))
    )
    na = F.broadcast(per_source.select(F.col("src").alias("source_a"), F.col("n").alias("windows_a")))
    nb = F.broadcast(per_source.select(F.col("src").alias("source_b"), F.col("n").alias("windows_b")))
    return (
        pairs.join(na, "source_a")
        .join(nb, "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_windows",
            "windows_a",
            "windows_b",
            F.round(
                F.col("shared_windows")
                / (F.col("windows_a") + F.col("windows_b") - F.col("shared_windows")),
                6,
            ).alias("jaccard"),
        )
    )
