"""Repetition-based quality signals for training corpora — the
"repetitious text" filters from the Gopher curation rules (Rae et al.
2021, appendix A1): per document, the share of content owned by the most
frequent word bigram and the share of repeated 5-gram occurrences.
Heavily templated / looping documents (boilerplate, keyword stuffing,
decoding loops) score high on both and are dropped before training.
Extends the §2E quality family (operators/text.py holds the single-scan
signals; these two need a count-by-(doc, n-gram) aggregate, hence their
own module).  Deviation from the paper, documented: fractions are counted
over n-gram OCCURRENCES (token-positional), not characters — the rank
ordering is the same and the SQL oracle pins the exact arithmetic.

Scale shape: tokenize + n-gram expansion is a JVM-side projection
(``transform`` over the token array, no UDF); the only shuffle is a
map-side-combined groupBy on (doc_id, n-gram) whose rows are linear in
corpus tokens — the same thin profile as the proven substring-dedup
pass.  Per-doc rollups then key by doc_id alone (already co-partitioned
by the first aggregate's hash partitioning on a superset key — Catalyst
reuses the exchange where possible; either way rows at that point are
one per (doc, distinct n-gram), far smaller than the corpus).

Determinism: the top bigram tie-breaks to the lexicographically LARGEST
among max-count bigrams (``max(struct(count, bigram))``), which any SQL
engine reproduces with ``ORDER BY cnt DESC, bigram DESC LIMIT 1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tokenize import tokenized as _tokens_df


def _ngrams_expr(n: int) -> str:
    return (
        f"transform(sequence(1, size(_toks) - {n - 1}), "
        f"i -> array_join(slice(_toks, i, {n}), ' '))"
    )


def repetition_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    long_n: int = 5,
) -> DataFrame:
    """Per-doc repetition signals: ``top_bigram`` / ``top_bigram_count`` /
    ``top_bigram_frac`` (share of bigram positions held by the modal
    bigram) and ``dup_longgram_frac`` (share of ``long_n``-gram positions
    whose n-gram occurs more than once in the doc).  Docs with fewer than
    2 tokens emit nothing; docs shorter than ``long_n`` tokens report
    ``n_longgrams = 0`` and ``dup_longgram_frac = 0.0``."""
    base = _tokens_df(df, text_col, id_col)

    bi = (
        base.where(F.size("_toks") >= 2)
        .select(id_col, F.explode(F.expr(_ngrams_expr(2))).alias("_bg"))
        .groupBy(id_col, "_bg")
        .count()
        .groupBy(id_col)
        .agg(
            F.sum("count").alias("n_bigrams"),
            F.max(F.struct(F.col("count"), F.col("_bg"))).alias("_top"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.col("_top._bg").alias("top_bigram"),
            F.col("_top.count").alias("top_bigram_count"),
            (F.col("_top.count") / F.col("n_bigrams")).alias("top_bigram_frac"),
        )
    )

    lg = (
        base.where(F.size("_toks") >= long_n)
        .select(id_col, F.explode(F.expr(_ngrams_expr(long_n))).alias("_lg"))
        .groupBy(id_col, "_lg")
        .count()
        .groupBy(id_col)
        .agg(
            F.sum("count").alias("n_longgrams"),
            F.sum(F.when(F.col("count") > 1, F.col("count")).otherwise(F.lit(0))).alias(
                "_dup_occ"
            ),
        )
        .select(
            id_col,
            "n_longgrams",
            (F.col("_dup_occ") / F.col("n_longgrams")).alias("dup_longgram_frac"),
        )
    )

    return bi.join(lg, id_col, "left").select(
        id_col,
        "n_bigrams",
        "top_bigram",
        "top_bigram_count",
        "top_bigram_frac",
        F.coalesce("n_longgrams", F.lit(0)).alias("n_longgrams"),
        F.coalesce("dup_longgram_frac", F.lit(0.0)).alias("dup_longgram_frac"),
    )


def filter_repetitive(
    df: DataFrame,
    max_top_bigram_frac: float = 0.2,
    max_dup_longgram_frac: float = 0.15,
    text_col: str = "text",
    id_col: str = "doc_id",
    long_n: int = 5,
) -> DataFrame:
    """Corpus minus documents breaching either repetition threshold
    (Gopher drops at top-2-gram > 0.20 and dup-5-gram-ish > 0.15; the
    flagged set is tiny next to the corpus, so the anti-join broadcasts
    under AQE)."""
    flagged = (
        repetition_profile(df, text_col, id_col, long_n)
        .where(
            (F.col("top_bigram_frac") > max_top_bigram_frac)
            | (F.col("dup_longgram_frac") > max_dup_longgram_frac)
        )
        .select(id_col)
    )
    return df.join(flagged, id_col, "left_anti")
