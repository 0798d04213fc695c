"""Self-trained character-n-gram language-model quality scoring.

A CCNet-style perplexity filter without an external model: fit a
character-trigram unigram LM on the corpus itself (or any reference
corpus), then score every document by its mean log-probability.
Low-scoring documents are boilerplate/garbage relative to the corpus's
own character statistics; the score feeds curation thresholds the same
way `operators/text.py`'s heuristics do, but is *distribution-aware*.

Shape at 10^12 docs:

* the model is a char-n-gram count table — cardinality is bounded by
  charset^n (thousands to low millions), INDEPENDENT of corpus size, so
  it always fits a **broadcast join**; the scoring pass is one scan of
  the corpus with a map-side join + per-doc aggregation (map-side
  combined on doc_id, which is unique per gram row — no skew);
* gram expansion is a JVM-side ``transform(sequence(...))`` projection —
  no Python, rows linear in corpus characters;
* training is one map-side-combined ``groupBy(gram)`` count — the same
  single-shuffle shape as every other stats pass here.

Probability arithmetic is plain ``ln(cnt / total)`` on IEEE doubles
(optionally Laplace-smoothed for scoring text outside the training
corpus), so a SQL engine reproduces the scores to float precision; the
emitted score is rounded to 6 decimals on both sides of the oracle.

No reference counterpart (training-pipeline surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_rows(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Exploded ``(id, gram)`` rows.  The normalized text is materialized
    ONCE in its own projection before the explode — referencing
    ``lower(trim(text))`` inside the transform lambda would re-normalize
    the whole document for EVERY gram element (O(len²) character work
    per doc; measured 8-9 s -> ~1 s on the sf0.1 corpus)."""
    norm = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.lower(F.trim(F.col(text_col))).alias("_t"))
        .where(F.length("_t") >= n)
    )
    return norm.select(
        F.col(id_col),
        F.explode(
            F.expr(f"transform(sequence(1, length(_t) - {n - 1}), i -> substring(_t, i, {n}))")
        ).alias("gram"),
    )


def _doc_gram_counts(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Per-document gram occurrence counts ``(id, gram, occ)`` — the one
    shuffle both the model and the scoring pass derive from."""
    return (
        _gram_rows(df, text_col, id_col, n)
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("occ"))
    )


def char_ngram_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """The model: ``(gram, cnt)`` over the corpus."""
    return _gram_rows(df, text_col, id_col, n).groupBy("gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def lm_quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    model: DataFrame | None = None,
    laplace: bool = False,
) -> DataFrame:
    """Per-document ``(id, n_grams, avg_logp)`` under the n-gram model.

    ``model`` defaults to fitting on ``df`` itself (every gram is then
    in-vocabulary, so the unsmoothed ``ln(cnt/total)`` is total);
    pass ``laplace=True`` when scoring text the model was not fitted on
    (``p = (cnt+1) / (total+V)``, unseen grams get ``cnt = 0``).
    Unsmoothed scoring with an EXTERNAL model averages over in-vocabulary
    grams only (the inner join drops unseen grams — use ``laplace=True``
    if they should pull the score down instead).  Documents with no gram
    (shorter than ``n``) are omitted.

    Single-expansion plan: the corpus is gram-exploded ONCE into
    per-document counts ``(id, gram, occ)``; the self-trained model is a
    second small aggregate of that frame and the scoring join carries
    ``occ`` as a weight (``avg over occurrences = sum(occ·ln p) /
    sum(occ)``) — the join input shrinks from corpus-grams rows to
    distinct (doc, gram) rows."""
    per_doc = _doc_gram_counts(df, text_col, id_col, n)
    if model is None:
        model = per_doc.groupBy("gram").agg(F.sum("occ").alias("cnt"))
    totals = model.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("_v")
    )
    if laplace:
        joined = per_doc.join(F.broadcast(model), "gram", "left").withColumn(
            "cnt", F.coalesce(F.col("cnt"), F.lit(0))
        )
        logp = F.log(
            (F.col("cnt").cast("double") + F.lit(1.0))
            / (F.col("_total").cast("double") + F.col("_v").cast("double"))
        )
    else:
        joined = per_doc.join(F.broadcast(model), "gram")
        logp = F.log(F.col("cnt").cast("double") / F.col("_total").cast("double"))
    occ_d = F.col("occ").cast("double")
    return (
        joined.crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("occ").alias("n_grams"),
            F.round(F.sum(occ_d * logp) / F.sum(occ_d), 6).alias("avg_logp"),
        )
    )
