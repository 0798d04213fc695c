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


def _grams(text_col: str, n: int):
    """Sliding char n-grams of lower(trim(text)) as an array column
    (rows shorter than ``n`` must be filtered out by the caller)."""
    t = f"lower(trim({text_col}))"
    return F.expr(f"transform(sequence(1, length({t}) - {n - 1}), i -> substring({t}, i, {n}))")


def _gram_rows(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return (
        df.where(F.col(text_col).isNotNull())
        .where(F.length(F.lower(F.trim(F.col(text_col)))) >= n)
        .select(F.col(id_col), F.explode(_grams(text_col, n)).alias("gram"))
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
    Documents with no gram (shorter than ``n``) are omitted."""
    if model is None:
        model = char_ngram_counts(df, text_col, id_col, n)
    totals = model.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("_v")
    )
    grams = _gram_rows(df, text_col, id_col, n)
    if laplace:
        joined = grams.join(F.broadcast(model), "gram", "left").withColumn(
            "cnt", F.coalesce(F.col("cnt"), F.lit(0))
        )
        logp = F.log(
            (F.col("cnt").cast("double") + F.lit(1.0))
            / (F.col("_total").cast("double") + F.col("_v").cast("double"))
        )
    else:
        joined = grams.join(F.broadcast(model), "gram")
        logp = F.log(F.col("cnt").cast("double") / F.col("_total").cast("double"))
    return (
        joined.crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(F.avg(logp), 6).alias("avg_logp"),
        )
    )
