"""Collocation mining: the top-k adjacent token pairs by corpus
frequency, scored with pointwise mutual information — the corpus
analysis that separates real multi-word units ("new york") from pairs
that are merely frequent because their words are ("of the"), and the
standard diagnostic for template/boilerplate phrases that dedup should
see (a PMI-low but count-high pair is machinery text).  No reference
counterpart — §2E text-analysis family.

PMI(a,b) = ln( p(a,b) / (p(a) p(b)) ) with p(a,b) = c_ab / P (P = total
adjacent pairs) and p(x) = c_x / N (N = total tokens).  The engine and
the oracle evaluate the IDENTICAL parenthesized double expression
``ln((c_ab * N * N) / (P * c_a * c_b))`` — products in double (exact
below 2^53 per factor, correctly-rounded IEEE beyond; int64 products
would overflow at corpus scale), one correctly-rounded division, and a
libm ln whose ≤1-ulp cross-engine wiggle the round-6 output absorbs
(the quartiles-family float discipline).

Scale shape
-----------
* One scan: tokenize, explode adjacent pairs, map-side-combined pair
  counts.  The unigram counts and the two scalar totals ride the SAME
  scan as separate map-side-combined aggregates.
* Selection is ``orderBy(count desc, pair).limit(k)`` — a TakeOrdered,
  never a global sort; everything after the limit (unigram join, scalar
  cross join, PMI projection) touches k rows.
* Deterministic: ties break lexicographically on (lft, rgt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schemasaurus_spark.operators.tokenize import tokenized

__all__ = ["collocation_topk"]


def collocation_topk(
    docs: DataFrame,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(lft, rgt, n_pair, n_left, n_right, pmi) for the k most frequent
    adjacent token pairs."""
    if k < 1:
        raise ValueError(f"collocation_topk: k must be >= 1, got {k}")
    toks = tokenized(docs, text_col, id_col).select("_toks")
    pairs = (
        toks.where(F.size("_toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(_toks) - 2),"
                    " i -> struct(_toks[i] AS lft, _toks[i + 1] AS rgt))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.lft").alias("lft"), F.col("p.rgt").alias("rgt"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    top = pairs.orderBy(F.desc("n_pair"), F.asc("lft"), F.asc("rgt")).limit(k)
    unigrams = (
        toks.select(F.explode("_toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_tok"))
    )
    totals = toks.select(
        F.sum(F.size("_toks")).alias("n_total"),
        F.sum(
            F.when(F.size("_toks") >= 2, F.size("_toks") - 1).otherwise(F.lit(0))
        ).alias("p_total"),
    )
    lu = unigrams.select(F.col("tok").alias("lft"), F.col("n_tok").alias("n_left"))
    ru = unigrams.select(F.col("tok").alias("rgt"), F.col("n_tok").alias("n_right"))
    return (
        top.join(lu, "lft")
        .join(ru, "rgt")
        .crossJoin(F.broadcast(totals))
        .select(
            "lft",
            "rgt",
            "n_pair",
            "n_left",
            "n_right",
            F.round(
                F.expr(
                    "ln((CAST(n_pair AS DOUBLE) * n_total * n_total)"
                    " / (CAST(p_total AS DOUBLE) * n_left * n_right))"
                ),
                6,
            ).alias("pmi"),
        )
    )
