"""Corpus vocabulary statistics: term/document frequencies and top-k.

The vocabulary pass of a training pipeline (tokenizer fitting, stopword
derivation, frequency-based filtering) over the shared corpus
tokenization (``operators/tokenize.py`` — oracle-identical split).

Shape at 10^12 docs:

* **two-level aggregation, skew-safe by construction**: the first
  ``groupBy(token, doc)`` map-side-combines within each document's rows,
  so a stop-word like "the" reaches the shuffle as one row per
  *document*, not one per *occurrence*; the second ``groupBy(token)``
  then sees partial sums per partition before the exchange (standard
  two-phase hash aggregation) — no single reducer ever materializes a
  hot token's occurrence list;
* **df (document frequency) falls out for free** from the same pass —
  ``count(*)`` over the per-doc rows — instead of a separate
  ``count_distinct`` expansion;
* **top-k is TakeOrdered** (per-partition heap + driver merge of k-row
  heads), never a global sort of the vocabulary; the ``rank`` column is
  a window over the already-LIMITed k rows (single partition of k rows
  — intentional and tiny, not the corpus).

No reference counterpart (training-pipeline surface, like sampling.py /
mixing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from schemasaurus_spark.operators.tokenize import tokenized, tokens_expr


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-token ``(token, tf, df_docs)``: total occurrences and the
    number of distinct documents containing the token."""
    per_doc = (
        tokenized(df, text_col, id_col)
        .select(F.col(id_col), F.explode("_toks").alias("token"))
        .groupBy("token", id_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return per_doc.groupBy("token").agg(
        F.sum("_c").alias("tf"), F.count(F.lit(1)).alias("df_docs")
    )


def vocab_topk(
    df: DataFrame, k: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-``k`` corpus tokens as ``(rank, token, tf, df_docs)``.

    Deterministic total order: ``tf`` descending, token ascending — ties
    never depend on partitioning.  ``rank`` is 1-based."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    top = token_stats(df, text_col, id_col).orderBy(F.desc("tf"), F.asc("token")).limit(k)
    w = Window.orderBy(F.desc("tf"), F.asc("token"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"), "token", "tf", "df_docs"
    )


def novelty_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc novelty signals over the shared tokenization:
    ``(id, n_distinct_tokens, n_hapax, novelty)`` where a hapax is a
    token whose corpus document frequency is 1 (it appears in THIS
    document only) and novelty = n_hapax / n_distinct_tokens.

    The data-selection signal dedup can't give you: boilerplate that
    escaped near-dedup scores ~0 (every token is corpus-common), while
    genuinely new material scores high — Dolma/RefinedWeb-style pipelines
    rank or threshold on exactly this before sampling.

    Scale shape: reuses token_stats' two-level skew-safe aggregation
    (a stop-word reaches the shuffle as one row per DOCUMENT, never per
    occurrence), then ONE more map-side-combined (doc, token-distinct)
    pass joined against the df table on token.  The join's build side is
    the vocabulary — Zipf-bounded, broadcastable far beyond any realistic
    corpus — and doc_id is unique in the final aggregate, so no skew.
    Distinct-token semantics throughout: occurrence counts would let one
    repeated rare token masquerade as high novelty."""
    per_doc = (
        tokenized(df, text_col, id_col)
        .select(F.col(id_col), F.explode("_toks").alias("token"))
        .distinct()
    )
    dfreq = per_doc.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    return (
        per_doc.join(dfreq, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.sum((F.col("df_docs") == 1).cast("long")).alias("n_hapax"),
        )
        .select(
            id_col,
            "n_distinct_tokens",
            "n_hapax",
            F.round(F.col("n_hapax") / F.col("n_distinct_tokens"), 6).alias(
                "novelty"
            ),
        )
    )


def vocab_coverage(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str = "token",
) -> DataFrame:
    """Per-document out-of-vocabulary profile against a FIXED vocabulary
    (e.g. ``vocab_topk``'s token column) — the tokenizer-health number:
    a rising OOV share means the deployed vocab no longer fits the
    corpus and every unknown token burns fallback bytes at training
    time.

    One row per PHYSICAL input row: ``(doc_id, n_tokens, n_oov,
    oov_bp)`` with the share in exact integer basis points.  NULL /
    whitespace-only docs report 0/0/0 rather than vanish (coverage
    reports must not drop rows).

    Scale shape: the vocabulary rides as ONE sorted array on a
    single-row broadcast cross join, and each token probes it with
    ``sorted_array_contains`` (exact binary search, O(log |vocab|) per
    token — the arrays.py helper; linear ``array_contains`` would make
    this O(tokens x vocab), the measured span-boilerplate blowup).  The
    whole pass is in-array over one projection scan: ZERO shuffles on
    the corpus, duplicate-doc_id-safe.
    """
    from schemasaurus_spark.operators.arrays import sorted_array_contains

    one = vocab.select(F.col(token_col)).agg(
        F.array_sort(F.collect_list(token_col)).alias("_vocab")
    )
    out = df.join(F.broadcast(one))
    empty = F.col(text_col).isNull() | (F.trim(F.col(text_col)) == "")
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n_tokens = F.when(empty, F.lit(0)).otherwise(F.size(toks)).cast("long")
    n_oov = (
        F.when(empty, F.lit(0))
        .otherwise(
            F.size(
                F.filter(
                    toks,
                    lambda t: ~sorted_array_contains(F.col("_vocab"), t),
                )
            )
        )
        .cast("long")
    )
    num = n_oov * 10000
    return out.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_oov.alias("n_oov"),
        F.when(n_tokens <= 0, F.lit(0).cast("long"))
        .otherwise(((num - (num % n_tokens)) / n_tokens).cast("long"))
        .alias("oov_bp"),
    )


def distinctive_terms(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` TF-IDF-distinctive tokens per group — "what characterizes
    this source": ``(group, rank, token, tf, df_groups, score_micro)``.

    The source-review report curation decisions lean on: raw top-k
    (``vocab_topk``) surfaces stopwords everywhere; weighting each
    group's term frequency by group-level inverse document frequency
    (idf = ln(n_groups / df_groups)) surfaces the terms a source uses
    that OTHERS don't.  Tokens present in every group score exactly 0
    (ln 1) and sink; ranking is deterministic (score desc, token asc).

    Exactness discipline: idf is quantized once to the int64 micro grid
    — ``floor(ln(n_groups / df_groups) * 1e6 + 0.5)`` written with this
    one parenthesization in both engines — so ``score_micro = tf *
    idf_micro`` is integer arithmetic and rank ties cannot drift on
    float noise.  NULL-group and untokenizable docs carry no terms.

    Scale shape: one explode into a map-side-combined
    ``groupBy(group, token)`` (a stop-word reaches the shuffle as one
    row per group-partition, not per occurrence), group-df from a second
    keyed aggregate over that vocabulary-sized table, n_groups as a
    broadcast 1-row cross join, and the per-group top-k is a rank-
    filtered window over vocabulary rows (WindowGroupLimit pushes the
    k-row heap below the sort at execution)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    toks = (
        df.where(
            F.col(text_col).isNotNull()
            & (F.trim(F.col(text_col)) != "")
            & F.col(group_col).isNotNull()
        )
        .select(
            F.col(group_col).alias("group"),
            F.explode(tokens_expr(text_col)).alias("token"),
        )
    )
    tf = toks.groupBy("group", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfg = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_groups"))
    ng = tf.agg(F.count_distinct("group").alias("_ng"))
    scored = (
        tf.join(dfg, "token")
        .crossJoin(F.broadcast(ng))
        .withColumn(
            "score_micro",
            F.col("tf")
            * F.floor(
                F.log(F.col("_ng").cast("double") / F.col("df_groups").cast("double"))
                * F.lit(1000000.0)
                + F.lit(0.5)
            ).cast("long"),
        )
    )
    w = Window.partitionBy("group").orderBy(F.desc("score_micro"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("group", "rank", "token", "tf", "df_groups", "score_micro")
    )
