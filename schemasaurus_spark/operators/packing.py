"""Deterministic sequence packing for pretraining batch prep: lay
documents end-to-end in a reproducible order and assign each to the
fixed-token-budget training sequence where its span begins (the
concatenate-and-chunk discipline GPT-style pretraining uses, expressed
as an assignment every engine reproduces bit-for-bit).

Scale design: a single global ordering would funnel the corpus through
one window partition, so packing is TWO-LEVEL — documents hash-shard by
id into ``n_shards`` independent streams (md5-keyed, like
``operators/sampling.py``), and the running token offset is a window
cumsum WITHIN each shard.  Shards are embarrassingly parallel, the
per-shard sort is the only shuffle, and determinism holds at any
parallelism because both the shard and the order key derive from the
document id, never from partition layout.  At 10^12 docs, raise
``n_shards`` so each shard's sort fits an executor (the id-hash keeps
them balanced).

Every output column is reproducible in ANSI SQL (md5 + window cumsum),
so the contract query (``doc_packing``) hash-matches a DuckDB replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from schemasaurus_spark.operators.text import token_count


def pack_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 256,
    n_shards: int = 8,
    seed: int = 0,
) -> DataFrame:
    """(id, n_tokens, shard, seq_id, seq_offset): the training sequence
    (per-shard ``seq_id``, ``budget`` tokens each) where this document's
    span starts, and the token offset inside that sequence.

    Documents order by ``md5(seed:id)`` within their shard (deterministic,
    uncorrelated with content), empty/null docs are excluded (no training
    content), and a document longer than the budget still gets a seat —
    it starts in one sequence and spills into the next, exactly like the
    concat-and-chunk pipeline it mirrors."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    # same md5 idioms as operators/sampling.py (proven engine-portable:
    # Spark conv(hex) == DuckDB CAST('0x'||hex AS INTEGER); md5 hex strings
    # order identically under binary collation)
    key = F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed))))
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.col(id_col).cast("string"), F.lit(str(seed)))),
                1,
                4,
            ),
            16,
            10,
        ).cast("int")
        % n_shards
    )
    base = (
        df.where(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
        .select(
            F.col(id_col),
            token_count(F.col(text_col)).cast("long").alias("n_tokens"),
            key.alias("_key"),
            shard.cast("int").alias("shard"),
        )
    )
    w = Window.partitionBy("shard").orderBy("_key")
    start = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return base.select(
        id_col,
        "n_tokens",
        "shard",
        F.floor(start / budget).cast("long").alias("seq_id"),
        (start % budget).cast("long").alias("seq_offset"),
    )


def pack_spans(
    df: DataFrame,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    budget: int = 2048,
    n_shards: int = 8,
    seed: int = 0,
    image_tokens: int = 576,
    audio_tokens: int = 128,
    ref_tokens: int = 1,
) -> DataFrame:
    """Span-aware packing of interleaved text+media documents: a media
    span consumes a FIXED token cost (image patches / audio frames — the
    LLaVA-style 576-tokens-per-image accounting), text spans their
    whitespace token count, and the document packs as one unsplittable
    run of ``n_tokens = n_text_tokens + n_media_tokens``.

    Same two-level scale shape as :func:`pack_documents` (md5 shard +
    per-shard window cumsum, the only shuffle), with two differences:

    * the cost is an in-array fold over ``spans`` — zero extra scans;
    * the per-shard order key is ``(md5, n_tokens)`` — duplicate doc_ids
      (real in span corpora) collide on the md5 alone, and two tied rows
      with DIFFERENT costs would make the cumsum order-dependent; adding
      the cost to the key makes the output multiset deterministic (tied
      rows with equal cost are interchangeable).

    Documents with NULL/empty spans or zero total cost carry no
    trainable content and are excluded (the oracle mirrors)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    spans = F.coalesce(F.col(spans_col), F.array())

    def fold_cost(text_side: bool):
        def merge(acc, s):
            text_c = token_count(s["text"]).cast("long")
            media_c = (
                F.when(s["kind"] == "image", F.lit(image_tokens))
                .when(s["kind"] == "audio", F.lit(audio_tokens))
                .when(s["kind"] == "ref", F.lit(ref_tokens))
                .otherwise(F.lit(0))
                .cast("long")
            )
            inc = (
                F.when(s["kind"] == "text", text_c).otherwise(F.lit(0).cast("long"))
                if text_side
                else F.when(s["kind"] == "text", F.lit(0).cast("long")).otherwise(
                    media_c
                )
            )
            return acc + inc

        return F.aggregate(spans, F.lit(0).cast("long"), merge)

    key = F.md5(
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit("sp"), F.lit(str(seed)))
    )
    shard = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "#", F.col(id_col).cast("string"), F.lit("sp"), F.lit(str(seed))
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("int")
        % n_shards
    )
    base = df.select(
        F.col(id_col),
        fold_cost(True).alias("n_text_tokens"),
        fold_cost(False).alias("n_media_tokens"),
        key.alias("_key"),
        shard.cast("int").alias("shard"),
    ).withColumn("n_tokens", F.col("n_text_tokens") + F.col("n_media_tokens"))
    base = base.where(F.col("n_tokens") > 0)
    w = Window.partitionBy("shard").orderBy("_key", "n_tokens")
    start = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return base.select(
        id_col,
        "n_tokens",
        "n_text_tokens",
        "n_media_tokens",
        "shard",
        F.floor(start / budget).cast("long").alias("seq_id"),
        (start % budget).cast("long").alias("seq_offset"),
    )


def context_length_profile(
    df: DataFrame,
    lengths: tuple = (512, 1024, 2048, 4096, 8192),
    text_col: str = "text",
) -> DataFrame:
    """Truncation-loss profile over K candidate context lengths: for each
    ``context_len`` L, how many documents exceed it and what share of
    corpus tokens survives hard truncation at L — the measurement that
    sizes a pretraining context window BEFORE paying for packing runs.

    Output (one row per candidate length, all integers — exact in any
    engine): ``(context_len, n_docs, n_docs_truncated, tokens_total,
    tokens_kept, kept_bp)`` where ``kept_bp`` is basis points of tokens
    kept, ``tokens_kept * 10000 DIV tokens_total`` (integer division;
    NULL for an empty corpus).  NULL-text documents are excluded (they
    carry no tokens to lose).

    Scale shape: ONE corpus scan projects each doc to its token count
    (the same ``token_count`` expression the text profile uses), a
    K-element generator explode fans the count-sized frame to K rows per
    doc, and the groupBy collapses map-side to K rows total — shuffle
    traffic is K rows per task, output is metadata-sized.  int64 bound:
    ``tokens_total * 10000`` overflows past ~9·10^14 corpus tokens;
    ANSI mode raises (never wraps) — past that, derive the ratio
    downstream from the two sum columns instead."""
    toks = df.where(F.col(text_col).isNotNull()).select(
        token_count(F.col(text_col)).alias("n_tok")
    )
    fanned = toks.select(
        F.explode(
            F.array(*[F.lit(int(L)).alias(f"_l{i}") for i, L in enumerate(lengths)])
        ).alias("context_len"),
        "n_tok",
    )
    agg = fanned.groupBy("context_len").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("n_tok") > F.col("context_len"), 1).otherwise(0)
        ).alias("n_docs_truncated"),
        F.sum("n_tok").alias("tokens_total"),
        F.sum(F.least(F.col("n_tok"), F.col("context_len").cast("long"))).alias(
            "tokens_kept"
        ),
    )
    return agg.withColumn(
        "kept_bp",
        F.when(
            F.col("tokens_total") > 0,
            F.expr("(tokens_kept * 10000) DIV tokens_total"),
        ),
    )


def packing_stats(packed: DataFrame, budget: int = 256) -> DataFrame:
    """Per-shard fill report: sequences used, total tokens, mean fill
    fraction — the number a pipeline watches to size ``budget``."""
    # sequences consumed = ceil(total/budget): the last doc may spill past
    # max(seq_id)'s boundary, so max(seq_id)+1 under-counts on overflow
    n_seq = F.ceil(F.sum("n_tokens") / budget)
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        n_seq.alias("n_sequences"),
        F.round(F.sum("n_tokens") / (n_seq * budget), 6).alias("fill_fraction"),
    )
