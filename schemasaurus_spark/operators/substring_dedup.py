"""Exact substring deduplication for training corpora: find every maximal
token span whose ``window``-token substrings occur more than once in the
corpus (within or across documents) — the operator popularized by
"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
ACL 2022), which removes verbatim-repeated passages rather than whole
near-duplicate documents.

Method (distributed, no suffix arrays): tokenize, slide a ``window``-token
window over every document, key each window by ``xxhash64`` of its
space-joined tokens, count occurrences per key corpus-wide, keep positions
whose key occurs >= ``min_count`` times, and merge overlapping/adjacent
positions per document into maximal spans with a gaps-and-islands pass.

Scale shape: window rows ~= total corpus tokens, each 16 bytes
(int64 hash + int32 position + id) — LINEAR, thin, and the occurrence
count is a map-side-combined groupBy; the position filter is a semi-join
against the (rare) repeated keys; the merge is a per-document window
function (documents are small, so partitions are balanced).  At 100 TB
this is the exact tier — the MinHash/SimHash operators remain the
cheaper approximate path; a 64-bit collision can only mark a unique
window as repeated (never lose a repeat), P ~ (#windows)^2/2^64.

The contract oracle (``doc_substring_dup_spans``) replays the whole
pipeline in SQL grouping by the RAW window string (no hash at all), so
it independently confirms the hashed engine's span output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .tokenize import tokenized


def window_hash_positions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
) -> DataFrame:
    """(id, pos, h): xxhash64 of each ``window``-token window, one row per
    position.  Tokenization = operators/tokenize.py (the one shared
    definition); docs with fewer than ``window`` tokens emit nothing."""
    base = tokenized(df, text_col, id_col)
    n = F.size("_toks")
    hashes = F.expr(
        f"transform(sequence(0, size(_toks) - {window}), "
        f"i -> xxhash64(concat_ws(' ', slice(_toks, i + 1, {window}))))"
    )
    return (
        base.where(n >= window)
        .select(F.col(id_col), F.posexplode(hashes).alias("pos", "h"))
    )


def substring_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans: (id, span_start, span_end, n_tokens)
    with token positions 0-based and span_end exclusive.

    A position p is *covered* when the window starting at p occurs at
    least ``min_count`` times corpus-wide (all occurrences counted — a
    doc repeating its own passage is a repeat); covered windows that
    overlap or touch merge into one maximal span."""
    wh = window_hash_positions(df, text_col, id_col, window)
    # corpus-wide occurrence count per window key (map-side combined),
    # filtered to repeated keys BEFORE rejoining positions
    repeated = (
        wh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= min_count)
        .select("h")
    )
    covered = wh.join(repeated, "h", "left_semi").select(id_col, "pos")
    # gaps-and-islands: a new island starts where this window no longer
    # overlaps/touches the furthest end seen so far in this document
    w_ord = Window.partitionBy(id_col).orderBy("pos")
    prev_max_end = F.max(F.col("pos") + window).over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_max_end.isNull() | (F.col("pos") > prev_max_end), 1
    ).otherwise(0)
    island = F.sum(is_new).over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
    return (
        covered.withColumn("_island", island)
        .groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + window).alias("span_end"),
        )
        .select(
            id_col,
            F.col("span_start").cast("long"),
            F.col("span_end").cast("long"),
            (F.col("span_end") - F.col("span_start")).cast("long").alias("n_tokens"),
        )
    )


def remove_duplicate_passages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Apply the spans: drop every token inside a duplicated span and
    return the cleaned corpus — the *removal* step of Lee et al. 2022
    (their strongest setting deletes all copies of a repeated passage;
    keeping one canonical copy is a policy layered on top via
    ``min_count``/near-dup collapse, not done here).

    Output: ``(id, n_tokens, n_removed, clean_text)`` for every document
    with text.  ``clean_text`` is the space-join of surviving tokens in
    original order (tokenization collapses whitespace runs — documented
    corpus-normalization contract, same as chunking/packing); a fully
    duplicated document survives as an empty string so the caller decides
    whether to drop it.

    Scale shape: spans are rare and short (bounded per doc), so the
    spans->doc join ships a small per-doc span list; token filtering is a
    JVM-side higher-order ``filter`` over the token array — no Python, no
    extra shuffle beyond the span aggregation."""
    spans = substring_duplicate_spans(df, text_col, id_col, window, min_count)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e"))
        ).alias("_spans")
    )
    toks = tokenized(df, text_col, id_col)
    joined = toks.join(per_doc, id_col, "left").withColumn(
        "_spans", F.coalesce(F.col("_spans"), F.array())
    )
    indexed = F.transform(
        "_toks", lambda t, i: F.struct(t.alias("t"), i.alias("i"))
    )
    kept = F.filter(
        indexed,
        lambda st: ~F.exists(
            "_spans", lambda sp: (st["i"] >= sp["s"]) & (st["i"] < sp["e"])
        ),
    )
    return joined.select(
        F.col(id_col),
        F.size("_toks").cast("long").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(F.transform(kept, lambda st: st["t"]), " ").alias("clean_text"),
    )


def substring_dup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Per-doc rollup a curation pipeline filters on: total duplicated
    tokens and the duplicated fraction of the document."""
    spans = substring_duplicate_spans(df, text_col, id_col, window, min_count)
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    sizes = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.size(toks).alias("n_doc_tokens")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.sum("n_tokens").alias("dup_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    return per_doc.join(sizes, id_col).select(
        id_col,
        "n_spans",
        "dup_tokens",
        "n_doc_tokens",
        F.round(F.col("dup_tokens") / F.col("n_doc_tokens"), 6).alias("dup_fraction"),
    )
