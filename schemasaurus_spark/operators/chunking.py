"""Deterministic token-window document chunking (with overlap).

The splitter step of training / retrieval pipelines: each document
becomes ``ceil`` sliding windows of ``window`` tokens advancing by
``window - overlap``, so consecutive chunks share ``overlap`` tokens of
context.  Chunk boundaries depend only on the shared corpus tokenization
(``operators/tokenize.py``) and the (window, overlap) config — never on
partitioning or engine — so the exact chunk set is SQL-reproducible.

Contract: chunk ``k`` starts at token ``k * (window - overlap)`` for
every ``k`` with a start inside the document, and takes up to ``window``
tokens; the last chunk may be shorter.  A document shorter than one
window yields exactly one chunk (itself).

Shape at 10^12 docs: one scan; the token array and the chunk expansion
are JVM-side ``transform``/``slice`` projections (no Python, no
shuffle); output rows ≈ corpus tokens / stride — linear.  Chunk ids are
(doc_id, chunk_id) pairs, so downstream groupBys key on the parent doc
without a global sequence.

No reference counterpart (training-pipeline surface, like packing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schemasaurus_spark.operators.tokenize import tokenized


def chunk_documents(
    df: DataFrame,
    window: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, chunk_id, start_tok, n_tok, chunk_text)`` sliding windows.

    ``chunk_id`` is the 0-based window index; ``start_tok`` its 0-based
    first token position; ``chunk_text`` the space-joined tokens (the
    tokenization collapses runs of whitespace, documented contract)."""
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    if not 0 <= overlap < window:
        raise ValueError(f"overlap must be in [0, window), got {overlap}")
    stride = window - overlap
    toks = tokenized(df, text_col, id_col)
    # last chunk index: the largest k with k*stride < n_tokens
    chunks = toks.select(
        F.col(id_col),
        "_toks",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.size("_toks") - 1) / F.lit(stride)).cast("int"),
            )
        ).alias("chunk_id"),
    )
    start = F.col("chunk_id") * F.lit(stride)
    piece = F.slice(F.col("_toks"), start + 1, window)
    return chunks.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("start_tok"),
        F.size(piece).cast("long").alias("n_tok"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
