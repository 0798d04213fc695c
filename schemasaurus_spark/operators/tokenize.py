"""THE corpus tokenization, defined once.

Every n-gram-shaped operator (substring dedup, decontamination,
repetition signals) and every one of their DuckDB oracles depends on one
byte-identical tokenization: split of lowercased/trimmed text on ``\\s+``,
with NULL/whitespace-only documents excluded.  It used to be inlined per
module; a fix applied to one copy (and not the others) would silently
break the cross-operator composition and the oracle contracts, so it
lives here and the operators import it.  (operators/text.py's counting
signals use the same split inline over single expressions — kept there
because they never materialize a token array.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens_expr(text_col: str) -> Column:
    """Lowercased whitespace tokens of ``text_col`` as an array column.

    Known engine-divergence caveat (round-5 review): Java's ``\\s``
    includes vertical tab (\\x0B), RE2's does not — a document containing
    \\x0B would tokenize differently under a DuckDB ``\\s+`` replay.  The
    generated corpora contain none (166/166 oracle hashes pass), and the
    declared tokenization is Java-``\\s+``; oracle authors replaying
    tokenization on \\x0B-bearing data must use the explicit class
    ``[ \\t\\n\\x0B\\f\\r]+`` on both sides (the punct-class sites already
    do — text.py / __spark_entry__.py)."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def tokenized(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, _toks) for every non-NULL, non-whitespace-only document."""
    return df.where(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).select(F.col(id_col), tokens_expr(text_col).alias("_toks"))
