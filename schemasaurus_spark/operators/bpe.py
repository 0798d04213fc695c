"""Distributed BPE tokenizer induction: learn a byte-pair-encoding merge
table from the corpus — the vocabulary-learning step every training-data
pipeline runs before tokenizing, and the engine's third iterative
operator (after connected components and PageRank).  No reference counterpart —
§2E training-data family; the algorithm is the public BPE construction.

Algorithm (Sennrich et al. ACL 2016, the word-frequency formulation):
words are char sequences plus an end-of-word marker ``_``; each round
counts adjacent token pairs weighted by word frequency, picks the most
frequent pair (ties: lexicographic on (left, right) — deterministic and
engine-portable, every token is ASCII ``[a-z0-9_]+``), and merges every
non-overlapping occurrence left-to-right.  The merge is the textbook
greedy scan, expressed as an ``aggregate`` fold with an array
accumulator::

    acc = [t0];  for x in t1..: if last(acc) == lft and x == rgt:
                                    last(acc) <- lft || rgt
                                else: append x

The fold IS the textbook scan: after a merge the last element becomes
``lft || rgt``, which is strictly longer than ``lft`` and therefore can
never equal it, so a freshly merged token is never merged again in the
same pass (``aaaaa`` -> ``[aa, aa, a]``, not ``[aa, aaa]``).

Exactness: counts are integer sums of int64 word frequencies —
order-invariant under shuffling — and the fold order is defined by the
token sequence, so a SQL engine replaying the same recurrence (the
oracle unrolls each round as a recursive-CTE fold over token positions)
reproduces the merge table bit-for-bit.

Scale shape
-----------
* ONE corpus scan builds the word-frequency table (map-side-combined
  ``groupBy``); every iteration thereafter touches only that table —
  the classic BPE-on-word-counts trick.  Distinct-word vocabulary is
  sublinear in corpus size (~10^8 rows even at web scale vs 10^12 docs).
* Per round: pair counting is one map-side-combined ``groupBy`` over
  exploded adjacent pairs; the argmax is ``orderBy(...).limit(1)`` — a
  TakeOrdered, never a global sort; the merge application is a map-only
  array fold.  Only the single argmax row ever reaches the driver
  (metadata-sized driver decision, same pattern as the IVF centroids).
* The word table is ``localCheckpoint``-ed per round (the CC /
  PageRank lineage-truncation idiom) so round k's plan does not replay
  rounds 0..k-1.
* ``max_word_len`` bounds the per-word fold (the fold copies its array
  accumulator per element, O(len^2) per word) and drops pathological
  unbroken strings; the cap and its effect are part of the declared
  tokenization, applied identically in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["word_frequency_table", "bpe_merge_table", "apply_bpe"]

END_MARK = "_"
_WORD_SPLIT = "[^a-z0-9]+"


def word_frequency_table(
    docs: DataFrame, text_col: str = "text", max_word_len: int = 24
) -> DataFrame:
    """(word, freq, toks) over the corpus: lowercased ``[a-z0-9]+`` words
    of length <= ``max_word_len``, with char tokens + end marker."""
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.explode(F.split(F.lower(F.col(text_col)), _WORD_SPLIT)).alias("word")
        )
        .where((F.col("word") != "") & (F.length("word") <= max_word_len))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "toks", F.expr(f"concat(split(word, ''), array('{END_MARK}'))")
        )
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    return (
        # fully-merged words ([single-token]) have no pairs; the explicit
        # guard keeps sequence(0, -1)/toks[1] out of ANSI's index checks
        words.where(F.size("toks") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> struct(toks[i] AS lft, toks[i + 1] AS rgt))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.lft").alias("lft"), F.col("p.rgt").alias("rgt"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _merge_expr(lft: str, rgt: str, col: str = "toks") -> str:
    # tokens are [a-z0-9_]+ — no quoting hazards by construction
    merged = lft + rgt
    return f"""
      aggregate(slice({col}, 2, size({col}) - 1), array({col}[0]),
        (acc, x) -> CASE WHEN element_at(acc, -1) = '{lft}' AND x = '{rgt}'
                    THEN concat(slice(acc, 1, size(acc) - 1), array('{merged}'))
                    ELSE concat(acc, array(x)) END)
    """


def bpe_merge_table(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
    max_word_len: int = 24,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    ``(step, lft, rgt, cnt)`` with int64 counts (step 1 = first merge).
    Stops early if the corpus runs out of repeated pairs."""
    if n_merges < 1:
        raise ValueError(f"bpe_merge_table: n_merges must be >= 1, got {n_merges}")
    spark = docs.sparkSession
    words = word_frequency_table(docs, text_col, max_word_len).localCheckpoint(
        eager=True
    )
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("lft"), F.asc("rgt"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break  # nothing left worth merging
        lft, rgt, cnt = top[0]["lft"], top[0]["rgt"], int(top[0]["cnt"])
        merges.append((step, lft, rgt, cnt))
        words = words.withColumn(
            "toks", F.expr(_merge_expr(lft, rgt))
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "step int, lft string, rgt string, cnt bigint"
    )


def apply_bpe(
    df: DataFrame, merges: list[tuple[str, str]], toks_col: str = "toks"
) -> DataFrame:
    """Tokenize with a learned merge list: each merge applied in order as
    one map-only array fold (chained projections, zero shuffles)."""
    out = df
    for lft, rgt in merges:
        out = out.withColumn(toks_col, F.expr(_merge_expr(lft, rgt, toks_col)))
    return out
