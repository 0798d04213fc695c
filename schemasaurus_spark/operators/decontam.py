"""Benchmark decontamination for training corpora: flag (and drop) any
training document that shares an ``window``-token n-gram with a held-out
benchmark / evaluation set — the standard contamination guard applied
before LLM pre-training (n-gram overlap decontamination as popularized by
the GPT-3 appendix and the Dolma/RedPajama curation pipelines; the
reference engine has no analog — this extends the §2E training-data
family alongside operators/substring_dedup.py).

Method: reuse the substring-dedup window machinery
(substring_dedup.window_hash_positions) on BOTH sides — tokenize,
slide a ``window``-token window, key each window by ``xxhash64`` of the
space-joined tokens.  The benchmark side collapses to its DISTINCT hash
set; the corpus side inner-joins against it and aggregates per document.

Scale shape (the asymmetry is the whole design):

* the benchmark is eval-suite-sized (10^4..10^7 n-grams) while the corpus
  is 10^12 docs — so the benchmark hash set (8 bytes/row) is BROADCAST
  and the corpus side never shuffles its windows: one scan, explode,
  broadcast hash-join, then a map-side-combined per-doc count over the
  (rare) hit rows only;
* corpus window rows are linear in corpus tokens and 16 bytes each
  (int64 hash + position + id) — identical cost profile to the proven
  substring-dedup pass;
* ``broadcast_benchmark=False`` falls back to a shuffled join for
  benchmark sets past driver memory (then both sides repartition on the
  hash — still linear).

Collision semantics: xxhash64 is applied to both sides, so equal strings
always collide (no missed contamination); a 64-bit collision can only
FLAG an extra clean document — the conservative direction for
decontamination.  P(any false flag) ~ n_corpus_windows *
n_benchmark_ngrams / 2^64.

The contract oracle (``doc_decontamination``) replays the pipeline in SQL
grouping by the RAW window string — no hashing — independently confirming
the hashed engine's per-document hit counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .substring_dedup import window_hash_positions


def benchmark_window_hashes(
    benchmark: DataFrame,
    text_col: str = "text",
    window: int = 13,
) -> DataFrame:
    """Distinct xxhash64 keys of every ``window``-token n-gram in the
    benchmark set — the (small) probe side of the contamination join.
    Only ``text_col`` is required of the benchmark frame: an eval set
    keyed by `example_id` (or not keyed at all) works as-is — a synthetic
    id stands in for the one window_hash_positions projects then drops."""
    keyed = benchmark.select(
        F.lit(0).cast("long").alias("_bench_id"), F.col(text_col)
    )
    return (
        window_hash_positions(keyed, text_col, "_bench_id", window)
        .select("h")
        .distinct()
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 13,
    broadcast_benchmark: bool = True,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Per-document contamination evidence: one row per corpus document
    sharing >=1 ``window``-token n-gram with the benchmark, with
    ``n_window_hits`` (corpus window positions matching any benchmark
    n-gram), ``n_distinct_ngrams`` (distinct shared n-grams), and
    ``first_hit_pos`` (earliest matching token offset, for auditing).
    The benchmark frame needs only its text column (``bench_text_col``,
    default = ``text_col``)."""
    bench = benchmark_window_hashes(benchmark, bench_text_col or text_col, window)
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    wins = window_hash_positions(corpus, text_col, id_col, window)
    return (
        wins.join(bench, "h")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_window_hits"),
            F.countDistinct("h").alias("n_distinct_ngrams"),
            F.min("pos").cast("long").alias("first_hit_pos"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 13,
    broadcast_benchmark: bool = True,
    bench_text_col: str | None = None,
) -> DataFrame:
    """The corpus minus every contaminated document (left-anti join on
    the report's doc ids; the report is contamination-sized — tiny next
    to the corpus — so AQE converts the anti-join to a broadcast)."""
    flagged = contamination_report(
        corpus, benchmark, text_col, id_col, window, broadcast_benchmark,
        bench_text_col,
    ).select(id_col)
    return corpus.join(flagged, id_col, "left_anti")
