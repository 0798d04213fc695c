"""Bloom-filter-accelerated EXACT membership / novelty checks.

The ingest-side question at 10^12 docs is "which of today's N new
documents are already in the corpus?".  The textbook answer — a
``left_anti`` join of the batch against the corpus fingerprint column —
is exact but shuffles the corpus projection (16 B/row is still ~16 TB of
exchange at 10^12 rows) on every ingest cycle.  This module keeps the
EXACT answer while removing the corpus shuffle entirely:

1. **Build** (one corpus scan, zero shuffles): each partition folds its
   fingerprints into a local Bloom bitmap inside ``mapInPandas``
   (vectorized numpy bit-sets over JVM-computed ``xxhash64`` keys — no
   per-row Python), then the per-partition bitmaps are OR-merged with
   ``treeAggregate`` (log-depth executor-side combine; the driver ever
   sees only ``depth`` bitmaps, not one per partition).  The bitmap is
   metadata-sized (1 GiB serves ~8.6 × 10^8 keys at 1% fpp; shard the
   build by fingerprint prefix for more) and is reusable across ingest
   cycles — amortize the corpus scan like ``minhash_band_index`` does.
2. **Probe** (batch-side map pass): a vectorized pandas UDF tests the k
   bit positions against the TorrentBroadcast-shipped bitmap.  Rows the
   filter rejects are DEFINITELY novel (a Bloom filter has no false
   negatives); only the "maybe present" survivors — overlap +
   fpp·novel, typically a sliver of the batch — need exact
   confirmation.
3. **Verify** (exact, broadcast-only): the tiny maybe-set is broadcast
   and the corpus is semi-joined against it MAP-SIDE (one more corpus
   scan, still zero exchanges), yielding the set of fingerprints that
   truly exist; novel = definite ∪ (maybe ∖ present).

Result is provably identical to the plain anti-join (pytest pins
equality on planted overlaps, with the filter deliberately undersized to
force false positives through the verify path); the oracle replays the
plain ``NOT EXISTS`` in SQL.  Hashing is double hashing h1 + i·h2
(Kirsch & Mitzenmacher 2006) over JVM ``xxhash64`` with a splitmix64
finalizer for h2 — fully deterministic, vectorized end to end.

No reference counterpart (ingest-scale surface, like dedup.py's band
index); the fingerprint definition (md5 of whitespace-normalized
lowercased text) is shared with ``dedup.exact_duplicate_groups``.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from schemasaurus_spark.operators.dedup import normalize_text

__all__ = [
    "derive_bloom_params",
    "build_bloom_bitmap",
    "bloom_might_contain",
    "bloom_novel_docs",
    "novelty_prefilter",
]


def derive_bloom_params(expected_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard sizing: bits m = -n·ln p / (ln 2)², hashes k = m/n·ln 2.

    Returns ``(n_bits, n_hashes)`` with ``n_bits`` rounded up to a
    multiple of 8 (whole bytes).
    """
    if not 0 < fpp < 1:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    n = max(1, int(expected_keys))
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants) used to
    derive the second hash of the double-hashing scheme from the JVM
    xxhash64 value.  uint64 arithmetic wraps naturally in numpy."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _positions(h: np.ndarray, i: int, n_bits: int) -> np.ndarray:
    """Bit positions of hash function i: (h1 + i·h2) mod n_bits, with h2
    forced odd so the k probes never collapse onto one position."""
    h2 = _splitmix64(h) | np.uint64(1)
    return (h + np.uint64(i) * h2) % np.uint64(n_bits)


def _as_uint64(s: pd.Series) -> np.ndarray:
    # int64 -> uint64 via view: astype would raise on negative values
    return np.ascontiguousarray(s.to_numpy(dtype=np.int64, na_value=42)).view(
        np.uint64
    )


def build_bloom_bitmap(
    keyed: DataFrame, key_col: str, n_bits: int, n_hashes: int
) -> bytes:
    """One-scan, zero-shuffle Bloom build over ``keyed[key_col]``.

    ``key_col`` may be any type — it is hashed JVM-side with
    ``xxhash64`` before reaching Python, so the Arrow transfer is 8
    bytes/row regardless of key width.  Per-partition bitmaps are
    OR-folded executor-side via ``treeAggregate`` (empty input yields
    the all-zeros bitmap, never an error).
    """
    if n_bits % 8 or n_bits <= 0:
        raise ValueError(f"n_bits must be a positive multiple of 8, got {n_bits}")
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    n_bytes = n_bits // 8
    hashed = keyed.select(F.xxhash64(key_col).alias("_h"))

    def fold_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bmp = np.zeros(n_bytes, dtype=np.uint8)
        saw = False
        for pdf in batches:
            saw = True
            h = _as_uint64(pdf["_h"])
            for i in range(n_hashes):
                pos = _positions(h, i, n_bits)
                # bitwise_or.at handles repeated byte indices within one call
                np.bitwise_or.at(
                    bmp,
                    (pos >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
                )
        if saw:
            yield pd.DataFrame({"bitmap": [bmp.tobytes()]})

    parts = hashed.mapInPandas(fold_partition, "bitmap binary")

    zero = bytes(n_bytes)

    def _or(a: bytes, b) -> bytes:
        bb = b.bitmap if hasattr(b, "bitmap") else b
        return np.bitwise_or(
            np.frombuffer(a, dtype=np.uint8), np.frombuffer(bb, dtype=np.uint8)
        ).tobytes()

    return parts.rdd.treeAggregate(zero, _or, _or, depth=2)


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    bitmap: bytes,
    n_bits: int,
    n_hashes: int,
    out_col: str = "_maybe",
) -> DataFrame:
    """Append boolean ``out_col``: True iff all k probe bits are set.

    The bitmap ships to executors as a real Spark broadcast
    (TorrentBroadcast — fetched once per executor, not per task); the
    probe is a vectorized pandas UDF over the JVM-side ``xxhash64`` of
    the key.
    """
    bc = df.sparkSession.sparkContext.broadcast(bitmap)
    nb, k = int(n_bits), int(n_hashes)

    @pandas_udf("boolean")
    def probe(h: pd.Series) -> pd.Series:
        bmp = np.frombuffer(bc.value, dtype=np.uint8)
        x = _as_uint64(h)
        ok = np.ones(len(x), dtype=bool)
        for i in range(k):
            pos = _positions(x, i, nb)
            ok &= (
                bmp[(pos >> np.uint64(3)).astype(np.int64)]
                >> (pos & np.uint64(7)).astype(np.uint8)
                & np.uint8(1)
            ).astype(bool)
        return pd.Series(ok)

    return df.withColumn(out_col, probe(F.xxhash64(key_col)))


def bloom_novel_docs(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 1 << 23,
    n_hashes: int = 5,
    verify: str = "broadcast",
) -> DataFrame:
    """EXACT novelty: batch docs whose normalized-text fingerprint does
    not occur in the corpus — ``(id_col, fingerprint)``, identical to a
    plain anti-join (``NOT EXISTS`` semantics; NULL-text rows fingerprint
    to NULL and are always novel, matching both engines' anti-join).

    ``verify="broadcast"`` (default) is the zero-exchange plan described
    in the module docstring — use when the maybe-set (overlap +
    fpp·batch) fits the broadcast threshold, which is the designed
    operating point (size ``n_bits`` for the corpus via
    ``derive_bloom_params``).  ``verify="shuffle"`` falls back to a
    plain anti-join OF THE MAYBE-SET (still bloom-pruned: the novel bulk
    of the batch never enters the exchange) for overlap-heavy batches.
    """
    if verify not in ("broadcast", "shuffle"):
        raise ValueError(f"verify must be 'broadcast' or 'shuffle', got {verify!r}")
    fp = F.md5(normalize_text(F.col(text_col)))
    corpus_fps = corpus.select(fp.alias("fingerprint"))
    bitmap = build_bloom_bitmap(corpus_fps, "fingerprint", n_bits, n_hashes)

    batch_fp = batch.select(F.col(id_col), fp.alias("fingerprint"))
    probed = bloom_might_contain(batch_fp, "fingerprint", bitmap, n_bits, n_hashes)
    definite = probed.where(~F.col("_maybe")).drop("_maybe")
    maybe = probed.where(F.col("_maybe")).drop("_maybe")

    if verify == "broadcast":
        maybe_fps = maybe.select("fingerprint").where(
            F.col("fingerprint").isNotNull()
        ).distinct()
        present = corpus_fps.join(
            F.broadcast(maybe_fps), "fingerprint", "left_semi"
        ).distinct()
        survivors = maybe.join(F.broadcast(present), "fingerprint", "left_anti")
    else:
        survivors = maybe.join(corpus_fps, "fingerprint", "left_anti")
    return definite.unionByName(survivors)


def novelty_prefilter(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fpp: float = 0.01,
    expected_keys: int | None = None,
    verify: str = "broadcast",
) -> DataFrame:
    """Ingest pre-filter: the rows of ``batch`` (ALL columns preserved)
    whose normalized-text fingerprint is not already in ``corpus`` —
    ``bloom_novel_docs`` composed for pipeline use.

    Sizing: ``expected_keys`` skips the corpus count (pass the corpus's
    known row count, e.g. from the previous cycle's report — the right
    call at 10^12 rows); when omitted the corpus is counted once
    (parquet metadata count — no data scan).  The filter is sized with
    ``derive_bloom_params(keys, fpp)``.

    The novel id set is joined back ``left_semi`` on ``id_col`` so the
    batch keeps its full schema; the ids are thin (8-16 B/row) and AQE
    broadcasts the side that fits, so at the designed operating point
    (mostly-novel daily batch) this adds one small exchange at most.
    """
    keys = int(expected_keys) if expected_keys is not None else corpus.count()
    n_bits, n_hashes = derive_bloom_params(keys, fpp)
    novel = bloom_novel_docs(
        batch, corpus, text_col, id_col, n_bits=n_bits, n_hashes=n_hashes,
        verify=verify,
    ).select(id_col)
    return batch.join(novel, id_col, "left_semi")
