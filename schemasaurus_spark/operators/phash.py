"""Perceptual image near-duplicate detection (average hash, aHash).

Pixel-level image dedup — the multimodal counterpart of the text LSH
family: re-encoded, slightly-edited, or re-rendered copies of an image
survive embedding-free detection via a 64-bit perceptual hash.  aHash is
the public-domain baseline (downscale to an 8×8 grid, threshold each
cell against the global mean); two images are near-duplicates when the
Hamming distance of their hashes is ≤ r.

Pipeline shape (mirrors dedup.py's banded LSH discipline):

1. **Hash** (one decode pass): the REAL PNG decode kernel
   (operators/png.py) runs inside Arrow-batched ``mapInPandas``; the
   8×8 block sums are vectorized ``np.add.at`` scatters and the
   bit-threshold is exact integer arithmetic
   (``block_sum·n_pixels ≥ total·block_count`` — no float means, so the
   SQL oracle reproduces every bit).
2. **Band join** (pigeonhole-exact candidates): the 64-bit hash splits
   into ``r+1`` contiguous bands — any pair within Hamming distance r
   must agree exactly on at least one band (same guarantee simhash
   blocking uses), so the banded self-join misses NOTHING; candidates
   are verified with ``bit_count(a XOR b) ≤ r`` in-plan.
3. The band join is an equi-join on ``(band_idx, band_value)`` —
   hot buckets (flat/boilerplate images all share band values) take the
   same cap-with-report treatment as dedup.py when needed
   (``bucket_cap``).

Contract ``media_phash_near_dups``: the oracle recomputes every hash
from the closed-form synth pixel formula in pure SQL (generate_series
pixel enumeration → HUGEINT bit packing → brute-force all-pairs
``bit_count(xor())``) — a decoder, block-geometry, bit-order, or
banding bug all hash-mismatch.  aHash is a published technique, not any
repo's code.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ahash64", "phash_near_dups"]


def _ahash_bits(arr: np.ndarray) -> int:
    """64-bit aHash of a decoded HxWx{1,3} uint8 array, MSB-first block
    order, exact integer thresholding."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, _ = arr.shape
    luma = arr.astype(np.int64).sum(axis=2)
    bi = (8 * np.arange(h)) // h
    bj = (8 * np.arange(w)) // w
    acc = np.zeros((8, 8), np.int64)
    cnt = np.zeros((8, 8), np.int64)
    np.add.at(acc, (np.repeat(bi, w), np.tile(bj, h)), luma.ravel())
    np.add.at(cnt, (np.repeat(bi, w), np.tile(bj, h)), 1)
    total = int(luma.sum())
    npx = h * w
    bits = 0
    for b in range(8):
        for b2 in range(8):
            bits = (bits << 1) | int(acc[b, b2] * npx >= total * cnt[b, b2])
    return bits - (1 << 64) if bits >= 1 << 63 else bits


def ahash64(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_ref"
) -> DataFrame:
    """(id_col, ahash) — one decode+hash pass, Arrow-batched."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from schemasaurus_spark.operators.png import decode_png

        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "ahash": [
                        _ahash_bits(decode_png(bytes(p)))
                        for p in pdf[payload_col]
                    ],
                }
            )

    return media.mapInPandas(batches, f"{id_col} string, ahash long")


def _band_bounds(n_bands: int) -> list[tuple[int, int]]:
    """(shift, width) per band covering all 64 bits contiguously."""
    base, extra = divmod(64, n_bands)
    bounds, pos = [], 0
    for b in range(n_bands):
        width = base + (1 if b < extra else 0)
        bounds.append((64 - pos - width, width))
        pos += width
    return bounds


def phash_near_dups(
    media: DataFrame,
    max_hamming: int = 4,
    payload_col: str = "payload",
    id_col: str = "media_ref",
    bucket_cap: int | None = None,
) -> DataFrame:
    """All image pairs with aHash Hamming distance ≤ ``max_hamming``:
    ``(ref_a, ref_b, hamming)`` — EXACT (banding is pigeonhole-complete,
    the verify is in-plan ``bit_count``).  ``bucket_cap`` applies
    dedup.py's hot-bucket cap to the band join when set."""
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    hashes = ahash64(media, payload_col, id_col)
    n_bands = max_hamming + 1
    if n_bands < 2:
        # distance 0 = exact hash equality; no banding needed
        a, b = hashes.alias("a"), hashes.alias("b")
        return (
            a.join(b, F.col("a.ahash") == F.col("b.ahash"))
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(
                F.col(f"a.{id_col}").alias("ref_a"),
                F.col(f"b.{id_col}").alias("ref_b"),
                F.lit(0).alias("hamming"),
            )
        )

    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("ahash"), shift)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bval"),
            )
            for i, (shift, width) in enumerate(_band_bounds(n_bands))
        ]
    )
    rows = hashes.select(
        F.col(id_col), F.col("ahash"), F.explode(bands).alias("b")
    ).select(id_col, "ahash", "b.band", "b.bval")
    if bucket_cap is not None:
        from schemasaurus_spark.operators.dedup import _cap_buckets

        rows = _cap_buckets(rows, ["band", "bval"], bucket_cap)
    a, b = rows.alias("a"), rows.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("ref_a"),
            F.col(f"b.{id_col}").alias("ref_b"),
            F.bit_count(
                F.col("a.ahash").bitwiseXOR(F.col("b.ahash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs
