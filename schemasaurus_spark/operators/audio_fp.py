"""Audio near-duplicate detection via quantized energy-envelope shingles
— the audio member of the multimodal dedup family (text: dedup.py LSH;
images: phash.py aHash).

Re-encoded, truncated, or slightly-perturbed copies of a recording keep
(nearly) the same short-time ENERGY ENVELOPE even when their bytes share
nothing.  The operator fingerprints that envelope and shingles it:

1. **Frame energies** (one decode pass): the REAL WAV kernel
   (operators/wav.py) runs inside Arrow-batched ``mapInPandas``; each
   audio becomes a small array of exact int64 frame energies
   (``sum(sample^2)`` over ``frame_len`` time steps x all channels —
   integer arithmetic end-to-end, so the SQL oracle reproduces every
   value from the synth sample formula without touching bytes).
2. **Quantize** (in-plan, JVM): ``energy div 2^quant_shift`` — factor-of-
   tolerance buckets, so a few perturbed samples (re-dither, mild gain
   error) land in the same bucket; integer division, engine-portable.
3. **Shingle + join**: every run of ``k`` consecutive quantized energies
   becomes a gram; two audios sharing ``>= min_shared`` DISTINCT grams
   are near-duplicates.  Alignment tolerance is whole frames — a copy
   trimmed or padded by multiples of ``frame_len`` still matches
   (sample-level offsets need an offset sweep upstream, documented
   honestly; frame-multiple trims are the common re-encode case).

Scale shape: the decode pass emits ONE small array row per audio (never
per-frame rows across the exchange); quantization/shingling are JVM
``transform`` projections; the candidate join is an equi-join on the
gram value whose hot buckets (silence!) take the same cap-with-report
treatment as dedup.py when needed — silence-heavy corpora should drop
all-zero grams the way text dedup drops stopword shingles.

Published technique (energy-envelope / Haitsma-Kalker-style robust
hashing, here the FFT-free energy variant), not any repo's code.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

ENERGY_SCHEMA = "media_ref string, energies array<bigint>"


def wav_energy_frames(
    media: DataFrame,
    frame_len: int = 16,
    id_col: str = "media_ref",
    payload_col: str = "payload",
) -> DataFrame:
    """Decode each WAV payload and emit ``(media_ref, energies)`` where
    ``energies[f] = sum over frame f's samples (all channels) of s^2``
    as exact int64; the trailing partial frame is dropped (its energy
    depends on cut position, not content)."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from schemasaurus_spark.operators.wav import decode_wav

        for pdf in it:
            rows = []
            for ref, payload in zip(pdf[id_col], pdf[payload_col]):
                arr, _rate = decode_wav(bytes(payload))
                n = (arr.shape[0] // frame_len) * frame_len
                a64 = arr[:n].astype(np.int64) ** 2
                # (frames, frame_len * ch) slab sum — vectorized, exact
                e = a64.reshape(n // frame_len, -1).sum(axis=1)
                rows.append((ref, [int(x) for x in e]))
            yield pd.DataFrame(rows, columns=["media_ref", "energies"])

    return media.mapInPandas(batches, ENERGY_SCHEMA)


def audio_near_dups(
    media: DataFrame,
    frame_len: int = 16,
    k: int = 4,
    min_shared: int = 2,
    quant_shift: int = 24,
    id_col: str = "media_ref",
    payload_col: str = "payload",
) -> DataFrame:
    """Near-duplicate audio pairs ``(ref_a, ref_b, shared_grams)`` with
    ``ref_a < ref_b`` and ``shared_grams >= min_shared`` distinct shared
    envelope k-grams.  Audios with fewer than ``k`` whole frames produce
    no grams (too short to fingerprint) — excluded, never crashed on."""
    frames = wav_energy_frames(media, frame_len, id_col, payload_col)
    grams = (
        frames.where(F.size("energies") >= k)
        .select(
            "media_ref",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(energies) - {k}), i -> "
                    f"concat_ws(',', slice(transform(energies, "
                    f"e -> e div {1 << quant_shift}), i + 1, {k})))"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    a = grams.alias("a")
    b = grams.alias("b")
    return (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.media_ref") < F.col("b.media_ref")),
        )
        .groupBy(
            F.col("a.media_ref").alias("ref_a"),
            F.col("b.media_ref").alias("ref_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_grams"))
        .where(F.col("shared_grams") >= min_shared)
    )
