"""Pinned performance floor for the JPEG entropy decoder (VERDICT r4
'What's wrong' #2 / next-round #5): the per-symbol Python loop is the
one remaining Python-loop kernel in the media family, so its measured
throughput is recorded and pinned — a regression that makes it
catastrophically slower (an accidental per-BIT loop, a LUT rebuild per
block) must fail loudly, and the measured number in the module doc must
stay honest.

The fixture is photographic-CONTENT (gradient + noise), not the
block-constant oracle fixtures: block-constant content is DC-only
(~3 symbols/block) and would flatter the symbol rate ~20x.

Pins are deliberately loose (>= 0.08 Mpixel/s vs ~0.75 measured) —
this box is co-tenant (BENCH/BASELINE.md) and a perf test that flakes
under neighbor load is worse than none."""

import time

import numpy as np

from schemasaurus_spark.operators.jpeg import (
    decode_jpeg_luma,
    encode_jpeg,
)


def _photographic(h: int, w: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        128
        + 60 * np.sin(yy / 23)
        + 50 * np.cos(xx / 17)
        + rng.normal(0, 18, (h, w))
    ).clip(0, 255).astype(np.uint8)


def test_entropy_decode_throughput_floor():
    img = _photographic(512, 512)
    data = encode_jpeg(img)
    # photographic content must actually stress the huffman path: the
    # stream should be dense (>= 0.5 bit/pixel compressed), unlike the
    # DC-only oracle fixtures
    assert len(data) * 8 >= 0.5 * img.size

    decode_jpeg_luma(data)  # warm (LUT/codepath caches, numpy init)
    t0 = time.time()
    out = decode_jpeg_luma(data)
    dt = time.time() - t0
    assert out.shape == (512, 512)

    mpix_per_s = img.size / dt / 1e6
    # measured ~0.75 Mpixel/s warm (module doc); floor at ~10x slack for
    # co-tenant noise — catches an accidental per-bit loop (~100x slower)
    assert mpix_per_s >= 0.08, (
        f"JPEG entropy decode regressed: {mpix_per_s:.3f} Mpixel/s "
        f"({dt:.2f}s for 512x512, {len(data)} compressed bytes)"
    )


def test_photographic_roundtrip_is_faithful_at_q1():
    """The perf fixture rides on a verified-correct path: at all-ones
    quantization the only loss is the integer rounding of real-valued
    FDCT coefficients, which bounds per-pixel error to a few counts
    (exactness proper is oracled on block-constant content, whose DCT is
    integral — media_jpeg_features)."""
    img = _photographic(64, 64, seed=11)
    out = decode_jpeg_luma(encode_jpeg(img))
    err = np.abs(out - img.astype(np.int64))
    assert err.max() <= 3 and err.mean() <= 1.0, (err.max(), err.mean())
