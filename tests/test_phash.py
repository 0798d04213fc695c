"""Perceptual-hash image near-dups: banded result == brute force (the
pigeonhole-exactness contract), planted variants detected, r=0 path,
validation."""

import pytest

from schemasaurus_spark.operators.media import synth_png_media_table
from schemasaurus_spark.operators.phash import ahash64, phash_near_dups


@pytest.fixture(scope="module")
def media(spark):
    base = synth_png_media_table(spark, 40, seed=42)
    variants = synth_png_media_table(spark, 10, seed=43, ref_prefix="media://png-v/")
    return base.unionByName(variants)


def _brute(spark, media, r):
    rows = ahash64(media).collect()
    out = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            x, y = sorted((a.media_ref, b.media_ref))
            ha = a.ahash ^ b.ahash
            d = bin(ha & ((1 << 64) - 1)).count("1")
            if d <= r:
                out.add((x, y, d))
    return out


@pytest.mark.parametrize("r", [0, 2, 4])
def test_banded_equals_brute_force(spark, media, r):
    got = {
        (p.ref_a, p.ref_b, p.hamming)
        for p in phash_near_dups(media, max_hamming=r).collect()
    }
    assert got == _brute(spark, media, r)


def test_planted_variants_all_detected(spark, media):
    got = {
        (p.ref_a, p.ref_b)
        for p in phash_near_dups(media, max_hamming=4).collect()
    }
    for i in range(10):
        pair = tuple(sorted((f"media://png/{i}", f"media://png-v/{i}")))
        assert pair in got, f"variant pair {pair} missed"


def test_hamming_bounds_and_validation(spark, media):
    rows = phash_near_dups(media, max_hamming=2).collect()
    assert rows and all(0 <= p.hamming <= 2 for p in rows)
    with pytest.raises(ValueError, match="max_hamming"):
        phash_near_dups(media, max_hamming=64)


def test_bucket_cap_reduces_candidates_but_caps_are_reported_upstream(
    spark, media
):
    """bucket_cap plugs dedup.py's hot-bucket guard into the band join;
    with a cap of 1 every bucket collapses to one row — no pairs."""
    assert phash_near_dups(media, max_hamming=2, bucket_cap=1).count() == 0
