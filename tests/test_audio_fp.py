"""Audio envelope near-dup: perturbation tolerance (one-sample edit stays
in the same quantized bucket), truncated-copy detection, non-match
isolation, and the too-short-to-fingerprint guard."""

from __future__ import annotations

import numpy as np

from schemasaurus_spark.operators.audio_fp import audio_near_dups, wav_energy_frames
from schemasaurus_spark.operators.wav import encode_wav

FL = 16  # frame_len


def _const_frames(consts):
    return np.concatenate([np.full(FL, v, dtype=np.int16) for v in consts])


def _media(spark, named_samples):
    rows = [(ref, "audio", encode_wav(s), {}) for ref, s in named_samples]
    return spark.createDataFrame(
        rows,
        "media_ref string, media_kind string, payload binary, "
        "meta map<string,string>",
    )


BASE = [10000, 14000, 18000, 22000, 26000, 30000]


def test_energy_frames_exact_and_partial_frame_dropped(spark):
    samples = _const_frames(BASE)
    df = _media(spark, [("a", np.concatenate([samples, np.full(7, 123, np.int16)]))])
    out = wav_energy_frames(df, FL).collect()[0]
    assert out["energies"] == [FL * v * v for v in BASE], "exact int64 energies"
    # the 7 trailing samples do not form a whole frame — dropped


def test_near_dups_tolerance_truncation_and_isolation(spark):
    a = _const_frames(BASE)
    b = a.copy()
    b[3] += 1  # energy shifts by 2*10000+1 << 2^24: same quantized bucket
    c = _const_frames(BASE[::-1])  # different envelope order
    d = _const_frames(BASE[:-1])  # truncated re-encode of a
    e = _const_frames(BASE[:3])  # 3 frames < k: too short to fingerprint
    pairs = {
        (r["ref_a"], r["ref_b"]): r["shared_grams"]
        for r in audio_near_dups(
            _media(spark, [("a", a), ("b", b), ("c", c), ("d", d), ("e", e)]),
            frame_len=FL, k=4, min_shared=2,
        ).collect()
    }
    assert pairs[("a", "b")] == 3, "perturbed copy shares all 3 grams"
    assert pairs[("a", "d")] == 2 and pairs[("b", "d")] == 2, "truncated copy"
    assert not any("c" in p or "e" in p for p in pairs), (
        "reordered envelope and too-short audio must not pair"
    )


def test_large_perturbation_breaks_the_pair(spark):
    a = _const_frames(BASE)
    f = a.copy()
    f[:FL] = 20000  # first frame's bucket moves far away
    pairs = audio_near_dups(
        _media(spark, [("a", a), ("f", f)]), frame_len=FL, k=4, min_shared=3
    ).collect()
    # grams containing frame 0 differ; only 2 of 3 grams survive < min_shared=3
    assert pairs == []


def test_audio_pairs_compose_with_connected_components(spark):
    """The multimodal dedup families share one clustering backend: audio
    near-dup PAIRS feed dedup.connected_components unchanged, so a chain
    a~b, b~d collapses to one component even when a~d itself was not
    emitted (here it is — assert the full triangle clusters together,
    isolated c stays out)."""
    from schemasaurus_spark.operators.dedup import connected_components

    a = _const_frames(BASE)
    b = a.copy()
    b[3] += 1
    d = _const_frames(BASE[:-1])
    c = _const_frames(BASE[::-1])
    pairs = audio_near_dups(
        _media(spark, [("a", a), ("b", b), ("c", c), ("d", d)]),
        frame_len=FL, k=4, min_shared=2,
    )
    labels = {
        r["id"]: r["comp_id"]
        for r in connected_components(pairs, "ref_a", "ref_b").collect()
    }
    assert labels == {"a": "a", "b": "a", "d": "a"}, (
        "the a/b/d near-dup cluster shares one component keyed by its "
        "minimum member; c (no pairs) is absent"
    )
