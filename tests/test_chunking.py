"""Token-window document chunking: closed-form window math, overlap
reconstruction, degenerate shapes, and a pure-Python brute-force parity
check on randomized corpora."""

from __future__ import annotations

import random
import re

import pytest

from schemasaurus_spark.operators.chunking import chunk_documents


def _mk_docs(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )


def _brute_chunks(texts: dict[int, str], window: int, overlap: int):
    """Independent reference: plain Python sliding windows."""
    stride = window - overlap
    out = set()
    for i, t in texts.items():
        if t is None or not t.strip():
            continue
        toks = re.split(r"\s+", t.strip().lower())
        k = 0
        while k * stride < len(toks):
            piece = toks[k * stride : k * stride + window]
            out.add((i, k, k * stride, len(piece), " ".join(piece)))
            k += 1
    return out


def _collect(df):
    return {
        (r.doc_id, r.chunk_id, r.start_tok, r.n_tok, r.chunk_text)
        for r in df.collect()
    }


def test_chunking_planted_exact_windows(spark):
    # 10 tokens, window 4, overlap 1 -> stride 3 -> starts 0,3,6,9
    text = "a b c d e f g h i j"
    df = _mk_docs(spark, {1: text})
    got = _collect(chunk_documents(df, window=4, overlap=1))
    assert got == {
        (1, 0, 0, 4, "a b c d"),
        (1, 1, 3, 4, "d e f g"),
        (1, 2, 6, 4, "g h i j"),
        (1, 3, 9, 1, "j"),
    }


def test_chunking_short_doc_single_chunk_and_skips(spark):
    df = _mk_docs(spark, {1: "only three tokens", 2: None, 3: "   ", 4: "x"})
    got = _collect(chunk_documents(df, window=128, overlap=16))
    assert got == {
        (1, 0, 0, 3, "only three tokens"),
        (4, 0, 0, 1, "x"),
    }


def test_chunking_zero_overlap_partitions_exactly(spark):
    # window == stride: chunks partition the token sequence
    text = " ".join(f"t{i}" for i in range(10))
    df = _mk_docs(spark, {7: text})
    rows = sorted(
        chunk_documents(df, window=3, overlap=0).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.n_tok for r in rows] == [3, 3, 3, 1]
    reassembled = " ".join(r.chunk_text for r in rows)
    assert reassembled == text


def test_chunking_overlap_consistency(spark):
    # consecutive chunks share exactly `overlap` tokens when both are full
    text = " ".join(f"w{i}" for i in range(40))
    rows = sorted(
        chunk_documents(_mk_docs(spark, {1: text}), window=8, overlap=3).collect(),
        key=lambda r: r.chunk_id,
    )
    for a, b in zip(rows, rows[1:]):
        if a.n_tok == 8:
            assert a.chunk_text.split()[-3:] == b.chunk_text.split()[:3]
        assert b.start_tok - a.start_tok == 5


def test_chunking_brute_force_parity_random(spark):
    rng = random.Random(41)
    vocab = [f"v{i}" for i in range(30)]
    texts = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))
        for i in range(60)
    }
    texts[60] = None
    for window, overlap in [(4, 0), (6, 2), (10, 9), (3, 1)]:
        df = _mk_docs(spark, texts)
        got = _collect(chunk_documents(df, window=window, overlap=overlap))
        assert got == _brute_chunks(texts, window, overlap)


def test_chunking_rejects_bad_config(spark):
    df = _mk_docs(spark, {1: "a b"})
    with pytest.raises(ValueError):
        chunk_documents(df, window=0)
    with pytest.raises(ValueError):
        chunk_documents(df, window=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(df, window=4, overlap=-1)
