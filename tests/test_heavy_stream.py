"""Streaming Misra-Gries: merge-rule unit properties, cross-batch
guarantees (undercount bound, superset, certainty flag), restart
resume, replay idempotence."""

import pytest

from schemasaurus_spark.streaming.heavy_stream import (
    heavy_hitters_stream,
    merge_mg,
)


def test_merge_mg_pure_properties():
    # bounded at k-1, undercount only, strictly-greater-than-excess keep
    carried = [("a", 10), ("b", 4)]
    batch = [("b", 3), ("c", 2), ("d", 2), ("e", 1)]
    k = 3
    merged = dict(merge_mg(carried, batch, k))
    assert len(merged) <= k - 1
    # combined: a=10 b=7 c=2 d=2 e=1 -> excess = 3rd largest = 2
    assert merged == {"a": 8, "b": 5}
    # ties at the cut drop deterministically (no item with combined == excess kept)
    assert merge_mg([], [("x", 2), ("y", 2), ("z", 2)], 3) == []
    assert merge_mg([], [], 5) == []
    assert merge_mg([], [("only", 7)], 2) == [("only", 7)]


def _write(spark, rows, path):
    spark.createDataFrame(rows, "doc_id long, token string").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_stream_guarantees_across_batches_and_restart(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    k = 4

    # batch 1: 'hot' 12x, noise 8 distinct x1
    b1 = [(i, "hot") for i in range(12)] + [
        (100 + i, f"n{i}") for i in range(8)
    ]
    # batch 2: 'hot' 10x, 'warm' 9x, more noise
    b2 = [(200 + i, "hot") for i in range(10)] + [
        (300 + i, "warm") for i in range(9)
    ] + [(400 + i, f"m{i}") for i in range(5)]
    true_counts = {"hot": 22, "warm": 9}
    n_total = len(b1) + len(b2)

    _write(spark, b1, in_dir)
    q = heavy_hitters_stream(spark, in_dir, out_dir, col="token", k=k)
    q.awaitTermination(120)

    _write(spark, b2, in_dir)
    q2 = heavy_hitters_stream(spark, in_dir, out_dir, col="token", k=k)
    q2.awaitTermination(120)

    sk = spark.read.parquet(f"{out_dir}/sketch")
    last = sk.agg({"batch_id": "max"}).first()[0]
    rows = {
        r.item: r
        for r in spark.read.parquet(f"{out_dir}/report")
        .where(f"batch_id = {last}")
        .collect()
    }
    # true heavy (22 > 45/4) must be present and certain
    assert "hot" in rows
    assert rows["hot"].n_total == n_total
    assert rows["hot"].certain
    # undercount bound for every reported item with a known true count
    for item, r in rows.items():
        f = true_counts.get(item, 5)  # noise items appeared <= 1 time per batch
        if item in true_counts:
            assert r.est_count <= f <= r.est_count + n_total / k

    # replay with no new input: idempotent (availableNow with no files -> no new batch)
    q3 = heavy_hitters_stream(spark, in_dir, out_dir, col="token", k=k)
    q3.awaitTermination(120)
    again = spark.read.parquet(f"{out_dir}/report").where(
        f"batch_id = {last}"
    ).count()
    assert again == len(rows)


def test_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        heavy_hitters_stream(
            spark, str(tmp_path), str(tmp_path / "o"), col="token", k=1
        )
