"""Bucketed-layout evidence: the co-located join / aggregation paths are
exchange-free IN THE PLAN (not just asserted in prose), point lookups
bucket-prune, and every bucketed result is value-identical to the plain
unkeyed plan.  Layout changes physics, never answers — so the checks here
are plan-shape + value-equality rather than a SQL oracle row."""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from schemasaurus_spark.sources.bucketed import (
    bucketed_duplicate_keys,
    colocated_join,
    exchange_count,
    selected_buckets,
    write_bucketed,
)


@contextmanager
def _conf(spark, settings: dict):
    old = {k: spark.conf.get(k, None) for k in settings}
    try:
        for k, v in settings.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


NO_BROADCAST = {"spark.sql.autoBroadcastJoinThreshold": "-1"}


def _docs(spark):
    # 200 rows over 190 distinct ids: ids 0..9 appear twice (planted dups)
    rows = [(f"doc-{i % 190:05d}", f"text {i}") for i in range(200)]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _emb(spark):
    rows = [(f"doc-{i:05d}", float(i) / 7.0) for i in range(100, 250)]
    return spark.createDataFrame(rows, "doc_id string, score double")


def _cleanup(spark, *tables):
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_colocated_join_no_exchange_and_value_identical(spark, tmp_path):
    docs, emb = _docs(spark), _emb(spark)
    try:
        write_bucketed(docs, "tb_docs", "doc_id", 8, path=str(tmp_path / "d"))
        write_bucketed(emb, "tb_emb", "doc_id", 8, path=str(tmp_path / "e"))
        with _conf(spark, NO_BROADCAST):
            j = colocated_join(spark, "tb_docs", "tb_emb", on="doc_id")
            assert exchange_count(j) == 0, (
                "bucketed-bucketed equi-join must not shuffle"
            )
            got = sorted(map(tuple, j.collect()))
        want = sorted(map(tuple, docs.join(emb, "doc_id").collect()))
        assert got == want
    finally:
        _cleanup(spark, "tb_docs", "tb_emb")


def test_unkeyed_control_join_does_shuffle(spark, tmp_path):
    # the control that proves exchange_count CAN fail: same data written as
    # plain parquet (no bucket metadata) plans an Exchange on both sides
    docs, emb = _docs(spark), _emb(spark)
    docs.write.parquet(str(tmp_path / "d"))
    emb.write.parquet(str(tmp_path / "e"))
    with _conf(spark, NO_BROADCAST):
        j = spark.read.parquet(str(tmp_path / "d")).join(
            spark.read.parquet(str(tmp_path / "e")), "doc_id"
        )
        assert exchange_count(j) >= 2


def test_bucketed_aggregate_no_exchange(spark, tmp_path):
    docs = _docs(spark)
    try:
        write_bucketed(docs, "tb_agg", "doc_id", 8, path=str(tmp_path / "d"))
        dups = bucketed_duplicate_keys(spark, "tb_agg", "doc_id")
        assert exchange_count(dups) == 0, (
            "groupBy on the bucket key must aggregate per-bucket, no shuffle"
        )
        got = {r["doc_id"] for r in dups.collect()}
        assert got == {f"doc-{i:05d}" for i in range(10)}
        assert all(r["cnt"] == 2 for r in dups.collect())
    finally:
        _cleanup(spark, "tb_agg")


def test_bucket_pruned_point_lookup(spark, tmp_path):
    docs = _docs(spark)
    try:
        write_bucketed(docs, "tb_prune", "doc_id", 8, path=str(tmp_path / "d"))
        q = spark.table("tb_prune").where(F.col("doc_id") == "doc-00042")
        # the autoBucketedScan planner rule only credits joins/aggregates,
        # not filter pruning — a bare point lookup reverts to a full scan
        # unless it is disabled (documented on selected_buckets)
        assert selected_buckets(q) is None
        with _conf(
            spark,
            {"spark.sql.sources.bucketing.autoBucketedScan.enabled": "false"},
        ):
            # fresh plan: QueryExecution caches its physical plan, so the
            # pre-conf probe above must not be reused
            q2 = spark.table("tb_prune").where(F.col("doc_id") == "doc-00042")
            sel = selected_buckets(q2)
            assert sel == (1, 8), "point filter on the bucket key must prune"
            assert q2.count() == 1
    finally:
        _cleanup(spark, "tb_prune")


def test_coalesced_bucket_counts_still_no_exchange(spark, tmp_path):
    # 8-bucket left vs 4-bucket right: with coalesceBucketsInJoin Spark
    # reads the finer side 2-buckets-into-1 instead of shuffling either
    docs, emb = _docs(spark), _emb(spark)
    try:
        write_bucketed(docs, "tb_l8", "doc_id", 8, path=str(tmp_path / "l"))
        write_bucketed(emb, "tb_r4", "doc_id", 4, path=str(tmp_path / "r"))
        with _conf(
            spark,
            dict(
                NO_BROADCAST,
                **{"spark.sql.bucketing.coalesceBucketsInJoin.enabled": "true"},
            ),
        ):
            j = colocated_join(spark, "tb_l8", "tb_r4", on="doc_id")
            assert exchange_count(j) == 0
            got = sorted(map(tuple, j.collect()))
        want = sorted(map(tuple, docs.join(emb, "doc_id").collect()))
        assert got == want
    finally:
        _cleanup(spark, "tb_l8", "tb_r4")
