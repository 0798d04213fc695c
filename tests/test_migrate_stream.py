"""Canary migration stream (streaming/migrate_stream): per-batch matrix
parity with the batch operator, breaking rows, replay idempotence,
restart continuation."""

from pyspark.sql import functions as F

from schemasaurus_spark.schema.migration import migration_matrix
from schemasaurus_spark.streaming.migrate_stream import (
    migration_sink,
    migration_stream,
)

OLD = {
    "type": "object",
    "properties": {
        "doc_id": {"type": "integer", "required": True},
        "text": {"type": "string", "required": True, "maxLength": 10},
        "lang": {"type": "string", "enum": ["en", "de"]},
    },
}
NEW = {
    "type": "object",
    "properties": {
        "doc_id": {"type": "integer", "required": True},
        "text": {"type": "string", "required": True, "maxLength": 5},
        "lang": {"type": "string", "enum": ["en", "de", "fr"]},
    },
}

SCHEMA = "doc_id long, text string, lang string"

B1 = [(1, "ok", "en"), (2, "longtext", "en"), (3, "ok", "fr")]
B2 = [(4, "x" * 8, "de"), (5, "y", "zz")]


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _matrix_rows(spark, out_dir, batch_id):
    return {
        (r.valid_old, r.valid_new): r.n_docs
        for r in spark.read.parquet(f"{out_dir}/matrix")
        .where(F.col("batch_id") == batch_id)
        .collect()
    }


def _batch_matrix(spark, rows):
    return {
        (r.valid_old, r.valid_new): r.n_docs
        for r in migration_matrix(
            spark.createDataFrame(rows, SCHEMA), OLD, NEW
        ).collect()
    }


def test_stream_matches_batch_and_resumes(spark, tmp_path):
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    _write(spark, B1, in_dir)
    migration_stream(spark, in_dir, out_dir, OLD, NEW).awaitTermination(120)
    assert _matrix_rows(spark, out_dir, 0) == _batch_matrix(spark, B1)
    br = {
        (r.doc_id, r.code)
        for r in spark.read.parquet(f"{out_dir}/breaking")
        .where(F.col("batch_id") == 0)
        .collect()
    }
    assert br == {(2, "maxLength")}  # the regressed doc, its new-only error

    # restart with another drop: batch 1 lands, batch 0 untouched
    _write(spark, B2, in_dir)
    migration_stream(spark, in_dir, out_dir, OLD, NEW).awaitTermination(120)
    assert _matrix_rows(spark, out_dir, 1) == _batch_matrix(spark, B2)
    assert _matrix_rows(spark, out_dir, 0) == _batch_matrix(spark, B1)


def test_sink_replay_is_idempotent(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    sink = migration_sink(spark, out_dir, OLD, NEW)
    df = spark.createDataFrame(B1, SCHEMA)
    sink(df, 0)
    before_m = _matrix_rows(spark, out_dir, 0)
    before_b = spark.read.parquet(f"{out_dir}/breaking").count()
    sink(df, 0)  # at-least-once replay rewrites the partition
    assert _matrix_rows(spark, out_dir, 0) == before_m
    assert spark.read.parquet(f"{out_dir}/breaking").count() == before_b
