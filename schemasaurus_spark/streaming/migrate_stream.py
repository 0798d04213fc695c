"""Canary schema-migration monitoring: every micro-batch validated under
BOTH schema versions — the streaming twin of ``schema/migration.py``.

Rolling a schema change out against live ingest is the moment migration
impact stops being a one-shot question: the batch CLI answers "what would
break in the corpus I have", this stream answers "what is breaking in the
traffic I am receiving" — per micro-batch, the (valid_old, valid_new)
transition counts plus the regressed docs' new-schema violation rows, so
a canary rollout can be aborted on the first batch whose breaking count
is nonzero (or above a tolerated rate).

Cost: the dual validation is the SAME single projection as the batch
operator (both compiled predicate sets in one Project over the
micro-batch — no second pass), followed by one <=4-row aggregate; the
breaking-row explode touches only regressed docs.  The micro-batch is
persisted across the two actions (matrix + breaking) so foreachBatch's
per-action source re-read is avoided.

Sinks are replay-idempotent (the house pattern): ``matrix/batch_id=<n>``
and ``breaking/batch_id=<n>`` are dynamic-partition overwrites keyed by
batch id — at-least-once replays rewrite rather than duplicate.

No reference counterpart (the reference validates one instance at a
time; this is the engine-original continuous tier of its semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schemasaurus_spark.schema.migration import migration_impact

__all__ = ["migration_sink", "migration_stream"]


def migration_sink(
    spark: SparkSession,
    out_dir: str,
    old_schema: dict,
    new_schema: dict,
    id_col: str = "doc_id",
):
    """Build the foreachBatch sink (exposed for direct testing — call it
    twice with one batch_id to prove replay idempotence)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            impact = migration_impact(batch_df, old_schema, new_schema)
            (
                impact.groupBy("valid_old", "valid_new")
                .agg(F.count(F.lit(1)).alias("n_docs"))
                .write.mode("overwrite")
                .parquet(f"{out_dir}/matrix/batch_id={int(batch_id)}")
            )
            (
                impact.where(F.col("valid_old") & ~F.col("valid_new"))
                .select(id_col, F.explode("errors_new").alias("err"))
                .select(
                    id_col,
                    F.col("err.code").alias("code"),
                    F.col("err.path").alias("json_pointer"),
                    F.col("err.value").alias("value"),
                    F.col("err.arg").alias("arg"),
                )
                .write.mode("overwrite")
                .parquet(f"{out_dir}/breaking/batch_id={int(batch_id)}")
            )
        finally:
            batch_df.unpersist()

    return sink


def migration_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    old_schema: dict,
    new_schema: dict,
    id_col: str = "doc_id",
    source_schema=None,
    trigger_available_now: bool = True,
):
    """Start the canary monitor over a parquet directory stream; returns
    the query.  Read ``{out}/matrix`` / ``{out}/breaking`` (partition
    column ``batch_id``) for the rollout dashboard / abort gate."""
    if source_schema is None:
        source_schema = spark.read.parquet(input_dir).schema
    stream = spark.readStream.schema(source_schema).parquet(input_dir)
    writer = (
        stream.writeStream.foreachBatch(
            migration_sink(spark, out_dir, old_schema, new_schema, id_col)
        )
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
