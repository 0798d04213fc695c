"""Structured Streaming validation: continuously validate documents as
they land (file source here; swap in Kafka by changing the reader), with
the same compiled Column masks as the batch path.

Two sinks per micro-batch via ``foreachBatch``:
* violations appended under ``out/violations`` (full error records,
  guarded build — valid rows allocate nothing);
* running verdict metrics appended under ``out/verdict_log`` with the
  micro-batch id (the streaming analog of the per-partition verdicts).

Checkpointing is Spark's own (``checkpointLocation``), which composes with
the engine's unit-manifest resume for batch backfills: stream for the live
edge, ResumableValidation for history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schemasaurus_spark.plans.validation_job import ValidationJob


def validate_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    schema: dict | None = None,
    source_schema=None,
    trigger_available_now: bool = True,
):
    """Start the streaming validation query; returns the StreamingQuery.

    ``trigger_available_now=True`` drains what exists and stops (the
    testable mode; also the backfill mode); ``False`` runs continuously.
    """
    job = ValidationJob(schema)
    if source_schema is None:
        source_schema = spark.read.parquet(input_dir).schema

    stream = spark.readStream.schema(source_schema).parquet(input_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        validated = job.validated(batch_df)
        job.violations(validated).write.mode("append").parquet(
            f"{out_dir}/violations"
        )
        (
            job.verdicts(job.counted(batch_df))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(f"{out_dir}/verdict_log")
        )

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
