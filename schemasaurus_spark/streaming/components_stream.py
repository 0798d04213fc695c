"""Streaming near-dup component maintenance: a delta-log (LSM-style)
assignment maintained across micro-batches of pair edges — the continuous
twin of ``dedup.incremental_components``.

Why a delta log: the assignment is corpus-sized (one row per ever-seen
doc), so a sink that rewrites it per micro-batch does O(corpus) work per
ingest — exactly what the incremental operator exists to avoid.  Instead
the durable artifact is:

* ``base/upto=<n>/``    — a full (id, comp_id) snapshot folding every
  batch <= n, written only at COMPACTION time (every ``compact_every``
  batches; amortized O(corpus / compact_every) per batch);
* ``delta/batch_id=<n>/`` — batch n's effect alone: ``remap`` rows
  (old_comp -> new_comp for touched roots) and ``new`` rows (first-seen
  endpoints), both batch-sized.

``read_assignment`` folds the newest eligible base through the later
deltas — each fold step is one broadcast join + union, so the read plan
is corpus-scan × O(deltas-since-compaction) broadcast probes, never a
shuffle.  The min-id labeling makes every read equal, row-for-row, to a
from-scratch ``connected_components`` over all pairs seen so far
(asserted in tests).

Replay / restart semantics (the bloom/heavy_stream pattern — no state
store): batch b rebuilds its input state from artifacts with id < b
only — bases with ``upto < b`` and deltas with ``batch_id < b`` — so a
replayed batch never sees its own pre-crash output, recomputes the SAME
delta (everything below b is immutable), and the dynamic-partition
overwrite rewrites rather than duplicates.  Compacted-over bases and
deltas are deliberately NOT deleted: a replay of batch b needs the
pre-b view; vacuum them once the checkpoint's replay horizon has passed.

No reference counterpart (engine-original ingest machinery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException


def _is_missing_path(exc: AnalysisException) -> bool:
    """Only a genuinely absent path means 'no data yet'.  Any other read
    failure (transient IO/auth, corrupt footer) must FAIL the micro-batch:
    treating it as empty state would make components_sink diff the batch
    against nothing and overwrite the delta partition with wrong rows —
    silent log corruption instead of a retryable error."""
    cond = getattr(exc, "getErrorClass", lambda: None)()
    if cond and "PATH_NOT_FOUND" in cond:
        return True
    return "Path does not exist" in str(exc)

from schemasaurus_spark.operators.dedup import (
    _apply_component_remap,
    incremental_component_delta,
)

__all__ = ["read_assignment", "components_sink", "components_stream"]

_ASSIGN_DDL = "id long, comp_id long"


def _empty_assignment(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], _ASSIGN_DDL)


def read_assignment(
    spark: SparkSession, out_dir: str, before_batch: int | None = None
) -> DataFrame:
    """The current (id, comp_id) assignment: newest base snapshot folded
    through every later delta.  With ``before_batch=b``, the state as of
    batches < b only (what a replay of batch b must see): bases with
    ``upto < b``, deltas with ``batch_id < b``."""
    base = _empty_assignment(spark)
    start = -1
    try:
        bases = spark.read.parquet(f"{out_dir}/base")
        uptos = [
            r[0]
            for r in bases.select("upto").distinct().collect()
            if before_batch is None or r[0] < before_batch
        ]
        if uptos:
            start = max(uptos)
            base = bases.where(F.col("upto") == start).select("id", "comp_id")
    except AnalysisException as exc:
        if not _is_missing_path(exc):
            raise
        # no compaction yet
    try:
        deltas = spark.read.parquet(f"{out_dir}/delta")
    except AnalysisException as exc:
        if not _is_missing_path(exc):
            raise
        return base  # no batches yet
    deltas = deltas.where(F.col("batch_id") > start)
    if before_batch is not None:
        deltas = deltas.where(F.col("batch_id") < before_batch)
    batch_ids = sorted(r[0] for r in deltas.select("batch_id").distinct().collect())
    out = base
    for b in batch_ids:
        d = deltas.where(F.col("batch_id") == b)
        remap = d.where(F.col("kind") == "remap").select(
            F.col("x").alias("old_comp"), F.col("y").alias("new_comp")
        )
        new_rows = d.where(F.col("kind") == "new").select(
            F.col("x").alias("id"), F.col("y").alias("comp_id")
        )
        out = _apply_component_remap(out, remap).unionByName(new_rows)
    return out


def components_sink(
    spark: SparkSession,
    out_dir: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    compact_every: int | None = None,
):
    """Build the foreachBatch sink function (exposed for direct testing —
    call it twice with the same batch_id to prove replay idempotence)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_id = int(batch_id)
        pairs = batch_df.select(id_a, id_b).where(
            F.col(id_a).isNotNull() & F.col(id_b).isNotNull()
        )
        assignment = read_assignment(spark, out_dir, before_batch=batch_id)
        remap, new_rows = incremental_component_delta(assignment, pairs, id_a, id_b)
        delta = remap.select(
            F.lit("remap").alias("kind"),
            F.col("old_comp").alias("x"),
            F.col("new_comp").alias("y"),
        ).unionByName(
            new_rows.select(
                F.lit("new").alias("kind"),
                F.col("id").alias("x"),
                F.col("comp_id").alias("y"),
            )
        )
        delta.write.mode("overwrite").parquet(f"{out_dir}/delta/batch_id={batch_id}")
        if compact_every and (batch_id + 1) % compact_every == 0:
            # fold the PRE-batch view + this batch's in-memory delta: reading
            # read_assignment(before_batch=batch_id+1) instead would open the
            # base/upto=<batch_id> this very write targets on a replayed
            # batch (read-while-overwrite), and the delta frames are already
            # checkpointed locally
            folded = _apply_component_remap(
                read_assignment(spark, out_dir, before_batch=batch_id), remap
            ).unionByName(new_rows)
            folded.write.mode("overwrite").parquet(f"{out_dir}/base/upto={batch_id}")

    return sink


def components_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    compact_every: int | None = None,
    source_schema=None,
    trigger_available_now: bool = True,
):
    """Start the streaming component maintainer over a parquet directory of
    pair batches; returns the query.  ``read_assignment(spark, out_dir)``
    is the queryable product at any time."""
    if source_schema is None:
        source_schema = spark.read.parquet(input_dir).schema
    stream = spark.readStream.schema(source_schema).parquet(input_dir)
    writer = (
        stream.writeStream.foreachBatch(
            components_sink(spark, out_dir, id_a, id_b, compact_every)
        )
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
