"""Referential-integrity checks: every non-null foreign ref must exist in a
dimension table.  The dimension (media catalog, ~1k rows) is broadcast, so
the check is a shuffle-free broadcast LEFT ANTI join — each executor streams
its partitions against an in-memory hash set (SURVEY.md §2D)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def dangling_refs(
    facts: DataFrame, ref_col: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """Rows of *facts* whose ``ref_col`` is non-null and absent from *dim*."""
    return facts.where(F.col(ref_col).isNotNull()).join(
        broadcast(dim.select(F.col(dim_key).alias(ref_col)).distinct()),
        on=ref_col,
        how="left_anti",
    )


def dangling_media_refs(documents: DataFrame, media_catalog: DataFrame) -> DataFrame:
    """North-rule form: explode spans, check media_ref against the catalog.

    Returns (doc_id, span_idx, media_ref) violation rows.
    """
    refs = documents.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).select(
        "doc_id", "span_idx", F.col("span.media_ref").alias("media_ref")
    ).where(F.col("media_ref").isNotNull())
    return refs.join(
        broadcast(media_catalog.select("media_ref").distinct()),
        on="media_ref",
        how="left_anti",
    ).select("doc_id", "span_idx", "media_ref")
