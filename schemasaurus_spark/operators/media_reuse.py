"""Media-ref reuse profile over interleaved text+media documents.

At 100 TB the media store is the expensive half of a multimodal corpus:
every distinct ``media_ref`` must be fetched, decoded and embedded, and
hot assets (site logos, stock photos, tracking pixels) are referenced
from millions of documents.  This operator measures exactly that
fan-in, per ref: how many span references exist, how many distinct
documents carry one, the ref's share of all media traffic, and (when
the catalog is passed) whether the ref resolves at all — the
prioritized fetch/dedup worklist for the media pipeline, and the
aggregate twin of the row-level referential check
(``referential.py``'s broadcast left-anti).

Scale shape — two keyed, map-side-combined shuffles, no distinct
EXPAND, no global window:

1. ``groupBy(media_ref, doc_id).count()`` — partial aggregation
   collapses each task's repeats before the exchange, so a hot ref
   repeated inside documents never ships raw rows;
2. ``groupBy(media_ref)`` over that — ``sum`` -> n_refs,
   ``count`` -> n_docs (exact distinct docs without
   ``count(distinct)``'s expand, because step 1 already deduped).

The grand total for share_bp comes from a 1-row aggregate broadcast
back over the catalog-sized per-ref table (the centroid-array idiom) —
NEVER a partition-less window, which would funnel every distinct ref
through one task.  The catalog join is an explicit ``broadcast()``
(the catalog is the small dimension by construction).  share_bp is
exact integer basis points (n_refs * 10000 DIV total), so any engine
replays it bit-for-bit.

Duplicate doc_ids: n_docs counts distinct doc_id VALUES (two physical
rows with the same id are one logical document here — the opposite
convention from the row-local profiles, chosen because fan-in measures
logical provenance; documented so oracles match).

No reference counterpart: schemasaurus has no cross-document
aggregation at all; this is engine-original curation machinery for the
north-rule interleaved table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["media_reuse_profile", "media_orphans"]


def media_reuse_profile(
    df: DataFrame,
    catalog: DataFrame | None = None,
    spans_col: str = "spans",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per distinct non-NULL media_ref:

    ``(media_ref, n_refs, n_docs, share_bp[, media_kind, in_catalog])``

    * ``n_refs``: total span references across the corpus (long).
    * ``n_docs``: distinct documents (by id) referencing it (long).
    * ``share_bp``: n_refs / total-refs in exact basis points (long).
    * with ``catalog``: ``media_kind`` from the broadcast catalog (NULL
      when dangling) and ``in_catalog`` 0/1 (long).
    """
    refs = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.transform(
                    F.coalesce(F.col(spans_col), F.array()),
                    lambda s: s["media_ref"],
                ),
                lambda r: r.isNotNull(),
            )
        ).alias("media_ref"),
    )
    per_doc = refs.groupBy("media_ref", "doc_id").agg(
        F.count(F.lit(1)).alias("_c")
    )
    per_ref = per_doc.groupBy("media_ref").agg(
        F.sum("_c").cast("long").alias("n_refs"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    total = per_ref.agg(F.sum("n_refs").alias("_tot"))
    out = per_ref.crossJoin(F.broadcast(total)).select(
        "media_ref",
        "n_refs",
        "n_docs",
        (
            (
                (F.col("n_refs") * 10000)
                - ((F.col("n_refs") * 10000) % F.col("_tot"))
            )
            / F.col("_tot")
        )
        .cast("long")
        .alias("share_bp"),
    )
    if catalog is not None:
        cat = F.broadcast(
            catalog.select(
                F.col("media_ref").alias("_cref"),
                F.col("media_kind").alias("media_kind"),
            )
        )
        out = (
            out.join(cat, out["media_ref"] == cat["_cref"], "left")
            .drop("_cref")
            .withColumn(
                "in_catalog", F.col("media_kind").isNotNull().cast("long")
            )
        )
    return out


def media_orphans(
    catalog: DataFrame,
    df: DataFrame,
    spans_col: str = "spans",
    id_col: str = "doc_id",
) -> DataFrame:
    """Catalog assets no document references — the media-store
    garbage-collection worklist (reverse of the dangling-ref check:
    there a span points at a missing asset; here an asset waits for
    spans that never come, holding reclaimable bytes).

    Returns the orphaned catalog rows (all catalog columns) — run
    ``agg(sum(bytes))`` on the result for the reclaim total.

    Scale shape: the corpus side collapses FIRST to distinct refs via a
    map-side-combined ``groupBy`` (one keyed shuffle over span refs —
    never ship raw spans to a join), then the catalog-sized left-anti
    join runs over two small sides (AQE broadcasts the distinct-ref
    side).  Joining the raw exploded refs against the catalog would
    shuffle the whole corpus for nothing.
    """
    refs = (
        df.select(
            F.explode(
                F.filter(
                    F.transform(
                        F.coalesce(F.col(spans_col), F.array()),
                        lambda s: s["media_ref"],
                    ),
                    lambda r: r.isNotNull(),
                )
            ).alias("media_ref")
        )
        .groupBy("media_ref")
        .agg(F.count(F.lit(1)).alias("_c"))
        .select("media_ref")
    )
    return catalog.join(refs, "media_ref", "left_anti")
