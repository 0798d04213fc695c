"""Cross-document repeated-SPAN detection and removal for interleaved
text+media documents.

The span-level twin of ``boilerplate.py``'s line filter: interleaved
web documents repeat whole text spans verbatim across pages (nav bars,
cookie banners, footer blurbs, repeated captions), and a training
pipeline wants them gone while the media spans and genuine prose stay
put.  Two operators:

* ``span_boilerplate_profile`` — the normalized text spans whose
  distinct-document frequency reaches ``min_docs``.  Normalization
  matches boilerplate.py exactly (``lower(regexp_replace(trim(text),
  '\\s+', ' '))``; spans normalizing to '' are never counted).
  Distinct-doc counting is the two-phase (norm, doc_id) pre-dedup
  aggregate — both shuffles map-side combined, no count(distinct)
  Expand.  Duplicate doc_ids count as ONE logical document (provenance
  convention, same as media_reuse.py).
* ``remove_boilerplate_spans`` — drops text spans whose normalized form
  is in the profile.  The profile rides as ONE sorted array on a
  single-row broadcast cross join (the centroid-array idiom), so the
  removal pass is an in-array exact binary search
  (``sorted_array_contains``) — ZERO shuffles over the corpus,
  row-local, duplicate-doc_id-safe.  Surviving spans KEEP their
  original offsets: removal is an editorial cut, not a re-typeset — the
  document's coordinate system still refers to the original rendering,
  and a subsequence of strictly-increasing offsets is still strictly
  increasing, so span_integrity's order invariant survives by
  construction.

Scale note: the profile is vocabulary-sized (only spans repeated across
``min_docs``+ documents survive) but it GROWS with the corpus on
repetitive text (measured on the generated corpus: 584 -> 1,456 ->
5,894 norms at 100k/200k/400k docs), so per-span membership must not
be linear in the profile: ``sorted_array_contains`` runs an exact
binary search as a fixed-depth fold (O(log profile) per span,
whole-stage-codegen'd, still zero-shuffle).  A corpus whose profile
outgrows broadcast entirely (min_docs=2 over 10^12 docs) should raise
min_docs — the operator asserts nothing silently (the caller sees the
profile row count).

No reference counterpart: engine-original curation machinery for the
north-rule interleaved table (SURVEY §2E).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from schemasaurus_spark.operators.arrays import sorted_array_contains

__all__ = [
    "span_norm",
    "sorted_array_contains",
    "span_boilerplate_profile",
    "remove_boilerplate_spans",
]

def span_norm(text: Column) -> Column:
    """boilerplate.py's normalized form: case/whitespace folded."""
    return F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))


def span_boilerplate_profile(
    df: DataFrame,
    min_docs: int = 2,
    spans_col: str = "spans",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(span_norm, n_docs, n_spans)`` for every normalized text span
    reaching ``min_docs`` distinct documents."""
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (1 would profile the corpus)")
    norms = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.transform(
                    F.filter(
                        F.coalesce(F.col(spans_col), F.array()),
                        lambda s: s["kind"] == "text",
                    ),
                    lambda s: span_norm(s["text"]),
                ),
                lambda t: t.isNotNull() & (t != ""),
            )
        ).alias("span_norm"),
    )
    per_doc = norms.groupBy("span_norm", "doc_id").agg(
        F.count(F.lit(1)).alias("_c")
    )
    return (
        per_doc.groupBy("span_norm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_c").cast("long").alias("n_spans"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate_spans(
    df: DataFrame,
    profile: DataFrame,
    spans_col: str = "spans",
    id_col: str = "doc_id",
) -> DataFrame:
    """``df`` with boilerplate text spans removed (original offsets
    kept) and ``n_boilerplate_removed`` appended; NULL spans arrays
    pass through NULL with 0 removed."""
    one = profile.agg(
        F.array_sort(F.collect_list("span_norm")).alias("_bp_norms")
    )
    out = df.join(F.broadcast(one))
    spans = F.col(spans_col)
    # O(log profile) exact binary search per span — see
    # sorted_array_contains: linear array_contains turned removal into
    # O(spans x profile) once the profile grew with the corpus
    is_bp = lambda s: (s["kind"] == "text") & sorted_array_contains(  # noqa: E731
        F.col("_bp_norms"), span_norm(s["text"])
    )
    kept = F.filter(spans, lambda s: ~F.coalesce(is_bp(s), F.lit(False)))
    removed = F.size(spans) - F.size(kept)
    return out.select(
        *[c for c in df.columns if c != spans_col],
        kept.alias(spans_col),
        F.coalesce(removed.cast("long"), F.lit(0).cast("long")).alias(
            "n_boilerplate_removed"
        ),
    )
