"""Structural layout fingerprinting / template detection for
interleaved text+media documents.

Templated web pages share their SPAN STRUCTURE even when every text
span differs (product pages: image, caption, text, image, caption...;
forum mirrors: the same alternation with different prose).  Content
dedup misses them by design — the text is genuinely different — but a
curation pipeline still wants to know when 40% of a crawl is one
template, both for sampling (cap per-template quotas) and for
extraction QA (a template with a million instances deserves a
hand-written extractor).  Two operators:

* ``layout_fingerprint`` — per physical row: the comma-joined kind
  sequence (``kinds_sig``), its md5 (``layout_fp`` — the join/group
  key at scale: fixed 32 bytes vs an unbounded signature string), and
  span counts.  Fully in-array, ZERO shuffles, duplicate-doc_id-safe.
* ``layout_template_groups`` — fingerprints reaching ``min_docs``
  distinct documents, with distinct-doc and physical-row counts.
  Two-phase (fp, doc_id) pre-dedup aggregate (map-side combined, no
  count(distinct) Expand); duplicate doc_ids count once (the
  media_reuse.py provenance convention).

Determinism: md5 of an ASCII signature is engine-portable (DuckDB
``md5()`` == Spark ``md5()``); empty/NULL spans fingerprint the empty
signature '' (documented, counted like any other template).

No reference counterpart: engine-original curation machinery for the
north-rule interleaved table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["layout_fingerprint", "layout_template_groups"]


def layout_fingerprint(
    df: DataFrame, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """``(doc_id, layout_fp, kinds_sig, n_spans, n_text, n_media)``
    per physical row."""
    spans = F.coalesce(F.col(spans_col), F.array())
    kinds = F.transform(spans, lambda s: s["kind"])
    sig = F.array_join(kinds, ",")
    return df.select(
        F.col(id_col),
        F.md5(sig).alias("layout_fp"),
        sig.alias("kinds_sig"),
        F.size(spans).cast("long").alias("n_spans"),
        F.size(F.filter(kinds, lambda k: k == "text")).cast("long").alias(
            "n_text"
        ),
        F.size(F.filter(kinds, lambda k: k != "text")).cast("long").alias(
            "n_media"
        ),
    )


def layout_template_groups(
    df: DataFrame,
    min_docs: int = 2,
    spans_col: str = "spans",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(layout_fp, kinds_sig, n_docs, n_rows)`` for every layout
    shared by at least ``min_docs`` distinct documents."""
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (1 would group the corpus)")
    fp = layout_fingerprint(df, spans_col, id_col).select(
        id_col, "layout_fp", "kinds_sig"
    )
    per_doc = fp.groupBy("layout_fp", "kinds_sig", id_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    return (
        per_doc.groupBy("layout_fp", "kinds_sig")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_c").cast("long").alias("n_rows"),
        )
        .where(F.col("n_docs") >= min_docs)
    )
