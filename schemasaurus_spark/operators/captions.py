"""Caption-context mining over interleaved text+media documents — the
image/audio-text pair extraction step of multimodal curation.

Interleaved-corpus recipes (public formulations: MMC4, OBELICS) turn
web documents into (media, caption-candidate) training pairs by pairing
each media element with its nearest surrounding text.  This operator
emits one row per in-document media span with the indices of the nearest
preceding and following text spans and a deterministic caption pick:

* prefer the FOLLOWING text span when it exists and is at least as close
  as the preceding one (the "caption follows the image" web convention;
  equidistant → following — pinned by test and oracle);
* fall back to the preceding span, else NULL (media with no text context
  is KEPT with a NULL caption so downstream can count uncaptionable
  media instead of silently losing it).

Scale shape: ZERO shuffles.  The nearest-text search runs entirely
in-array (per media index, ``array_max/array_min`` over the filtered
text-index list — O(n_spans²) per document with n_spans bounded small by
the document model, and no explode+window, which would shuffle every
span on doc_id and be WRONG on duplicate doc_ids — interleave.py's
documented trap).  The single ``explode`` at the end is a map-side
generator: one projection pass over the corpus, output sized by the
number of media spans.

The contract query (``northrule_caption_contexts``) hash-matches a
DuckDB replay that does use per-PHYSICAL-row windows (rn uniquifier) —
the window formulation is the natural SQL spelling, the in-array one is
the scale-correct Spark spelling; hash equality proves they agree.

No reference counterpart (schemasaurus validates span documents —
SURVEY.md §2E; this is the repo's multimodal curation surface next to
interleave.py / media.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["caption_contexts"]

_MEDIA_KINDS = ("image", "audio")


def caption_contexts(
    df: DataFrame, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """One row per media span (kind image/audio, non-NULL media_ref):
    ``(doc_id, span_idx, kind, media_ref, prev_text_idx, next_text_idx,
    caption_src, caption, caption_len)``."""
    spans = F.coalesce(F.col(spans_col), F.array())
    kinds = F.transform(spans, lambda s: s["kind"])
    texts = F.transform(spans, lambda s: s["text"])
    n = F.size(spans)
    idx_seq = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    text_idx = F.filter(idx_seq, lambda ix: F.get(kinds, ix) == "text")

    def media_row(ix):
        prev_ti = F.array_max(F.filter(text_idx, lambda x: x < ix))
        next_ti = F.array_min(F.filter(text_idx, lambda x: x > ix))
        src = (
            F.when(
                next_ti.isNotNull()
                & (prev_ti.isNull() | ((next_ti - ix) <= (ix - prev_ti))),
                F.lit("next"),
            )
            .when(prev_ti.isNotNull(), F.lit("prev"))
            .otherwise(F.lit(None).cast("string"))
        )
        chosen = F.when(src == "next", next_ti).when(src == "prev", prev_ti)
        caption = F.get(texts, chosen)
        return F.struct(
            ix.cast("int").alias("span_idx"),
            F.get(kinds, ix).alias("kind"),
            F.get(spans, ix)["media_ref"].alias("media_ref"),
            prev_ti.cast("int").alias("prev_text_idx"),
            next_ti.cast("int").alias("next_text_idx"),
            src.alias("caption_src"),
            caption.alias("caption"),
            F.coalesce(F.length(caption).cast("long"), F.lit(0).cast("long")).alias(
                "caption_len"
            ),
        )

    media = F.filter(
        F.transform(idx_seq, media_row),
        lambda r: r["kind"].isin(*_MEDIA_KINDS) & r["media_ref"].isNotNull(),
    )
    return df.select(F.col(id_col), F.explode(media).alias("_m")).select(
        id_col, "_m.*"
    )
