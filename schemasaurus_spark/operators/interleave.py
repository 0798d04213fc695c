"""Per-document interleave profile for text+media span documents.

The structural fingerprint of an interleaved document — how text and
media actually alternate — as one row per document: span counts by kind,
modality switch count, longest text / non-text runs, boundary kinds.
The data-selection signal multimodal curation filters on ("drop docs
that are one giant text block with a media footer", "keep docs with
genuine alternation"), and the summary counterpart of
``span_integrity``'s violation rows.

Scale shape: ZERO shuffles — every metric is an in-array expression over
the ``spans`` column (`F.filter` counts, an `F.aggregate` run-length
fold with a (current, max) struct accumulator, adjacent-kind switch
counting over an index `F.sequence`), so the whole profile is one
embarrassingly-parallel projection pass; no explode, no per-doc window
(explode+window would shuffle every span on doc_id — and duplicate
doc_ids in real corpora make that window WRONG, not just slow).

Oracle note (contract `northrule_interleave_profile`): the SQL replay
must partition its windows per PHYSICAL row (`row_number() OVER ()`
uniquifier), because generated corpora contain duplicate doc_ids —
same trap span_integrity's oracle documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interleave_profile", "render_training_text"]


def _max_run(kinds: Column, want_text: bool) -> Column:
    """Longest consecutive run of text (or non-text) kinds: a single
    left fold with a (current_run, max_run) struct accumulator."""

    def merge(acc: Column, k: Column) -> Column:
        hit = (k == "text") if want_text else (k != "text")
        cur2 = F.when(hit, acc["cur"] + 1).otherwise(F.lit(0))
        return F.struct(
            cur2.alias("cur"), F.greatest(acc["mx"], cur2).alias("mx")
        )

    init = F.struct(F.lit(0).alias("cur"), F.lit(0).alias("mx"))
    return F.aggregate(kinds, init, merge, lambda acc: acc["mx"])


def interleave_profile(
    df: DataFrame, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """One row per document (physical row):
    ``(doc_id, n_spans, n_text, n_image, n_audio, n_ref, n_media_refs,
    n_switches, max_text_run, max_nontext_run, first_kind, last_kind)``.
    NULL/empty spans yield zero counts and NULL boundary kinds."""
    spans = F.coalesce(F.col(spans_col), F.array())
    kinds = F.transform(spans, lambda s: s["kind"])
    n = F.size(spans)

    def kind_count(k: str) -> Column:
        return F.size(F.filter(kinds, lambda x: x == k)).cast("long")

    switches = F.when(
        n > 1,
        F.aggregate(
            F.sequence(F.lit(1), n - 1),
            F.lit(0),
            lambda acc, ix: acc
            + F.when(F.get(kinds, ix) != F.get(kinds, ix - 1), 1).otherwise(0),
        ),
    ).otherwise(F.lit(0))

    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_spans"),
        kind_count("text").alias("n_text"),
        kind_count("image").alias("n_image"),
        kind_count("audio").alias("n_audio"),
        kind_count("ref").alias("n_ref"),
        F.size(F.filter(spans, lambda s: s["media_ref"].isNotNull()))
        .cast("long")
        .alias("n_media_refs"),
        switches.cast("long").alias("n_switches"),
        _max_run(kinds, True).cast("long").alias("max_text_run"),
        _max_run(kinds, False).cast("long").alias("max_nontext_run"),
        F.get(kinds, 0).alias("first_kind"),
        F.get(kinds, n - 1).alias("last_kind"),
    )


def render_training_text(
    df: DataFrame,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    separator: str = "\n",
) -> DataFrame:
    """Serialize each interleaved document into ONE training string.

    The deterministic flatten every multimodal training loader needs:
    spans in array order, text spans contribute their text (NULL text
    renders as the empty piece so span alignment survives), every
    non-text span contributes the placeholder token ``<|kind|>``
    (``<|image|>`` / ``<|audio|>`` / ``<|ref|>`` — the LLaVA-style
    sentinel the tokenizer later maps to patch embeddings), pieces
    joined by ``separator``.  Alongside the string: the media fetch
    manifest (non-NULL media_refs, comma-joined, in placeholder order —
    what the loader resolves against the media store), exact char
    accounting, and the placeholder count.

    Output per PHYSICAL row (duplicate doc_ids stay separate rows):
    ``(doc_id, training_text, media_refs_csv, n_chars, n_text_chars,
    n_placeholders)``.  Docs with NULL/empty spans are untrainable and
    render as NULL training_text with zero counts ('' manifest).

    Scale shape: ZERO shuffles — the whole pass is in-array
    ``transform`` + ``array_join`` + ``filter`` expressions inside one
    embarrassingly-parallel projection scan (no explode, no window;
    explode+window would shuffle every span AND break on duplicate
    doc_ids).  At 10^12 docs this is a pure map stage gated only by
    scan bandwidth.

    No reference counterpart: schemasaurus validates/normalizes span
    documents but never serializes them for training; this operator is
    engine-original plumbing for the interleaved north-rule table.
    """
    spans = F.coalesce(F.col(spans_col), F.array())
    n = F.size(spans)

    pieces = F.transform(
        spans,
        lambda s: F.when(
            s["kind"] == "text", F.coalesce(s["text"], F.lit(""))
        ).otherwise(F.concat(F.lit("<|"), s["kind"], F.lit("|>"))),
    )
    rendered = F.when(n > 0, F.array_join(pieces, separator))
    refs = F.filter(
        F.transform(spans, lambda s: s["media_ref"]), lambda r: r.isNotNull()
    )
    text_chars = F.aggregate(
        spans,
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.when(
            s["kind"] == "text", F.length(F.coalesce(s["text"], F.lit("")))
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    return df.select(
        F.col(id_col),
        rendered.alias("training_text"),
        F.array_join(refs, ",").alias("media_refs_csv"),
        F.coalesce(F.length(rendered).cast("long"), F.lit(0).cast("long")).alias(
            "n_chars"
        ),
        text_chars.alias("n_text_chars"),
        F.size(F.filter(spans, lambda s: s["kind"] != "text"))
        .cast("long")
        .alias("n_placeholders"),
    )
