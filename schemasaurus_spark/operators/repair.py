"""Span repair — the NORMALIZER counterpart for the north-rule
interleaved table: where plans/validation_job.py and
operators/span_integrity.py report what is wrong with a spans array,
this pass produces the repaired array plus a per-repair audit log, the
way the reference's normalizer (src/normalizer.js — defaults, coercion,
additional-property removal) mutates a JSON instance that its validator
would reject.  Cited parity: the normalizer's "coerce to what the
schema says" discipline (normalizer.js:16-44) applied to the span
struct's cross-field rules instead of scalar types.

Repair rules, in order (each logged; all deterministic):

1. ``kindFromRef`` — an image span pointing at ``media://aud/...`` (or
   audio at ``media://img/...``) takes the kind its ref says: the ref is
   the stronger evidence (it joins the media catalog; the kind string is
   free text).  ``media://missing/...`` refs are left alone — catalog
   membership is the referential check's verdict, not a repairable shape
   defect.
2. ``textDropped`` — a non-text span carrying text loses it (the
   validator's spanTextForbidden, repaired the only lossless way).
3. ``spanDropped`` — spans that cannot be repaired are removed, with the
   reason: ``badKind`` (kind NULL or outside text/image/audio/ref),
   ``textMissing`` (text span, NULL text — nothing to invent),
   ``refMissing`` (image/audio span, NULL ref — points nowhere).
4. ``offsetRepaired`` — offsets of the SURVIVING spans are canonicalized
   to the minimal non-decreasing-cost fix of the integrity invariants
   (strict order + no text overlap): with ``ext_j`` = occupied extent
   (``greatest(len(text), 1)`` for text, 1 otherwise) and ``cumext_i`` =
   prefix sum of extents,

       off'_i = cumext_i + max(0, max_{j<=i, off_j not NULL} (off_j - cumext_j))

   which is exactly the recurrence ``off'_i = max(off_i, off'_{i-1} +
   ext_{i-1})`` in closed form — every already-valid offset is KEPT
   (minimal change), violating/NULL/negative offsets are bumped to the
   first legal position.  Equal-form closure means the engine computes
   it as ONE in-array O(n) fold while a SQL oracle replays it as two
   plain window functions (prefix sum + running max) — no recursion.

Output: the input frame with ``spans`` replaced by the repaired array
and a ``repairs`` column, ``array<struct<span_idx int, code string,
detail string>>`` (span_idx = ORIGINAL index).  Documents with NULL
spans pass through with an empty log (nothing to repair in an absent
array — the schema walk owns requiredness).

Scale shape (10^12 docs): everything is in-array column expressions on
the spans array — transform / filter / one aggregate fold — so the pass
is a single projection scan with ZERO shuffles and no Python anywhere;
repaired-vs-original diffing is a positional zip of two same-length
arrays.  Per-doc cost is linear in spans-per-doc (the fold), which the
data model bounds small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALID_KINDS = ("text", "image", "audio", "ref")


def _fixed_kind(s: Column) -> Column:
    ref = s["media_ref"]
    return (
        F.when(
            (s["kind"] == "image") & ref.startswith("media://aud/"), F.lit("audio")
        )
        .when((s["kind"] == "audio") & ref.startswith("media://img/"), F.lit("image"))
        .otherwise(s["kind"])
    )


def _drop_reason(
    kind: Column, text: Column, ref: Column, cat: Column | None = None
) -> Column:
    """NULL when the span survives, else the reason string.  ``cat`` is
    the broadcast catalog-ref array (when referential repair is on): a
    media span whose ref is absent from the catalog points nowhere and
    is dropped as ``refDangling``."""
    out = (
        F.when(kind.isNull() | ~kind.isin(*VALID_KINDS), F.lit("badKind"))
        .when((kind == "text") & text.isNull(), F.lit("textMissing"))
        .when(kind.isin("image", "audio") & ref.isNull(), F.lit("refMissing"))
    )
    if cat is not None:
        from schemasaurus_spark.operators.arrays import sorted_array_contains

        # exact binary search (arrays.py): media catalogs GROW with the
        # corpus at 10^12 docs — the span_boilerplate scale lesson says
        # never probe a corpus-derived broadcast set linearly
        out = out.when(
            kind.isin("image", "audio") & ~sorted_array_contains(cat, ref),
            F.lit("refDangling"),
        )
    return out


def repair_spans(
    df: DataFrame,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    catalog: DataFrame | None = None,
    catalog_ref_col: str = "media_ref",
) -> DataFrame:
    """See module doc.  Returns ``df`` with ``spans`` repaired and a
    ``repairs`` audit column appended; other columns pass through.

    ``catalog`` (the broadcast-sized media dimension) turns on
    REFERENTIAL repair: media spans whose non-NULL ref is absent from
    the catalog drop as ``refDangling`` — the repair twin of the
    left-anti referential check.  The catalog rides as ONE sorted array
    on a single-row broadcast cross join (the centroid-array idiom), so
    membership is an in-array exact binary search and the pass stays
    zero-shuffle."""
    spans = F.col(spans_col)
    cat = None
    if catalog is not None:
        from pyspark.sql.functions import broadcast

        one = catalog.select(catalog_ref_col).distinct().agg(
            F.array_sort(F.collect_list(catalog_ref_col)).alias("_cat_refs")
        )
        df = df.join(broadcast(one))
        cat = F.col("_cat_refs")

    # stage 1+2 applied, original index and fields carried for the log
    staged = F.transform(
        spans,
        lambda s, i: F.struct(
            i.cast("int").alias("idx"),
            s["kind"].alias("kind0"),
            _fixed_kind(s).alias("kind"),
            F.when(_fixed_kind(s) == "text", s["text"]).alias("text"),
            s["text"].isNotNull().alias("had_text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("off0"),
        ),
    )
    kept = F.filter(
        staged,
        lambda s: _drop_reason(s["kind"], s["text"], s["media_ref"], cat).isNull(),
    )

    # offset canonicalization: one O(n) fold carrying (arr, cumext, gmax)
    def step(acc, s):
        g = F.coalesce(s["off0"].cast("long") - acc["cumext"], acc["gmax"])
        gmax = F.greatest(acc["gmax"], g)
        off = (acc["cumext"] + gmax).cast("int")
        ext = F.when(
            s["kind"] == "text", F.greatest(F.length(s["text"]), F.lit(1))
        ).otherwise(F.lit(1)).cast("long")
        row = F.struct(
            s["idx"].alias("idx"),
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["off0"].alias("off0"),
            off.alias("off"),
        )
        return F.struct(
            F.concat(acc["arr"], F.array(row)).alias("arr"),
            (acc["cumext"] + ext).alias("cumext"),
            gmax.alias("gmax"),
        )

    init = F.named_struct(
        F.lit("arr"),
        F.array().cast(
            "array<struct<idx:int,kind:string,text:string,"
            "media_ref:string,off0:int,off:int>>"
        ),
        F.lit("cumext"),
        F.lit(0).cast("long"),
        F.lit("gmax"),
        F.lit(0).cast("long"),
    )
    repaired = F.aggregate(kept, init, step, lambda acc: acc["arr"])

    def log_entry(idx, code, detail):
        return F.struct(
            idx.cast("int").alias("span_idx"),
            code.alias("code"),
            detail.alias("detail"),
        )

    kind_logs = F.transform(
        staged,
        lambda s: F.when(
            s["kind"] != s["kind0"],
            log_entry(
                s["idx"],
                F.lit("kindFromRef"),
                F.concat(s["kind0"], F.lit("->"), s["kind"]),
            ),
        ),
    )
    text_logs = F.transform(
        staged,
        lambda s: F.when(
            s["had_text"] & (s["kind"] != "text"),
            log_entry(s["idx"], F.lit("textDropped"), s["kind"]),
        ),
    )
    drop_logs = F.transform(
        staged,
        lambda s: F.when(
            _drop_reason(s["kind"], s["text"], s["media_ref"], cat).isNotNull(),
            log_entry(
                s["idx"],
                F.lit("spanDropped"),
                _drop_reason(s["kind"], s["text"], s["media_ref"], cat),
            ),
        ),
    )
    off_logs = F.transform(
        repaired,
        lambda s: F.when(
            s["off0"].isNull() | (s["off0"] != s["off"]),
            log_entry(
                s["idx"],
                F.lit("offsetRepaired"),
                F.concat(
                    F.coalesce(s["off0"].cast("string"), F.lit("NULL")),
                    F.lit("->"),
                    s["off"].cast("string"),
                ),
            ),
        ),
    )
    repairs = F.filter(
        F.concat(
            F.coalesce(kind_logs, F.array()),
            F.coalesce(text_logs, F.array()),
            F.coalesce(drop_logs, F.array()),
            F.coalesce(off_logs, F.array()),
        ),
        lambda x: x.isNotNull(),
    )

    out_spans = F.when(
        spans.isNotNull(),
        F.transform(
            repaired,
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["off"].alias("offset"),
            ),
        ),
    )
    others = [c for c in df.columns if c not in (spans_col, "_cat_refs")]
    return df.select(
        *others,
        out_spans.alias(spans_col),
        F.coalesce(repairs, F.array().cast(
            "array<struct<span_idx:int,code:string,detail:string>>"
        )).alias("repairs"),
    )
