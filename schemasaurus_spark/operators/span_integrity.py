"""Cross-span structural integrity checks over the interleaved spans array.

The per-span JSON-schema walk (plans/validation_job.py, mirroring the
reference's compiled-iterator keyword checks, /root/reference/src/
v4validator.js) validates each span IN ISOLATION; these checks validate
the SEQUENCE — the structural invariants an interleaved text+media
document must satisfy that no per-element keyword can express:

* ``spanOrder``          — offsets strictly increasing between adjacent spans
* ``spanOverlap``        — a text span's [offset, offset+len(text)) extent
                           must not run into the next span's offset
* ``spanTextRequired``   — kind='text' implies a non-NULL text
* ``spanTextForbidden``  — non-text kinds must not carry text
* ``spanMediaRefRequired``— image/audio spans need a media_ref
* ``spanRefKindMismatch``— an image span pointing at media://aud/... (or
                           audio at media://img/...)

Violation rows mirror the north-rule contract shape:
(doc_id, span_idx, code, path, value, arg) with JSON-pointer paths.

Scale shape: one projection scan, zero shuffles.  Adjacent-span access is
``F.get(spans, i-1)`` inside a ``transform`` lambda — no explode-then-
window (which would shuffle on doc_id and materialize every span as a
row); the per-span violation arrays are flattened, NULL-filtered and
exploded, so only actual violations ever become rows.  NULL fields never
fire a sequencing check (the per-span schema walk owns missing/typed
checks); the two adjacent-pair codes are mutually exclusive by
construction (``spanOverlap`` requires the pair to be correctly ordered)
so one broken pair yields one code, not a cascade.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violations_for(spans: Column, s: Column, i: Column) -> Column:
    """Array of violation structs (possibly NULL entries) for span i."""
    prev = F.get(spans, i - 1)  # NULL at i == 0 (F.get is 0-based, safe OOB)
    idx = i.cast("int")
    pstr = i.cast("string")

    def v(cond: Column, code: str, leaf: str, value: Column, arg: Column) -> Column:
        return F.when(
            cond,
            F.struct(
                idx.alias("span_idx"),
                F.lit(code).alias("code"),
                F.concat(F.lit("/spans/"), pstr, F.lit(leaf)).alias("path"),
                value.cast("string").alias("value"),
                arg.cast("string").alias("arg"),
            ),
        )

    off, poff = s["offset"], prev["offset"]
    ordered = off > poff  # NULL-safe: NULL offsets never fire either pair check
    prev_end = poff + F.length(prev["text"])
    media_kind = s["kind"].isin("image", "audio")
    ref = s["media_ref"]
    mismatch = (
        (s["kind"] == "image") & ref.startswith("media://aud/")
    ) | ((s["kind"] == "audio") & ref.startswith("media://img/"))

    return F.array(
        v((i > 0) & (off <= poff), "spanOrder", "/offset", off, poff),
        v(
            (i > 0) & ordered & (prev["kind"] == "text") & (prev_end > off),
            "spanOverlap",
            "/offset",
            off,
            prev_end,
        ),
        v(
            (s["kind"] == "text") & s["text"].isNull(),
            "spanTextRequired",
            "/text",
            F.lit(None),
            F.lit(None),
        ),
        v(
            (s["kind"] != "text") & s["text"].isNotNull(),
            "spanTextForbidden",
            "/text",
            s["text"],
            s["kind"],
        ),
        v(
            media_kind & ref.isNull(),
            "spanMediaRefRequired",
            "/media_ref",
            F.lit(None),
            F.lit(None),
        ),
        v(mismatch, "spanRefKindMismatch", "/media_ref", ref, s["kind"]),
    )


def span_integrity_violations(
    docs: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """Sequence-level violation rows for every document.

    Returns (doc_id, span_idx int, code, path, value, arg); empty for a
    structurally clean corpus.  One scan, no shuffle.
    """
    spans = F.col(spans_col)
    per_span = F.transform(spans, lambda s, i: _violations_for(spans, s, i))
    viols = F.filter(F.flatten(per_span), lambda x: x.isNotNull())
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(viols).alias("v"))
        .select("doc_id", "v.span_idx", "v.code", "v.path", "v.value", "v.arg")
    )


def plant_sequence_faults(docs: DataFrame, seed: int = 13) -> DataFrame:
    """Deterministically corrupt ~6/7 of documents with exactly one fault
    class each (keyed on xxhash64(seed, doc_id)), so every check fires on
    a generated corpus whose generator emits only well-ordered spans.

    Fault classes by h % 7:
      0: spans[1].offset := spans[0].offset            (spanOrder tie)
      1: spans[1].offset := spans[0].offset + 1        (spanOverlap when
         span 0 is a text span longer than 1 char)
      2: NULL the text of every text span              (spanTextRequired)
      3: put 'stray' text on every ref span            (spanTextForbidden)
      4: NULL media_ref on image/audio spans           (spanMediaRefRequired)
      5: swap media://img/ <-> media://aud/ prefixes   (spanRefKindMismatch)
      6: untouched
    All in-plan column transforms — usable on any docs frame at any scale.
    """
    h = F.pmod(F.xxhash64(F.lit(seed), F.col("doc_id")), F.lit(7))
    spans = F.col("spans")

    def mutate(s: Column, i: Column) -> Column:
        first = F.get(spans, 0)
        off = (
            F.when((h == 0) & (i == 1), first["offset"])
            .when((h == 1) & (i == 1), first["offset"] + 1)
            .otherwise(s["offset"])
        )
        text = (
            F.when((h == 2) & (s["kind"] == "text"), F.lit(None).cast("string"))
            .when((h == 3) & (s["kind"] == "ref"), F.lit("stray"))
            .otherwise(s["text"])
        )
        ref = (
            F.when(
                (h == 4) & s["kind"].isin("image", "audio"),
                F.lit(None).cast("string"),
            )
            .when(
                (h == 5) & s["media_ref"].startswith("media://img/"),
                F.concat(F.lit("media://aud/"), F.substring(s["media_ref"], 13, 1 << 20)),
            )
            .when(
                (h == 5) & s["media_ref"].startswith("media://aud/"),
                F.concat(F.lit("media://img/"), F.substring(s["media_ref"], 13, 1 << 20)),
            )
            .otherwise(s["media_ref"])
        )
        return F.struct(
            s["kind"].alias("kind"),
            text.alias("text"),
            ref.alias("media_ref"),
            off.alias("offset"),
        )

    return docs.withColumn("spans", F.transform(spans, mutate))
