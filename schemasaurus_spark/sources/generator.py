"""Deterministic, fully distributed synthetic generator for the north-rule
input table (BASELINE.json input_hint):

    documents(doc_id string,
              spans array<struct<kind string, text string,
                                 media_ref string, offset int>>)

plus the broadcastable ``media_catalog(media_ref, media_kind, bytes)``
dimension.  Everything is derived from ``spark.range`` + ``xxhash64`` so the
same (n_docs, seed) pair produces identical bytes at any parallelism and any
scale — no driver-side data, no RNG state, no collect.  The generator itself
is a scale test: it runs as a single whole-stage-codegen'd projection.

Shape knobs follow FIXTURES.md §1: ~20% of doc_ids share a hot prefix (to
exercise salting), ~0.1% duplicate ids (uniqueness fixtures), ~1% of text
spans violate pattern/length constraints, ~0.5% of media refs dangle
(referential fixtures), offsets strictly increase within a doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_MEDIA = 1000  # catalog size; small enough to broadcast

_WORDS = (
    "the quick brown fox jumps over lazy dog spark schema span media "
    "valid data table quality check drift batch column vector hash"
).split()


def _h(seed: int, *cols):
    """Deterministic 64-bit hash stream; nonneg."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def generate_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    max_spans: int = 16,
    max_text_len: int = 256,
    partitions: int | None = None,
) -> DataFrame:
    """Build the interleaved text+media documents table.

    Columns: doc_id string, spans array<struct<kind,text,media_ref,offset>>.
    """
    df = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")

    # ~20% hot prefix (same "hot-" shard) + ~0.1% exact duplicate ids
    dup = (_h(seed + 1, i) % 1000 == 0) & (i > 0)
    base = F.when(dup, i - 1).otherwise(i)
    hot = _h(seed + 2, base) % 5 == 0
    doc_id = F.when(hot, F.concat(F.lit("hot-"), F.lpad(base.cast("string"), 10, "0"))).otherwise(
        F.concat(F.lit("doc-"), F.lpad(base.cast("string"), 10, "0"))
    )

    n_spans = (_h(seed + 3, i) % max_spans + 1).cast("int")

    # one span per sequence index k, all derived from (seed, doc index, k)
    k = F.lit(None)  # placeholder for readability; real k is the lambda arg

    def span(kx):
        hk = F.abs(F.xxhash64(F.lit(seed + 4), i, kx))
        kind_idx = hk % 100
        # interleaved kinds: 55% text, 20% image, 15% audio, 10% ref
        kind = (
            F.when(kind_idx < 55, "text")
            .when(kind_idx < 75, "image")
            .when(kind_idx < 90, "audio")
            .otherwise("ref")
        )
        # text: word soup with deterministic length; ~1% violate maxLength
        n_words = (hk % 37) + 1
        violate_len = (hk % 97) == 0
        words = F.array(*[F.lit(w) for w in _WORDS])
        text_body = F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.when(violate_len, n_words + 200).otherwise(n_words)),
                lambda j: F.element_at(words, (F.abs(F.xxhash64(F.lit(seed + 5), i, kx, j)) % len(_WORDS) + 1).cast("int")),
            ),
            " ",
        )
        text = F.when(kind == "text", F.substring(text_body, 1, max_text_len + 200)).otherwise(F.lit(None).cast("string"))
        # media_ref: uri into the catalog; ~0.5% dangling; ~1% malformed (format violation)
        media_id = hk % N_MEDIA
        dangling = (hk % 211) == 0
        malformed = (hk % 199) == 0
        ref_kind = F.when(kind == "image", F.lit("img")).otherwise(F.lit("aud"))
        media_ref = (
            F.when(
                kind.isin("image", "audio"),
                F.when(malformed, F.lit("not a uri"))
                .when(dangling, F.concat(F.lit("media://missing/"), media_id.cast("string")))
                .otherwise(F.concat(F.lit("media://"), ref_kind, F.lit("/"), media_id.cast("string"))),
            )
            .otherwise(F.lit(None).cast("string"))
        )
        # strictly increasing offsets: base stride per index + deterministic jitter
        offset = (kx * 4096 + (hk % 4095)).cast("int")
        return F.struct(
            kind.alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            offset.alias("offset"),
        )

    spans = F.transform(F.sequence(F.lit(0), n_spans - 1), span)
    return df.select(doc_id.alias("doc_id"), spans.alias("spans"))


def generate_media_catalog(spark: SparkSession, seed: int = 42) -> DataFrame:
    """All non-dangling media refs by construction + kind + size."""
    df = spark.range(0, N_MEDIA, 1, 1)
    i = F.col("id")
    rows = []
    for kind, prefix in (("image", "img"), ("audio", "aud")):
        rows.append(
            df.select(
                F.concat(F.lit(f"media://{prefix}/"), i.cast("string")).alias("media_ref"),
                F.lit(kind).alias("media_kind"),
                (_h(seed + 9, i) % 10_000_000).alias("bytes"),
            )
        )
    return rows[0].unionAll(rows[1])


def documents_as_json(df: DataFrame) -> DataFrame:
    """(doc_id, doc_json) — the dynamic-payload variant of the same table,
    for the Arrow-batch walker backend."""
    return df.select(
        "doc_id",
        F.to_json(F.struct(F.col("doc_id"), F.col("spans"))).alias("doc_json"),
    )
