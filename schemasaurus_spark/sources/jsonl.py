"""JSON-lines source: ingest raw JSON documents exactly as a reference
user holds them — one arbitrary JSON value per line — and run the
reference-exact walker over them at cluster scale.

This closes the last format gap for switching off the reference: its
users call ``validate(JSON.parse(line))`` in a loop; here the same schema
compiles once per executor worker and Arrow batches stream through it
(``schema/batch.py``).  The text scan is splittable (newline-delimited),
so a 100 TB JSONL corpus parallelizes by file split with no shuffle at
all until the caller aggregates.

Malformed lines are first-class: ``validate_jsonl`` surfaces them as
``jsonParse`` violation records (never silently dropped — the no-silent-
drops rule), and ``normalize_jsonl`` yields NULL for them so a downstream
filter can count and quarantine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schemasaurus_spark.schema.batch import BatchNormalizer, BatchValidator


def read_jsonl(spark: SparkSession, path: str, json_col: str = "doc_json") -> DataFrame:
    """One row per line; the raw text is NOT parsed here — parsing happens
    inside the Arrow-batch walker so heterogeneous/dynamic payloads never
    need a unified Spark schema (the reason we avoid ``spark.read.json``:
    its schema inference pass reads the data twice and coerces
    heterogeneous values to strings)."""
    return spark.read.text(path).select(F.col("value").alias(json_col))


def validate_jsonl(
    spark: SparkSession,
    path: str,
    schema: dict,
    options: dict | None = None,
    on_parse_error: str = "record",
) -> DataFrame:
    """(doc_json, errors, valid) per input line, reference-exact."""
    df = read_jsonl(spark, path)
    return BatchValidator(schema, options, on_parse_error).apply_json(
        df, "doc_json", keep=["doc_json"]
    )


def normalize_jsonl(
    spark: SparkSession,
    path: str,
    schema: dict,
    options: dict | None = None,
    on_parse_error: str = "record",
) -> DataFrame:
    """(doc_json, normalized) per input line; ``normalized`` is compact
    JSON after defaults / additionalProperty removal / type coercions,
    NULL for unparseable lines."""
    df = read_jsonl(spark, path)
    return BatchNormalizer(schema, options, on_parse_error).apply_json(
        df, "doc_json", keep=["doc_json"]
    )
