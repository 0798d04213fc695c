"""PII detection/redaction for training-data curation: emails, IPv4s,
US-style phone numbers and SSNs found and replaced with typed placeholder
tags, with per-type match counts for corpus reporting.

A standard pre-training curation stage (alongside dedup/quality/lang-ID):
scrub contact details before a corpus is used for model training.  All
patterns are plain character-class regexes — no backreferences, no
lookaround — so the SAME pattern string runs identically under Spark's
Java regex and DuckDB's RE2, which keeps the contract query
(``doc_pii_redaction``) exactly SQL-mirrorable.

Scale shape: one projection over the scan — ``regexp_count`` per type +
one chained ``regexp_replace`` — JVM-side, codegen'd, zero shuffles, zero
UDFs.  At 100 TB this is a map-only pass that rides whatever scan the
pipeline already does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: replacement applies top-to-bottom, so earlier (more specific)
# patterns must not leave text that later ones would re-match differently
# in only one engine.  Counts are measured per-type on the ORIGINAL text.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IPV4]"),
]


def pii_counts(text: Column) -> list[Column]:
    """One ``n_<type>`` int column per pattern, counted on the raw text."""
    return [
        F.coalesce(F.regexp_count(text, F.lit(pat)), F.lit(0)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def redact_text(text: Column) -> Column:
    """Chained typed-placeholder replacement (order = PII_PATTERNS)."""
    out = text
    for _, pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, per-type counts, redacted text) — the curation-stage output.

    Null text passes through as null with zero counts (a missing document
    is a validation finding, not a PII finding)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        *pii_counts(t),
        redact_text(t).alias("text_redacted"),
    )
