"""License / usage-rights compliance tagging for web-scale corpora.

Training-data pipelines must segregate documents by usage rights before
anything else touches them (a CC-BY-NC page must never reach a
commercial training mix).  This operator scans the text for the
standard machine-readable and boilerplate license markers and folds
them into ONE deterministic class per document:

* ``spdx_id``: the first ``SPDX-License-Identifier: <id>`` token
  (lower-cased; NULL when absent) — the only fully machine-readable
  marker, ubiquitous in source-code corpora.
* marker flags (0/1 int64, each detected anywhere in the text,
  case-insensitive): "all rights reserved", CC restricted variants
  (``cc by-nc`` / ``-nd`` / "non-commercial"), permissive CC
  attribution (``cc by`` / ``cc by-sa`` / "creative commons
  attribution"), public domain (``cc0`` / "public domain").
* ``n_copyright_marks``: exact occurrence count of the word
  "copyright" plus the © sign (length-delta counting).
* ``license_class``: MOST-RESTRICTIVE-WINS fold, fixed precedence —
  ``all_rights_reserved > cc_restricted > cc_by > public_domain >
  spdx > none``.  A doc claiming both "public domain" and "all rights
  reserved" classifies as all_rights_reserved: when markers conflict,
  the pipeline must assume the restrictive one.

Determinism discipline: all detection is case-folded substring /
explicit regex on ``lower(text)`` with patterns that parse identically
under Java regex and RE2 (no lookaround, no property classes), counts
are exact integer length deltas — a DuckDB oracle replays every column
bit-for-bit (``'g'`` flag on replace-all, ``nullif(.., '')`` to align
the engines' shared empty-string-on-no-match extract semantics).

Scale shape: ZERO shuffles — one embarrassingly-parallel projection
scan of JVM-side regex/substring expressions; duplicate doc_ids stay
separate physical rows.  NULL text classifies as 'none' with zero
counts.

No reference counterpart: schemasaurus validates JSON shape; rights
clearance on the text payload is engine-original curation machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "license_class",
    "SPDX_PATTERN",
    "CC_RESTRICTED_PATTERN",
    "CC_BY_PATTERN",
    "PUBLIC_DOMAIN_PATTERN",
    "ARR_PHRASE",
    "license_profile",
]

# All patterns run against lower(text); kept lookaround-free so Java
# regex (Spark) and RE2 (DuckDB) agree.
SPDX_PATTERN = "spdx-license-identifier:[ \\t]*([0-9a-z.+-]+)"
CC_RESTRICTED_PATTERN = "(cc[ -]by[a-z-]*-(nc|nd))|(non-?commercial)"
CC_BY_PATTERN = "(cc[ -]by)|(creative commons attribution)"
PUBLIC_DOMAIN_PATTERN = "(cc0)|(public domain)"
ARR_PHRASE = "all rights reserved"


def _count_occurrences(t: Column, needle: str) -> Column:
    """Exact non-overlapping occurrence count via length delta."""
    return (
        (F.length(t) - F.length(F.regexp_replace(t, needle, "")))
        / len(needle)
    ).cast("long")


def _markers(text_col: str):
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    f_arr = t.contains(ARR_PHRASE).cast("long")
    f_restricted = t.rlike(CC_RESTRICTED_PATTERN).cast("long")
    f_cc_by = t.rlike(CC_BY_PATTERN).cast("long")
    f_pd = t.rlike(PUBLIC_DOMAIN_PATTERN).cast("long")
    spdx = F.nullif(F.regexp_extract(t, SPDX_PATTERN, 1), F.lit(""))
    klass = (
        F.when(f_arr == 1, F.lit("all_rights_reserved"))
        .when(f_restricted == 1, F.lit("cc_restricted"))
        .when(f_cc_by == 1, F.lit("cc_by"))
        .when(f_pd == 1, F.lit("public_domain"))
        .when(spdx.isNotNull(), F.lit("spdx"))
        .otherwise(F.lit("none"))
    )
    return t, f_arr, f_restricted, f_cc_by, f_pd, spdx, klass


def license_class(text_col: str = "text") -> Column:
    """The most-restrictive-wins class as a bare column expression —
    for in-plan gating (CorpusPipeline ``license_allow``) without a
    join or a second scan."""
    return _markers(text_col)[-1]


def license_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per PHYSICAL input row:

    ``(doc_id, license_class, spdx_id, n_copyright_marks, f_arr,
    f_cc_restricted, f_cc_by, f_public_domain)``.
    """
    t, f_arr, f_restricted, f_cc_by, f_pd, spdx, klass = _markers(text_col)

    return df.select(
        F.col(id_col),
        klass.alias("license_class"),
        spdx.alias("spdx_id"),
        (
            _count_occurrences(t, "copyright")
            + _count_occurrences(t, "©")
        ).alias("n_copyright_marks"),
        f_arr.alias("f_arr"),
        f_restricted.alias("f_cc_restricted"),
        f_cc_by.alias("f_cc_by"),
        f_pd.alias("f_public_domain"),
    )
