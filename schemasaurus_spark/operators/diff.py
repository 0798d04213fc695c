"""Corpus snapshot diff: added / removed / changed rows between two
versions of a keyed table — the audit step a maintained 100 TB corpus
runs after every ingest/compaction cycle ("what did this release change?"),
and the input a CDC backfill derives its changelog from.

Scale shape: each side is reduced IN ITS SCAN PROJECTION to
``(key, fingerprint)`` — the full-width rows never reach the join, so
the single key-partitioned full-outer join shuffles ~24 bytes/row no
matter how wide the table is.  The fingerprint is md5 over the JSON
serialization of the compared columns — sentinel/separator schemes are
NOT injective (a value equal to the sentinel masquerades as NULL, a
value containing "sep+flag" shifts column boundaries; both caught by
tests), while JSON escaping is, with NULL fields omitted and therefore
distinct from every string.  The correctness oracle compares columns
directly (IS DISTINCT FROM) instead of replaying the hash, so the
fingerprint's faithfulness is independently checked.  No sort, no
window; AQE handles whatever key skew the table has (doc_id keys are
unique per side by contract, so skew is bounded at 2 rows/key anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_fingerprint(cols: list[str]) -> Column:
    """md5 of the JSON object of the named columns (fixed field order =
    the list order).  Injective on the compared values: JSON escapes
    string contents, and a NULL field is omitted — no value can imitate
    it."""
    return F.md5(F.to_json(F.struct(*[F.col(c) for c in cols])))


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """``(id, change)`` rows with change ∈ added | removed | changed;
    unchanged rows are absent (the diff of a 10^12-row corpus should be
    delta-sized, not corpus-sized).  ``compare_cols`` defaults to every
    shared non-key column, in OLD's column order (deterministic
    fingerprints require a fixed column order — callers diffing tables
    with different layouts should pass the list explicitly)."""
    if compare_cols is None:
        shared = set(new.columns)
        compare_cols = [c for c in old.columns if c != id_col and c in shared]
    if not compare_cols:
        raise ValueError("no columns to compare (pass compare_cols)")
    fp = row_fingerprint(compare_cols)
    o = old.select(F.col(id_col), fp.alias("_fp_old"))
    n = new.select(F.col(id_col), fp.alias("_fp_new"))
    joined = o.join(n, id_col, "full_outer")
    return joined.select(
        id_col,
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        .alias("change"),
    ).where(F.col("change").isNotNull())


def _portable_fingerprint(cols: list[str]) -> Column:
    """Cross-engine-replayable row fingerprint: fixed-width per-column
    segments (md5 of the value's string form, or '-' for NULL) re-hashed
    once.  Fixed-width fields make the serialization injective without
    sentinels; md5(CAST(c AS STRING)) is reproducible in any SQL engine
    for string/integer/boolean columns (float string forms are NOT
    engine-portable — callers pre-round or pre-cast those)."""
    segs = [
        F.when(F.col(c).isNull(), F.lit("-")).otherwise(
            F.md5(F.col(c).cast("string"))
        )
        for c in cols
    ]
    return F.md5(F.concat(*segs))


def dataset_checksum(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Order- and partitioning-invariant content checksum of a table as
    ONE row ``(n_rows, checksum)`` — the release-audit primitive when the
    question is only "are these two corpus versions byte-identical as
    multisets?" and a delta-sized ``corpus_diff`` is more answer than
    needed (no key required, O(1) output, one scan).

    Construction: per-row 60-bit value from the portable fingerprint,
    summed exactly in decimal(38,0) (10^12 rows x 2^60 ~ 2^100 < 10^38)
    and reduced mod 2^60 — addition commutes, so the result is invariant
    to row order, partitioning, and engine.  Equal multisets ⇒ equal
    checksum; a differing pair collides with probability ~2^-60 (not
    adversarially secure — an audit tool, not a MAC).  Empty input
    checksums to 0.  Scale shape: one map-side-combinable aggregate over
    a scan-stage projection; no shuffle beyond the 1-row combine."""
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("dataset_checksum: need at least one column")
    h = F.conv(F.substring(_portable_fingerprint(cols), 1, 15), 16, 10).cast(
        "long"
    )
    total = F.sum(h.cast("decimal(38,0)"))
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(
            (total % F.lit(1 << 60).cast("decimal(38,0)")).cast("long"), F.lit(0)
        ).alias("checksum"),
    )
