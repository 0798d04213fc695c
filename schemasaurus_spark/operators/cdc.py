"""Changelog (CDC) resolution for document corpora.

A 100 TB corpus is not rebuilt per run — it is maintained as a base
snapshot plus a stream of revision rows (upserts + deletes), the shape
every Iceberg/Delta ingestion pipeline produces.  The core operator is
"latest revision per key", and the standard implementation —
``row_number() OVER (PARTITION BY key ORDER BY version DESC)`` — buffers
and sorts every key's full history in one task.  ``latest_revisions``
instead uses ``max_by(payload_struct, version_struct)``: an ALGEBRAIC
aggregate, so a hot document with 10^6 revisions (boilerplate page
re-crawled hourly) collapses to one row per map partition before the
shuffle, and the single exchange carries ~|distinct keys| rows per map
partition.  (Catalyst plans struct-typed max_by as a SortAggregate, so
each map partition sorts by KEY — linear in partition size — but never
buffers or sorts a key's revision history the way the window does.)

Determinism: the version struct must totally order each key's revisions
(callers append a uniquifier column when versions can tie); Spark's
struct comparison is lexicographic by field, matching the SQL
``ORDER BY v1, v2, …`` the oracle states.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_revisions(
    changelog: DataFrame,
    key_col: str = "doc_id",
    version_cols: Sequence[str] = ("rev",),
    op_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """Resolve a changelog to its latest surviving revision per key.

    Returns one row per key holding the full payload of the
    greatest-version revision; when ``op_col`` is given, keys whose
    LATEST revision is a delete are dropped entirely (a later upsert
    resurrects the key — op is judged only at the winning revision, the
    standard CDC semantics).  Columns come back in the input order."""
    ver_set = set(version_cols)
    if key_col in ver_set:
        raise ValueError(f"key_col {key_col!r} cannot be a version column")
    payload_cols = [c for c in changelog.columns if c != key_col]
    payload = F.struct(*[F.col(c) for c in payload_cols])
    version = F.struct(*[F.col(c) for c in version_cols])
    latest = (
        changelog.groupBy(key_col)
        .agg(F.max_by(payload, version).alias("_p"))
        .select(key_col, *[F.col(f"_p.{c}").alias(c) for c in payload_cols])
    )
    if op_col is not None:
        # null op = upsert (never silently drop a row for a missing op tag)
        latest = latest.where(
            F.col(op_col).isNull() | (F.col(op_col) != delete_op)
        )
    return latest.select(*changelog.columns)


def apply_changelog(
    base: DataFrame,
    changelog: DataFrame,
    key_col: str = "doc_id",
    version_cols: Sequence[str] = ("rev",),
    op_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """Merge a resolved changelog into a base snapshot: touched keys take
    their latest surviving revision (or disappear, if the latest op is a
    delete); untouched base rows pass through via a single anti-join.

    Scale shape: the changelog is typically orders of magnitude smaller
    than the base, so the anti-join's build side is the RESOLVED
    changelog's key set (thin, one row per touched key) — broadcastable
    for daily deltas — and the base is scanned once, never shuffled on a
    version sort.  The op/delete columns exist only in the changelog; the
    merged frame keeps the BASE schema."""
    touched = changelog.select(key_col).distinct()
    survivors = latest_revisions(
        changelog, key_col, version_cols, op_col, delete_op
    )
    drop_cols = [c for c in ((op_col,) if op_col else ()) if c is not None]
    upserts = survivors.drop(*drop_cols).select(*base.columns)
    return base.join(touched, key_col, "left_anti").unionByName(upserts)


def scd2_intervals(
    changelog: DataFrame,
    key_col: str = "doc_id",
    version_col: str = "rev",
    op_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """Expand a changelog into SCD type-2 validity intervals: one output
    row per UPSERT revision carrying ``valid_from`` (its own version),
    ``valid_to`` (the key's next revision's version — NULL while open)
    and ``is_current`` (open-ended AND not closed by a delete).

    Semantics: every revision — including deletes — closes the interval
    before it; delete revisions emit no row of their own (tombstones),
    so a key whose final op is a delete has all intervals closed and no
    current row, while a later upsert resurrects the key with a fresh
    open interval.  This is the dimension-table shape every warehouse
    keeps for as-of joins over entity history.

    Scale shape: ONE window over (key, version) — a single hash exchange
    on the key and a partition-local sort; ``lead(1)`` is an offset
    frame, so WindowExec streams each key's history without buffering it
    (unlike rank-based dedup).  Versions must totally order each key's
    revisions; output is input-columns + (valid_from, valid_to,
    is_current), with ``version_col`` replaced by the interval bounds."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(version_col)
    nxt = F.lead(F.col(version_col)).over(w)
    out = changelog.select(
        *[c for c in changelog.columns if c != version_col],
        F.col(version_col).alias("valid_from"),
        nxt.alias("valid_to"),
    )
    if op_col is not None:
        # the lead window above saw the delete rows (they CLOSE the
        # interval before them); only now are the tombstones dropped
        out = out.where(F.col(op_col).isNull() | (F.col(op_col) != delete_op))
    return out.withColumn("is_current", F.col("valid_to").isNull())
