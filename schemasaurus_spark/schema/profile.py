"""Observed-schema profiling of semi-structured JSON columns, and
conformance of the observed profile against a declared JSON Schema.

The inverse of validation: instead of asking "does each document obey the
schema?", `json_schema_profile` asks "what schema does the data actually
exhibit?" — per (JSON-pointer path, JSON type) occurrence counts over a
column of JSON strings.  `schema_conformance` then diffs that profile
against a declared draft-4 schema whose (path, allowed-types) inventory is
enumerated by the SAME compiled schema iterator the validator uses
(walker.new_iterator's schema-only ghost walk — the reference's
iterateSchema feature, /root/reference/src/compiler.js:294-311 /
README.md:137-168, driving discovery instead of checking).

Scale shape
-----------
* One scan.  The walk runs inside a ``mapInPandas`` Arrow kernel
  (same fused-kernel boundary as schema/batch.py): JSON parse + recursive
  path/type emission per batch, with **in-kernel pre-aggregation** — each
  batch emits one ``Counter`` worth of (path, type, n) rows, so the
  exchange feeding the final groupBy carries at most
  ``batches x distinct_paths`` thin rows, never one row per JSON node.
  At 10^12 rows the shuffle is metadata-sized as long as the path space
  is (which is exactly when a schema profile is meaningful).
* The final ``groupBy(path, jtype).sum`` is map-side combinable.
* ``schema_conformance`` joins the (tiny) profile against the declared
  inventory — a driver-enumerated, broadcast-sized table; the verdict
  logic is plain Column CASE arithmetic, no Python in the hot path.

Type lexicon (JSON-native, draft-4 aligned): ``object array string
integer number boolean null`` plus ``malformed`` (unparseable text,
path "") — malformed inputs are first-class rows, never dropped,
mirroring batch.py's jsonParse contract.  A JSON number is ``integer``
iff it lexes as an int literal (no decimal point/exponent): 1 is
integer, 1.0 and 1.5 are number.  Conformance applies draft-4 numeric
subsumption: observed ``integer`` satisfies declared ``number``.
"""

from __future__ import annotations

import json
from collections import Counter
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .walker import new_iterator

__all__ = [
    "schema_profile_drift",
    "json_schema_profile",
    "declared_paths",
    "schema_conformance",
]

PROFILE_DDL = "path string, jtype string, n bigint"


def _escape(key: str) -> str:
    # JSON-pointer token escaping (RFC 6901), same as batch._pointer
    return str(key).replace("~", "~0").replace("/", "~1")


def _jtype(v) -> str:
    # bool is an int subclass in Python — test it first
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    return "object"


def _walk(value, path: str, counts: Counter) -> None:
    t = _jtype(value)
    counts[(path, t)] += 1
    if t == "object":
        for k, v in value.items():
            _walk(v, f"{path}/{_escape(k)}", counts)
    elif t == "array":
        # elements aggregate under one '[]' marker: a profile wants
        # "what types live in this array", not one path per index
        for v in value:
            _walk(v, path + "[]", counts)


def json_schema_profile(df: DataFrame, json_col: str) -> DataFrame:
    """``(path, jtype, n)`` occurrence counts over a JSON-string column.

    ``path`` is a JSON pointer ("" = the root value) with ``[]``
    appended per array-nesting level; ``jtype`` is the JSON type
    observed at that path (see module doc); ``n`` counts occurrences
    (array elements count once each, so n at ``/tags[]`` is the total
    element count, not the row count).  SQL-NULL cells are skipped
    (no JSON document present); unparseable text profiles as one
    ``("", "malformed")`` occurrence.
    """
    thin = df.select(F.col(json_col).alias("j"))

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            counts: Counter = Counter()
            for s in pdf["j"]:
                if s is None:
                    continue
                try:
                    value = json.loads(s)
                except (ValueError, TypeError):
                    counts[("", "malformed")] += 1
                    continue
                _walk(value, "", counts)
            if not counts:
                continue
            yield pd.DataFrame(
                [(p, t, n) for (p, t), n in counts.items()],
                columns=["path", "jtype", "n"],
            )

    per_batch = thin.mapInPandas(kernel, schema=PROFILE_DDL)
    return per_batch.groupBy("path", "jtype").agg(F.sum("n").alias("n"))


def declared_paths(schema: dict) -> list[tuple[str, list[str] | None]]:
    """Enumerate ``(json_pointer_path, allowed_types_or_None)`` from a
    draft-4 schema via the compiled iterator's schema-only ghost walk —
    the reference's iterateSchema driving declaration discovery.  A node
    without a ``type`` keyword declares the path but constrains no type
    (``None`` = anything goes there).  Array item subschemas appear with
    the same ``[]`` path marker the profiler emits."""
    recorded: list[tuple[str, list[str] | None]] = []

    class Sel:
        def selectors(self):
            def handler(subschema, cctx):
                t = subschema.get("type") if isinstance(subschema, dict) else None
                types = [t] if isinstance(t, str) else (list(t) if t else None)

                def run(value, rctx):
                    path = "".join(
                        "[]" if p == "[]" else "/" + _escape(p) for p in rctx.path
                    )
                    recorded.append((path, types))

                return run

            # ':start' fires for every node including type-less ones,
            # so untyped declared paths still enumerate
            return {":start": handler}

        def end(self, value):
            return recorded

    new_iterator(schema, Sel)()  # ghost walk: no instance value
    # dedupe (combinators can visit a path twice), merging allowed types
    merged: dict[str, list[str] | None] = {}
    for path, types in recorded:
        if path not in merged:
            merged[path] = types
        elif merged[path] is not None:
            merged[path] = (
                None if types is None else sorted(set(merged[path]) | set(types))
            )
    return sorted(merged.items())


def schema_conformance(
    profile: DataFrame, schema: dict
) -> DataFrame:
    """Diff an observed profile against a declared schema:
    ``(path, jtype, n, issue)`` rows for every observed (path, type)
    the declaration does not admit.

    issues: ``malformed`` (unparseable documents), ``undeclared_path``
    (path absent from the schema), ``type_mismatch`` (path declared,
    observed type outside its ``type`` set — with draft-4 numeric
    subsumption, observed integer satisfies declared number).
    Conforming rows are omitted; an empty result means the corpus
    exhibits exactly the declared shape.
    """
    spark = profile.sparkSession
    declared = declared_paths(schema)
    decl_df = spark.createDataFrame(
        [(p, t) for p, t in declared],
        "path string, allowed array<string>",
    )
    observed_ok = F.array_contains("allowed", F.col("jtype")) | (
        (F.col("jtype") == "integer") & F.array_contains("allowed", "number")
    )
    # a path missing from decl_df entirely is undeclared; a
    # declared-but-untyped path also carries allowed = NULL —
    # disambiguate with an is_declared flag joined alongside
    decl_flag = decl_df.select("path", F.lit(True).alias("is_declared"))
    joined = profile.join(F.broadcast(decl_df), "path", "left").join(
        F.broadcast(decl_flag), "path", "left"
    )
    issue = (
        F.when(F.col("jtype") == "malformed", F.lit("malformed"))
        .when(F.col("is_declared").isNull(), F.lit("undeclared_path"))
        .when(F.col("allowed").isNull(), F.lit(None))  # declared, untyped
        .when(observed_ok, F.lit(None))
        .otherwise(F.lit("type_mismatch"))
    )
    return (
        joined.withColumn("issue", issue)
        .where(F.col("issue").isNotNull())
        .select("path", "jtype", "n", "issue")
    )


def schema_profile_drift(base: DataFrame, current: DataFrame) -> DataFrame:
    """Structural drift between two observed-schema profiles (both
    ``json_schema_profile`` outputs, or mergeable sums of them): the
    schema-shape counterpart of the value-distribution drift family
    (operators/drift.py) — "did the data's SHAPE change between corpus
    versions?", answered before any value statistic moves.

    Output: one row per (path, jtype) seen on either side —
    ``(path, jtype, n_base, n_cur, share_base, share_cur, share_delta,
    status)``.  Shares are occurrences per profiled document (count
    divided by the side's root-path total, the number of parsed docs),
    so the numbers stay comparable when the two corpora differ in size;
    an empty side yields NULL shares (no documents, no denominator).
    ``status``: ``added_path`` / ``removed_path`` (the path itself
    appeared/disappeared), ``added_type`` / ``removed_type`` (the path
    survives but exhibits a new/vanished JSON type — the classic silent
    producer-migration signal: "/id" drifting integer -> string), else
    ``common``.

    Scale shape: both inputs are metadata-sized by the profiler's
    construction (bounded path space), so everything here — the
    full-outer diff join, the per-path presence window, the broadcast
    root-count join — runs over profile rows, never corpus rows.  The
    corpus itself was scanned once per side, by the profiler."""
    from pyspark.sql import Window

    b = base.groupBy("path", "jtype").agg(F.sum("n").alias("n_base"))
    c = current.groupBy("path", "jtype").agg(F.sum("n").alias("n_cur"))
    j = b.join(c, ["path", "jtype"], "full_outer").select(
        "path",
        "jtype",
        F.coalesce("n_base", F.lit(0)).cast("long").alias("n_base"),
        F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
    )
    w = Window.partitionBy("path")
    j = j.withColumn("_pb", F.sum("n_base").over(w)).withColumn(
        "_pc", F.sum("n_cur").over(w)
    )
    roots = j.agg(
        F.sum(F.when(F.col("path") == "", F.col("n_base"))).alias("_rb"),
        F.sum(F.when(F.col("path") == "", F.col("n_cur"))).alias("_rc"),
    )
    status = (
        F.when(F.col("_pb") == 0, F.lit("added_path"))
        .when(F.col("_pc") == 0, F.lit("removed_path"))
        .when(F.col("n_base") == 0, F.lit("added_type"))
        .when(F.col("n_cur") == 0, F.lit("removed_type"))
        .otherwise(F.lit("common"))
    )
    share_b = F.when(F.col("_rb") > 0, F.col("n_base") / F.col("_rb"))
    share_c = F.when(F.col("_rc") > 0, F.col("n_cur") / F.col("_rc"))
    return (
        j.crossJoin(F.broadcast(roots))
        .withColumn("share_base", share_b)
        .withColumn("share_cur", share_c)
        .select(
            "path",
            "jtype",
            "n_base",
            "n_cur",
            "share_base",
            "share_cur",
            (F.col("share_cur") - F.col("share_base")).alias("share_delta"),
            status.alias("status"),
        )
    )
