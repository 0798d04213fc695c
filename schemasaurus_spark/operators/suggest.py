"""Constraint suggestion: profile a table once and propose the
declarative quality rules the data currently satisfies (the generator
side of operators/quality_gate.py — Deequ's ConstraintSuggestion shape,
re-expressed Spark-first).

The reference validates documents against a schema someone WROTE; a
100 TB curation loop also needs the inverse bootstrap — "what contract
does this corpus already keep?" — so that a gate can be erected before
the first regression, not after.  Suggestions are observations, not
guarantees: they describe this snapshot of the data and are meant to be
reviewed, then fed to ``quality_gate`` (``to_rules``) or versioned.

Scale shape
-----------
* Pass 1: ONE ``df.agg(...)`` computes every per-column statistic
  (count/nulls/distinct/min/max/max-length) — map-side combinable, one
  scan regardless of column count.  ``approx=True`` switches cardinality
  to HyperLogLog++ for the 100 TB path (suggestions are advisory, so
  sketch error only shifts the categorical threshold, never corrupts a
  result the gate would later enforce exactly).
* Pass 2 runs ONLY if some string column's observed cardinality is at or
  under ``categorical_max_distinct``: one more single-row aggregate
  gathering ``sort_array(collect_set(...))`` for just the qualifying
  columns.  Low cardinality is established BEFORE any collect_set is
  planned, so no executor ever materializes a high-cardinality set —
  the two-phase split is what makes domain discovery safe at scale
  (the same reason Deequ profiles before it suggests).
* Output is metadata-sized by construction (a few rows per column), so
  it is built driver-side from the two one-row aggregates.

Suggestion lexicon (col_name, suggestion, arg):
* ``not_null``            — no NULLs observed (arg NULL)
* ``unique``              — complete AND all values distinct (arg NULL)
* ``completeness_ge``     — NULLs observed; arg = floor-percent of
                            non-null rows, integer arithmetic
                            ``(100 * non_null) // n`` so an ANSI oracle
                            reproduces it exactly
* ``value_range``         — integral columns; arg = "min..max"
                            (float bounds are snapshot/drift territory —
                            their text form is not engine-portable)
* ``categorical_domain``  — string columns with cardinality in
                            [1, categorical_max_distinct]; arg = the
                            sorted domain, comma-joined
* ``max_length_le``       — string columns; arg = max observed length
Columns that are entirely NULL (or an empty table) suggest nothing —
absence of evidence is not a contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .quality_gate import QualityRule

__all__ = ["suggest_constraints", "to_rules"]

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)

SUGGESTION_DDL = "col_name string, suggestion string, arg string"


def suggest_constraints(
    df: DataFrame,
    columns: list[str] | None = None,
    categorical_max_distinct: int = 20,
    approx: bool = False,
) -> DataFrame:
    """Suggested constraints for ``columns`` (default: all) as a
    ``(col_name, suggestion, arg)`` DataFrame.  See module doc for the
    lexicon, pass structure, and determinism notes."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [f.name for f in df.schema.fields]
    unknown = set(columns) - set(fields)
    if unknown:
        raise ValueError(f"suggest_constraints: no such column(s) {sorted(unknown)}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        distinct = (
            F.approx_count_distinct(c).alias(f"{c}__d")
            if approx
            else F.count_distinct(F.col(c)).alias(f"{c}__d")
        )
        aggs += [F.count(F.col(c)).alias(f"{c}__nn"), distinct]
        if isinstance(fields[c], _INTEGRAL):
            aggs += [F.min(c).alias(f"{c}__min"), F.max(c).alias(f"{c}__max")]
        if isinstance(fields[c], T.StringType):
            aggs += [F.max(F.length(c)).alias(f"{c}__maxlen")]
    stats = df.agg(*aggs).collect()[0]

    n = stats["__n"]
    domain_cols = [
        c
        for c in columns
        if isinstance(fields[c], T.StringType)
        and 0 < stats[f"{c}__d"] <= categorical_max_distinct
    ]
    domains: dict[str, list[str]] = {}
    if domain_cols:
        dom_row = df.agg(
            *[F.sort_array(F.collect_set(c)).alias(c) for c in domain_cols]
        ).collect()[0]
        domains = {c: dom_row[c] for c in domain_cols}

    rows: list[tuple[str, str, str | None]] = []
    for c in columns:
        nn, d = stats[f"{c}__nn"], stats[f"{c}__d"]
        if n == 0 or nn == 0:
            continue
        if nn == n:
            rows.append((c, "not_null", None))
            if d == n:
                rows.append((c, "unique", None))
        else:
            rows.append((c, "completeness_ge", str((100 * nn) // n)))
        if isinstance(fields[c], _INTEGRAL):
            rows.append((c, "value_range", f"{stats[f'{c}__min']}..{stats[f'{c}__max']}"))
        if isinstance(fields[c], T.StringType):
            rows.append((c, "max_length_le", str(stats[f"{c}__maxlen"])))
            if c in domains:
                rows.append((c, "categorical_domain", ",".join(domains[c])))
    return df.sparkSession.createDataFrame(rows, SUGGESTION_DDL)


def to_rules(suggestions: DataFrame | list, prefix: str = "suggested") -> list[QualityRule]:
    """Convert suggestions into enforceable ``QualityRule``s for
    ``quality_gate`` — the bootstrap loop: profile → suggest → gate.

    Mapping (suggestions the gate's metric lexicon cannot express are
    skipped rather than approximated): not_null → null_rate le 0;
    unique → distinct_ratio eq 1; completeness_ge p → null_rate le
    (100-p)/100; value_range lo..hi → min ge lo AND max le hi;
    max_length_le L → max_length le L; categorical_domain →
    distinct_count le |domain| (the domain VALUES need the gate's
    future set-membership metric; cardinality is what it can hold
    today)."""
    rows = suggestions.collect() if isinstance(suggestions, DataFrame) else suggestions
    rules: list[QualityRule] = []
    for r in rows:
        c, s, arg = r[0], r[1], r[2]
        rid = f"{prefix}:{c}:{s}"
        if s == "not_null":
            rules.append(QualityRule(rid, "null_rate", "le", 0.0, column=c))
        elif s == "unique":
            rules.append(QualityRule(rid, "distinct_ratio", "eq", 1.0, column=c))
        elif s == "completeness_ge":
            rules.append(
                QualityRule(rid, "null_rate", "le", (100 - int(arg)) / 100, column=c)
            )
        elif s == "value_range":
            lo, hi = arg.split("..")
            rules.append(QualityRule(f"{rid}:lo", "min", "ge", float(lo), column=c))
            rules.append(QualityRule(f"{rid}:hi", "max", "le", float(hi), column=c))
        elif s == "max_length_le":
            rules.append(QualityRule(rid, "max_length", "le", float(arg), column=c))
        elif s == "categorical_domain":
            rules.append(
                QualityRule(
                    rid, "distinct_count", "le", float(len(arg.split(","))), column=c
                )
            )
    return rules
