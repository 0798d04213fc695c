"""Schema-evolution impact analysis: validate one corpus under TWO schema
versions in a single scan and report what a migration would break or fix.

The day-2 problem of a validation engine is not "is this corpus valid" but
"can I tighten (or loosen) the contract without breaking producers" — the
reference answers it one instance at a time by re-running ``validate`` with
the new schema (schemasaurus README's validate usage, /root/reference/
README.md); at 10^12 documents the only affordable answer is both verdicts
from ONE pass over the data.

Design (scale notes):

* Both schemas compile to native-Column predicate sets (``ColumnValidator``)
  and land in the SAME projection — Catalyst collapses the two ``apply``
  calls into one ``Project`` over one scan, so the corpus is read once and
  both verdicts ride whole-stage codegen (asserted on the physical plan in
  tests/test_migration.py).  Zero shuffles until the 4-row rollup.
* ``migration_matrix`` is the executive answer (at most 4 rows: the
  valid_old × valid_new transition counts) — one map-side-combined
  aggregate over two booleans.
* ``breaking_violations`` is the actionable answer: for documents the
  migration REGRESSES (valid under old, invalid under new) the exploded
  new-schema violation rows (code, JSON-pointer path, offending value,
  keyword argument) in the engine's standard error shape.  Docs that were
  valid under the old schema had zero old errors, so every exploded error
  is by definition newly introduced by the schema change — no error-level
  anti-join needed.  The explode touches only regressed docs (filter first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .columns import ColumnValidator


def migration_impact(
    df: DataFrame,
    old_schema: dict,
    new_schema: dict,
    options_old: dict | None = None,
    options_new: dict | None = None,
) -> DataFrame:
    """Append ``valid_old`` / ``valid_new`` verdicts and ``errors_new`` to
    every row — both schema versions evaluated in one projection.

    Both error expressions are compiled against the PRISTINE row struct:
    chaining two ``apply`` calls would feed the second validator the first
    one's appended errors/valid columns as row fields — which a root
    ``additionalProperties: false`` schema (the north-rule flagship)
    would correctly reject, poisoning every verdict."""
    from pyspark.sql import functions as F

    row_type = df.schema
    value = F.struct(*[F.col(f.name) for f in row_type.fields])
    errs_old = ColumnValidator(old_schema, options_old).errors(
        value, row_type, F.lit("")
    )
    errs_new = ColumnValidator(new_schema, options_new).errors(
        value, row_type, F.lit("")
    )
    return (
        df.withColumn("errors_old", errs_old)
        .withColumn("valid_old", F.size(F.col("errors_old")) == 0)
        .withColumn("errors_new", errs_new)
        .withColumn("valid_new", F.size(F.col("errors_new")) == 0)
    )


def migration_matrix(
    df: DataFrame,
    old_schema: dict,
    new_schema: dict,
    options_old: dict | None = None,
    options_new: dict | None = None,
) -> DataFrame:
    """``(valid_old, valid_new, n_docs)`` transition counts — at most 4 rows.

    valid→invalid rows are the migration's breakage, invalid→valid rows are
    what a loosening forgives; the diagonal is the no-op mass.
    """
    impact = migration_impact(df, old_schema, new_schema, options_old, options_new)
    return impact.groupBy("valid_old", "valid_new").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def breaking_violations(
    df: DataFrame,
    old_schema: dict,
    new_schema: dict,
    id_col: str = "doc_id",
    options_old: dict | None = None,
    options_new: dict | None = None,
) -> DataFrame:
    """New-schema violation rows for documents the migration regresses
    (``valid_old AND NOT valid_new``): one row per (doc, violation) with
    ``(id, code, json_pointer, value, arg)``."""
    impact = migration_impact(df, old_schema, new_schema, options_old, options_new)
    return (
        impact.where(F.col("valid_old") & ~F.col("valid_new"))
        .select(id_col, F.explode("errors_new").alias("err"))
        .select(
            id_col,
            F.col("err.code").alias("code"),
            F.col("err.path").alias("json_pointer"),
            F.col("err.value").alias("value"),
            F.col("err.arg").alias("arg"),
        )
    )
