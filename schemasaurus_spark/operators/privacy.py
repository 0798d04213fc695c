"""Privacy audit for training corpora: k-anonymity and l-diversity over
quasi-identifier columns — the re-identification check a dataset release
runs alongside PII redaction (operators/pii.py scrubs direct
identifiers; this measures whether COMBINATIONS of innocuous columns
single people out: the classic zip+birthdate+sex joins).

Definitions (public: Sweeney '02 k-anonymity; Machanavajjhala '07
l-diversity): a quasi-identifier group is one distinct combination of
the chosen columns; the table is k-anonymous iff every group has >= k
rows, and l-diverse w.r.t. a sensitive column iff every group exhibits
>= l distinct sensitive values.  The audit reports the VIOLATING groups
(the actionable output — these are the rows to generalize, suppress, or
drop), not just the boolean.

Semantics: NULL is a quasi-identifier value like any other (two rows
with NULL zip are the same group — they are equally indistinguishable);
NULL sensitive values do not count toward diversity (an absent label
reveals nothing, so it cannot diversify).

Scale shape: ONE map-side-combinable groupBy over the quasi-identifier
key computes size and (when a sensitive column is given) the distinct
sensitive count per group in the same pass; the violating-groups filter
is a HAVING.  Output is violation-sized.  ``count_distinct`` per group
is exact (the guarantee is per group, so a sketch would under/over-call
individual groups); group count per key is bounded by the group itself,
not the corpus, so there is no skew cliff a hot group could trigger
beyond its own size — and a HOT group is by definition not a violator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_anonymity_report", "privacy_summary", "suppress_under_k", "pseudonymize"]


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    sensitive_col: str | None = None,
    l: int | None = None,
) -> DataFrame:
    """Violating quasi-identifier groups: ``(*quasi_cols, group_size,
    [distinct_sensitive,] issue)`` with issue ∈ ``k_anonymity`` (size
    < k) | ``l_diversity`` (>= k rows but < l distinct non-null
    sensitive values; requires ``sensitive_col`` and ``l``).  A group
    failing both reports as ``k_anonymity`` (the stronger finding —
    fixing it subsumes the other)."""
    if not quasi_cols:
        raise ValueError("k_anonymity_report: need at least one quasi column")
    if k < 1:
        raise ValueError("k_anonymity_report: k must be >= 1")
    if (sensitive_col is None) != (l is None):
        raise ValueError("k_anonymity_report: sensitive_col and l go together")
    aggs = [F.count(F.lit(1)).cast("long").alias("group_size")]
    if sensitive_col is not None:
        aggs.append(
            F.count_distinct(F.col(sensitive_col)).cast("long").alias(
                "distinct_sensitive"
            )
        )
    grouped = df.groupBy(*quasi_cols).agg(*aggs)
    if sensitive_col is None:
        return grouped.where(F.col("group_size") < k).withColumn(
            "issue", F.lit("k_anonymity")
        )
    issue = F.when(F.col("group_size") < k, F.lit("k_anonymity")).when(
        F.col("distinct_sensitive") < int(l), F.lit("l_diversity")
    )
    return (
        grouped.withColumn("issue", issue)
        .where(F.col("issue").isNotNull())
    )


def privacy_summary(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """One-row corpus verdict: ``(n_groups, n_violating_groups,
    n_exposed_rows, min_group_size, is_k_anonymous)`` — the gate-able
    form (n_exposed_rows = rows living in under-k groups)."""
    grouped = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("group_size")
    )
    viol = F.col("group_size") < k
    return grouped.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(viol, 1).otherwise(0)).cast("long").alias("n_violating_groups"),
        F.coalesce(F.sum(F.when(viol, F.col("group_size"))), F.lit(0))
        .cast("long")
        .alias("n_exposed_rows"),
        F.min("group_size").alias("min_group_size"),
        (
            F.coalesce(F.sum(F.when(viol, 1).otherwise(0)), F.lit(0)) == 0
        ).alias("is_k_anonymous"),
    )


def suppress_under_k(df: DataFrame, quasi_cols: list[str], k: int) -> DataFrame:
    """Make a release k-anonymous by SUPPRESSION: drop every row living
    in an under-k quasi-identifier group (the blunt but sound fix;
    generalization hierarchies are domain-specific and out of scope).
    The result is k-anonymous by construction: every surviving group had
    >= k rows and suppression removes groups whole, never thins them.

    NULL-safe by necessity: the violating-group anti-join compares quasi
    values with null-safe equality, otherwise a NULL-valued group's rows
    would silently SURVIVE the suppression of their own group (plain SQL
    equality never matches NULL = NULL).  Scale shape: one map-side-
    combinable groupBy finds violators (violation-sized output, typically
    broadcastable), one anti-join removes their rows."""
    if k < 1:
        raise ValueError("suppress_under_k: k must be >= 1")
    viol = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("_gs"))
        .where(F.col("_gs") < k)
        .select(*[F.col(c).alias(f"_v_{c}") for c in quasi_cols])
    )
    cond = None
    for c in quasi_cols:
        piece = F.col(c).eqNullSafe(F.col(f"_v_{c}"))
        cond = piece if cond is None else cond & piece
    return df.join(F.broadcast(viol), cond, "left_anti")


def pseudonymize(
    df: DataFrame, cols: list[str], secret: str, truncate: int = 32
) -> DataFrame:
    """Replace identifier columns with deterministic keyed surrogates:
    ``sha2(secret || ':' || column_name || ':' || value, 256)`` truncated
    to ``truncate`` hex chars.

    The release-time companion of redaction and suppression: the same
    (secret, column, value) triple maps to the same surrogate EVERYWHERE,
    so joins, grouping and uniqueness auditing survive pseudonymization
    across tables and ingest batches — while without the secret the map
    is one-way.  The column name is part of the preimage so equal values
    in different columns (user_id vs referrer_id) get UNRELATED
    surrogates: cross-column correlation would otherwise leak structure.
    NULL stays NULL (absence is not an identifier).  Values are cast to
    string before hashing, so surrogates are engine-portable and
    type-stable.

    Keep the secret out of the data: at 10^12 rows the projection is
    zero-shuffle whole-stage-codegen'd JVM sha2 — no UDF, no Python.
    Truncation to 32 hex chars (128 bits) keeps collision odds ~2^-64 at
    10^12 distinct values; raise it if the audit demands full SHA-256.
    """
    if not cols:
        raise ValueError("pseudonymize: no columns given")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"pseudonymize: columns {missing} not in DataFrame")
    if not 8 <= truncate <= 64:
        raise ValueError(f"pseudonymize: truncate must be in [8, 64], got {truncate}")
    out = df
    for c in cols:
        surrogate = F.substring(
            F.sha2(
                F.concat_ws(":", F.lit(secret), F.lit(c), F.col(c).cast("string")),
                256,
            ),
            1,
            truncate,
        )
        out = out.withColumn(c, F.when(F.col(c).isNotNull(), surrogate))
    return out
