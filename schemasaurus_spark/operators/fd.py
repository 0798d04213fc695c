"""Functional-dependency discovery: which column-level invariants
``lhs -> rhs`` (every lhs value maps to at most one non-null rhs value)
does the data currently keep?

The profiling-side sibling of constraint suggestion (operators/
suggest.py): uniqueness/nullability describe single columns, FDs
describe RELATIONSHIPS — candidate keys (a column that determines every
other), denormalization echoes (source -> source_region), and the
integrity rules worth erecting a gate for before the first regression.
No reference counterpart (schemasaurus validates one value at a time);
this is Deequ-profiler territory re-expressed Spark-first.

Semantics: NULL-tolerant FDs.  A NULL lhs is a group like any other
(SQL GROUP BY semantics); NULL rhs values never violate (count_distinct
ignores NULLs — "determined up to missing values").  An FD holds iff no
lhs group exhibits more than one distinct non-null rhs value; the
violating-group count is reported so near-FDs (violations from a dirty
sliver) are visible, not just the boolean.

Scale shape: one pass PER LHS COLUMN covering every rhs at once —
``groupBy(lhs).agg(count_distinct(r1), ..., count_distinct(rk))`` then a
one-row rollup, so k columns cost k map-side-combinable shuffles, never
k*(k-1) scans.  Multiple distinct aggregates expand rows (k-1)x before
the exchange (Catalyst's Expand), which is linear and explicit — the
price of exactness.  The per-group frame is |distinct lhs| rows; the
rollup is one row; results are metadata-sized (k*(k-1) rows).  For very
wide tables, profile a column subset — FD discovery over hundreds of
columns is a lattice-search problem (TANE), out of scope by design.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fd_profile"]


def fd_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """``(lhs, rhs, n_groups, n_violating, holds)`` for every ordered
    column pair: ``n_groups`` distinct lhs values (NULL included),
    ``n_violating`` of them exhibiting >1 distinct non-null rhs value,
    ``holds`` = no violations.  Empty input holds vacuously."""
    cols = list(columns) if columns is not None else list(df.columns)
    unknown = set(cols) - set(df.columns)
    if unknown:
        raise ValueError(f"fd_profile: no such column(s) {sorted(unknown)}")
    if len(cols) < 2:
        raise ValueError("fd_profile: need at least two columns")

    frames = []
    for lhs in cols:
        rhs = [c for c in cols if c != lhs]
        per_group = df.groupBy(lhs).agg(
            *[F.count_distinct(F.col(r)).alias(f"_d_{i}") for i, r in enumerate(rhs)]
        )
        rollup = per_group.agg(
            F.count(F.lit(1)).alias("_ng"),
            *[
                F.sum(F.when(F.col(f"_d_{i}") > 1, 1).otherwise(0)).alias(f"_v_{i}")
                for i in range(len(rhs))
            ],
        )
        stack_args = ", ".join(
            f"'{r}', coalesce(_v_{i}, 0)" for i, r in enumerate(rhs)
        )
        frames.append(
            rollup.selectExpr(
                f"'{lhs}' AS lhs",
                f"stack({len(rhs)}, {stack_args}) AS (rhs, n_violating)",
                "_ng AS n_groups",
            )
        )
    out = reduce(lambda a, b: a.unionByName(b), frames)
    return out.select(
        "lhs",
        "rhs",
        F.col("n_groups").cast("long").alias("n_groups"),
        F.col("n_violating").cast("long").alias("n_violating"),
        (F.col("n_violating") == 0).alias("holds"),
    )
