"""Per-group IQR outlier detection (Tukey fences): the anomaly-flagging
step of a validation pass — "which rows are numerically implausible for
their segment?" — complementing the distribution-drift family (drift.py
asks whether the WHOLE distribution moved; this asks which individual
rows sit outside it).

Construction: per group, q1/q3 via exact ``percentile`` (linear
interpolation — DuckDB's ``quantile_cont`` is the same definition, which
is what makes the operator verifiable), rounded to 6 decimals to absorb
engine ulp drift, then fences ``[q1 - k*iqr, q3 + k*iqr]`` in plain IEEE
arithmetic; rows outside are flagged with the side they violated.

Scale shape: the fences frame is |groups| rows — computed once, then
BROADCAST back, so the corpus itself sees one scan and a map-side join
+ filter (no corpus shuffle at all when the flag pass is what you run).
Exact percentile buffers each group's values in the aggregate state —
fine for bounded groups and the verifiable contract; at 10^12 rows pass
``approx=True`` to switch to ``approx_percentile`` (bounded-memory GK
sketch, same plan shape) — the fences move within sketch error, the
flagging logic is unchanged.  NULL values are never outliers (nothing
to compare); a group with constant values has iqr 0 and flags exactly
the rows unequal to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["iqr_fences", "iqr_outliers"]


def iqr_fences(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: float = 1.5,
    approx: bool = False,
) -> DataFrame:
    """Per-group ``(..., q1, q3, lo, hi)`` Tukey fences."""
    group_cols = group_cols or []
    pct = "approx_percentile" if approx else "percentile"
    q1 = F.round(F.expr(f"{pct}({value_col}, 0.25)"), 6)
    q3 = F.round(F.expr(f"{pct}({value_col}, 0.75)"), 6)
    base = df.groupBy(*group_cols) if group_cols else df.groupBy()
    fences = base.agg(q1.alias("q1"), q3.alias("q3"))
    iqr = F.col("q3") - F.col("q1")
    return fences.select(
        *group_cols,
        "q1",
        "q3",
        (F.col("q1") - F.lit(float(k)) * iqr).alias("lo"),
        (F.col("q3") + F.lit(float(k)) * iqr).alias("hi"),
    )


def iqr_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: float = 1.5,
    approx: bool = False,
) -> DataFrame:
    """Rows of ``df`` falling outside their group's Tukey fences, with a
    ``side`` column ('low' | 'high') and the violated ``fence`` value."""
    group_cols = group_cols or []
    fences = iqr_fences(df, value_col, group_cols, k, approx)
    joined = (
        df.join(F.broadcast(fences), group_cols)
        if group_cols
        else df.crossJoin(F.broadcast(fences))
    )
    v = F.col(value_col)
    side = F.when(v < F.col("lo"), F.lit("low")).when(
        v > F.col("hi"), F.lit("high")
    )
    fence = F.when(v < F.col("lo"), F.col("lo")).when(v > F.col("hi"), F.col("hi"))
    return (
        joined.withColumn("side", side)
        .withColumn("fence", fence)
        .where(F.col("side").isNotNull())
        .drop("q1", "q3", "lo", "hi")
    )
