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

__all__ = ["iqr_fences", "iqr_outliers", "winsor_bounds", "winsorize"]


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


def winsor_bounds(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lo_bp: int = 100,
    hi_bp: int = 9900,
) -> DataFrame:
    """Per-group EXACT order-statistic clamp bounds ``(..., lo, hi, n)``.

    Unlike the interpolated IQR fences above, the bounds here are VALUES
    PICKED FROM THE DATA — the k-th smallest with ``k = ceil(n*bp/10000)``
    (integer arithmetic, clamped to [1, n]) — so there is zero float
    math: the operator is bit-exact in any engine even on doubles, which
    is what lets the repair below be oracle-hashed.  This is the classic
    winsorization definition (clamp to the empirical 1st/99th
    percentile, inclusive).

    Scale shape: one map-side-combined ``groupBy(group, value)`` count,
    window cumsums per group over the distinct-value table, and a
    min-filter — bounds output is |groups| rows, broadcastable."""
    from pyspark.sql import Window

    group_cols = group_cols or []
    if not (0 <= int(lo_bp) <= int(hi_bp) <= 10000):
        raise ValueError(
            f"winsor_bounds: need 0 <= lo_bp <= hi_bp <= 10000, got {lo_bp}, {hi_bp}"
        )
    per = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, F.col(value_col).alias("_v"))
        .agg(F.count(F.lit(1)).alias("_n_eq"))
    )
    w = (
        Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    ).orderBy(F.col("_v").asc()).rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        *group_cols,
        "_v",
        F.sum("_n_eq").over(w).alias("_cum"),
        F.sum("_n_eq").over(
            (Window.partitionBy(*group_cols) if group_cols else Window.partitionBy())
            .orderBy(F.col("_v").asc())
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("_n"),
    )
    rank_lo = F.greatest(F.expr(f"(_n * {int(lo_bp)} + 9999) DIV 10000"), F.lit(1))
    rank_hi = F.least(
        F.greatest(F.expr(f"(_n * {int(hi_bp)} + 9999) DIV 10000"), F.lit(1)),
        F.col("_n"),
    )
    base = cum.groupBy(*group_cols) if group_cols else cum.groupBy()
    return base.agg(
        F.min(F.when(F.col("_cum") >= rank_lo, F.col("_v"))).alias("lo"),
        F.min(F.when(F.col("_cum") >= rank_hi, F.col("_v"))).alias("hi"),
        F.max("_n").alias("n"),
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lo_bp: int = 100,
    hi_bp: int = 9900,
    out_col: str | None = None,
) -> DataFrame:
    """Numeric REPAIR: clamp ``value_col`` to its group's exact
    order-statistic bounds — the repair twin of ``iqr_outliers`` (that
    one flags, this one fixes).  Appends ``out_col`` (default
    ``<col>_w``) and ``winsor_side`` ('low' | 'high' | NULL untouched);
    NULL values pass through unclamped.  Bounds come from
    :func:`winsor_bounds` and are broadcast back, so the corpus sees one
    scan plus a map-side join."""
    group_cols = group_cols or []
    out_col = out_col or f"{value_col}_w"
    bounds = winsor_bounds(df, value_col, group_cols, lo_bp, hi_bp)
    joined = (
        df.join(F.broadcast(bounds), group_cols, "left")
        if group_cols
        else df.crossJoin(F.broadcast(bounds))
    )
    v = F.col(value_col)
    side = F.when(v < F.col("lo"), F.lit("low")).when(
        v > F.col("hi"), F.lit("high")
    )
    clamped = (
        F.when(v.isNull(), v)
        .when(v < F.col("lo"), F.col("lo"))
        .when(v > F.col("hi"), F.col("hi"))
        .otherwise(v)
    )
    return (
        joined.withColumn(out_col, clamped)
        .withColumn("winsor_side", side)
        .drop("lo", "hi", "n")
    )


def percentile_bands(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    qs_bp: tuple[int, ...] = (5000, 9500, 9900),
) -> DataFrame:
    """Per-group EXACT order-statistic percentile bands — the SLO-style
    monitoring readout (p50/p95/p99 per service per day) built on the
    same k-th-smallest machinery as ``winsor_bounds``: every band value
    is a VALUE PICKED FROM THE DATA (k = ceil(n*q/10000), all-integer
    rank math, no interpolation), so the table is bit-exact in any
    engine even on doubles.

    Output ``(*group_cols, p<q> per requested q, n)`` with columns named
    ``p5000`` etc. (basis-point suffix keeps the naming exact).

    Scale shape (the winsor_bounds shape): one map-side-combined
    ``groupBy(group, value)`` count, per-group window cumsums over the
    DISTINCT-value table (never the raw rows), one aggregate picking all
    requested ranks in a single pass; output is |groups| rows.
    """
    from pyspark.sql import Window

    group_cols = group_cols or []
    qs = [int(q) for q in qs_bp]
    if not qs or any(not (0 <= q <= 10000) for q in qs):
        raise ValueError(f"percentile_bands: qs_bp must be within [0, 10000], got {qs_bp}")
    if len(set(qs)) != len(qs):
        raise ValueError(f"percentile_bands: duplicate quantile {qs_bp}")
    per = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, F.col(value_col).alias("_v"))
        .agg(F.count(F.lit(1)).alias("_n_eq"))
    )
    part = (
        Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    )
    cum = per.select(
        *group_cols,
        "_v",
        F.sum("_n_eq")
        .over(part.orderBy(F.col("_v").asc()).rowsBetween(Window.unboundedPreceding, 0))
        .alias("_cum"),
        F.sum("_n_eq")
        .over(
            part.orderBy(F.col("_v").asc()).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("_n"),
    )
    base = cum.groupBy(*group_cols) if group_cols else cum.groupBy()
    aggs = []
    for q in qs:
        rank = F.least(
            F.greatest(F.expr(f"(_n * {q} + 9999) DIV 10000"), F.lit(1)),
            F.col("_n"),
        )
        aggs.append(
            F.min(F.when(F.col("_cum") >= rank, F.col("_v"))).alias(f"p{q}")
        )
    aggs.append(F.max("_n").alias("n"))
    return base.agg(*aggs)
