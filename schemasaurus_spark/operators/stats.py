"""Per-column statistics for the validation pass (SURVEY.md §2D):
null rate, distinct count (exact for the correctness gate, HLL++ for scale),
min/max, length histograms, category counts.

Everything is a single groupBy-free aggregate or a map-side-combinable
groupBy — one scan, partial aggregation before any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_stats(df: DataFrame, columns: list[str], approx: bool = False) -> DataFrame:
    """One output row per column: n, nulls, null_rate, distinct, min, max.

    ``approx=True`` switches distinct counting to HyperLogLog++
    (``approx_count_distinct``, rsd 5%) — the 100TB path; exact mode is used
    where results must match a SQL oracle bit-for-bit.
    """
    aggs = []
    for c in columns:
        distinct = (
            F.approx_count_distinct(c).alias(f"{c}__distinct")
            if approx
            else F.count_distinct(F.col(c)).alias(f"{c}__distinct")
        )
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            distinct,
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    # unpivot to (column, n, nulls, null_rate, distinct, min, max)
    rows = []
    for c in columns:
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__n").alias("n"),
                F.col(f"{c}__nulls").alias("nulls"),
                (F.col(f"{c}__nulls") / F.col(f"{c}__n")).alias("null_rate"),
                F.col(f"{c}__distinct").alias("distinct"),
                F.col(f"{c}__min").alias("min"),
                F.col(f"{c}__max").alias("max"),
            )
        )
    return (
        wide.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.*")
    )


def length_histogram(
    df: DataFrame, col: str, lo: int, hi: int, n_buckets: int,
    length_of: bool = False,
) -> DataFrame:
    """width_bucket histogram; ``length_of=True`` measures string length."""
    v = F.length(F.col(col)) if length_of else F.col(col)
    return (
        df.where(F.col(col).isNotNull())
        .select(F.width_bucket(v.cast("double"), F.lit(float(lo)), F.lit(float(hi)), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def category_counts(df: DataFrame, col: str) -> DataFrame:
    """Category frequency table — the chi-square drift input."""
    return df.groupBy(F.col(col).alias("category")).agg(F.count(F.lit(1)).alias("cnt"))


def corpus_rollup(
    df: DataFrame,
    dims: list[str],
    measure_col: str = "n_chars",
    text_col: str = "text",
    cube: bool = False,
) -> DataFrame:
    """Multi-dimensional quality profile via ROLLUP (or CUBE) over the
    grouping dims: per (dim..., aggregation level) one row of
    ``gid, n_docs, n_texts, total_measure, avg_measure``.

    The curation dashboard shape — per-source, per-(source, lang), and
    corpus-total quality in ONE pass.  Grouping sets are strictly better
    at scale than the K separate groupBys they replace: Spark expands the
    sets map-side and partially aggregates each, so the input is scanned
    once and the shuffle carries |groups summed over levels| rows, all
    map-side combined.  ``gid`` is ``grouping_id()`` (bit per dim,
    leftmost dim = most significant), which disambiguates a genuinely
    NULL dim value from a rolled-up level — never rely on the NULL
    placeholder alone.  avg is rounded to 6 places so the cross-engine
    hash compares IEEE-stable text."""
    if not dims:
        raise ValueError("dims must name at least one grouping column")
    grouped = df.cube(*dims) if cube else df.rollup(*dims)
    return grouped.agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.col(text_col)).alias("n_texts"),
        F.sum(F.col(measure_col)).alias("total_measure"),
        F.round(F.avg(F.col(measure_col)), 6).alias("avg_measure"),
    )


def quantile_vector(df: DataFrame, col: str, probs: list[float], rsd: float = 0.01):
    """Approximate quantile vector (the KS drift input); driver-side list."""
    return df.stat.approxQuantile(col, probs, rsd)


def correlation_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation over INTEGRAL columns with engine-
    exact arithmetic: ``(col_x, col_y, n, r)`` per unordered pair.

    Why not ``F.corr``: streaming covariance implementations accumulate
    doubles in partition order, so the result varies at the ulp level
    across runs and engines — unverifiable.  Here the sufficient
    statistics (n, Sx, Sy, Sxy, Sxx, Syy) are EXACT decimal(38,0) sums
    of integer products (map-side combinable, order-free), and r is one
    final double formula ``(n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) *
    sqrt(n*Syy - Sy^2))`` — sqrt and division are correctly-rounded IEEE
    ops, so any engine reproduces r bit-for-bit.  Integral columns only
    (float inputs would need order-dependent float sums, the exact thing
    this avoids); NULLs are handled pairwise (a row counts for a pair
    iff both sides are non-null); a zero-variance side yields NULL r.

    Scale shape: ONE ``df.agg`` computes all pairs' statistics in a
    single scan (6 * k(k-1)/2 combinable aggregates); the r arithmetic
    runs on the 1-row result; output is metadata-sized.  Bound: each
    ``n * Sxy`` must fit decimal(38) — holds to ~10^12 rows of 32-bit
    values."""
    from pyspark.sql import types as T

    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    fields = {f.name: f.dataType for f in df.schema.fields}
    unknown = set(cols) - set(fields)
    if unknown:
        raise ValueError(f"correlation_profile: no such column(s) {sorted(unknown)}")
    bad = [c for c in cols if not isinstance(fields[c], integral)]
    if bad:
        raise ValueError(f"correlation_profile: non-integral column(s) {bad}")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    if not pairs:
        raise ValueError("correlation_profile: need at least two columns")

    dec = "decimal(38,0)"
    zero = F.lit(0).cast(dec)
    aggs = []
    for i, (x, y) in enumerate(pairs):
        both = F.col(x).isNotNull() & F.col(y).isNotNull()
        dx = F.when(both, F.col(x).cast(dec))
        dy = F.when(both, F.col(y).cast(dec))
        aggs += [
            F.coalesce(F.sum(F.when(both, 1).cast(dec)), zero).alias(f"_n_{i}"),
            F.coalesce(F.sum(dx), zero).alias(f"_sx_{i}"),
            F.coalesce(F.sum(dy), zero).alias(f"_sy_{i}"),
            F.coalesce(F.sum(dx * dy), zero).alias(f"_sxy_{i}"),
            F.coalesce(F.sum(dx * dx), zero).alias(f"_sxx_{i}"),
            F.coalesce(F.sum(dy * dy), zero).alias(f"_syy_{i}"),
        ]
    row = df.agg(*aggs)

    structs = []
    for i, (x, y) in enumerate(pairs):
        n = F.col(f"_n_{i}")
        sx, sy = F.col(f"_sx_{i}"), F.col(f"_sy_{i}")
        sxy, sxx, syy = F.col(f"_sxy_{i}"), F.col(f"_sxx_{i}"), F.col(f"_syy_{i}")
        num = (n * sxy - sx * sy).cast("double")
        denx = F.sqrt((n * sxx - sx * sx).cast("double"))
        deny = F.sqrt((n * syy - sy * sy).cast("double"))
        r = F.when((denx > 0) & (deny > 0), num / (denx * deny))
        structs.append(
            F.struct(
                F.lit(x).alias("col_x"),
                F.lit(y).alias("col_y"),
                n.cast("long").alias("n"),
                r.alias("r"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("_p")).select(
        "_p.col_x", "_p.col_y", "_p.n", "_p.r"
    )


def category_concentration(df: DataFrame, cols: list[str]) -> DataFrame:
    """Distribution-concentration profile per categorical column:
    ``(column, n, n_distinct, max_share, gini, entropy, norm_entropy)``
    — the "is this column degenerate / near-constant / near-uniform?"
    signal that null-rate and cardinality alone cannot give (a column
    with 1,000 distinct values and 99% mass on one of them gates very
    differently from a uniform one).

    gini = 1 - sum(p^2) (impurity), entropy in nats, norm_entropy =
    entropy / ln(n_distinct) in [0, 1] (NULL for single-category
    columns).  NULL cells are excluded (concentration of the VALUES;
    missingness is null_rate's job).  Values are rounded to 6 decimals:
    the count arithmetic is exact integers, but sum-of-p·ln(p) folds
    floats whose last-ulp order varies by engine — round-6 is the
    engine-parity discipline (same as the quartiles family).

    Scale shape: one map-side-combined ``groupBy(col)`` per column over
    a thin projection, then the concentration fold runs over the
    category table (vocabulary-sized).  Columns profile independently;
    a genuinely high-cardinality column's category table is its own
    warning (use suggest/stats cardinality first)."""
    from functools import reduce as _reduce

    frames = []
    for c in cols:
        counts = (
            df.where(F.col(c).isNotNull())
            .groupBy(F.col(c).alias("_v"))
            .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        )
        p = F.col("_c") / F.col("_n")
        agg = (
            counts.crossJoin(
                F.broadcast(counts.agg(F.coalesce(F.sum("_c"), F.lit(0)).alias("_n")))
            )
            .agg(
                F.lit(c).alias("column"),
                F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n"),
                F.count(F.lit(1)).cast("long").alias("n_distinct"),
                F.round(F.max(p), 6).alias("max_share"),
                F.round(1 - F.sum(p * p), 6).alias("gini"),
                # + 0.0 normalizes the constant-column -0.0 to +0.0 (IEEE:
                # -0.0 + 0.0 = +0.0, identity elsewhere) — string canons
                # would otherwise disagree on the sign of zero
                F.round(-F.sum(p * F.log(p)) + F.lit(0.0), 6).alias("entropy"),
            )
            .withColumn(
                "norm_entropy",
                F.when(
                    F.col("n_distinct") > 1,
                    F.round(
                        F.col("entropy") / F.log(F.col("n_distinct").cast("double")), 6
                    ),
                ),
            )
        )
        frames.append(agg)
    return _reduce(lambda a, b: a.unionByName(b), frames)


def benford_profile(df: DataFrame, col: str) -> DataFrame:
    """First-significant-digit distribution audit vs Benford's law:
    ``(digit, cnt, share, expected_p, chi2_term)`` for digits 1-9 — the
    classic fabricated-/truncated-data signal for columns of naturally
    scale-spanning positive numbers (amounts, populations, byte sizes):
    genuine ones lean log-uniform (P(d) = log10(1+1/d), 30.1% leading 1s);
    a uniform or hand-entered column flunks the chi-square immediately.
    Constant-domain complement to ``category_concentration``: that asks
    "is the distribution degenerate?", this asks "does it look grown or
    minted?".  Reference tie-in: schemasaurus has no statistics layer at
    all — like KS/PSI drift this extends the north rule's distribution
    checks (BASELINE.json) past the reference's per-document scope.

    Caller contract: ``col`` must be POSITIVE INTEGRAL (cast/floor
    upstream) — the first digit is read from the decimal string, which is
    engine-identical for bigints but not for float formatting.  Zero-count
    digits still emit rows (a chi-square needs all 9 cells).  Floats are
    rounded to 6 decimals at each fold (expected_p first, then the terms
    computed FROM the rounded p) — the quartiles-family parity discipline.

    Scale shape: one map-side-combined groupBy over a NINE-value key
    domain (no skew cliff possible — every partial aggregate is ≤9 rows),
    one broadcast of the 1-row total, one join against the constant
    9-row digit frame.  The scan is a single thin projection.
    """
    spark = df.sparkSession
    vals = df.select(F.col(col).cast("long").alias("_v")).where(F.col("_v") > 0)
    counts = (
        vals.select(
            F.substring(F.col("_v").cast("string"), 1, 1).cast("int").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    digits = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    total = vals.agg(F.count(F.lit(1)).alias("_n"))
    out = (
        digits.join(counts, "digit", "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
        .crossJoin(F.broadcast(total))
        .withColumn(
            "expected_p",
            F.round(F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0)), 6),
        )
    )
    n = F.col("_n")
    exp_cnt = n * F.col("expected_p")
    return out.select(
        "digit",
        "cnt",
        F.when(n > 0, F.round(F.col("cnt") / n, 6)).alias("share"),
        "expected_p",
        F.when(
            n > 0, F.round(F.pow(F.col("cnt") - exp_cnt, 2) / exp_cnt, 6)
        ).alias("chi2_term"),
    ).orderBy("digit")


def benford_verdict(df: DataFrame, col: str, critical: float = 15.507) -> DataFrame:
    """One-row gate over ``benford_profile``: ``(n, chi2, flagged)``.
    Default critical value is the chi-square 95th percentile at 8 degrees
    of freedom (9 cells - 1) — flagged=true means the leading-digit
    distribution deviates from Benford at alpha=0.05.  Judgement aid, not
    proof: many legitimate columns (bounded ranges, assigned IDs) are NOT
    Benford-distributed; gate only columns where the law applies."""
    prof = benford_profile(df, col)
    return prof.agg(
        F.sum("cnt").alias("n"),
        F.round(F.sum("chi2_term"), 6).alias("chi2"),
        (F.sum("chi2_term") > critical).alias("flagged"),
    )
