"""Deterministic sampling for training-data curation.

Spark's built-in ``DataFrame.sample`` is seeded per-partition, so its
output changes with partitioning/parallelism — useless for reproducible
corpus curation or cross-engine verification.  These operators instead
derive the keep/drop decision from a 16-bit md5 bucket of the row's key:

* identical across runs, parallelism levels, and engines (the DuckDB
  oracle reproduces the exact row set);
* a pure projection + filter — no shuffle, pushed into the scan stage,
  embarrassingly parallel at 10^12 rows;
* stratified form: per-stratum rates (downsample the over-represented
  language / source / quality band) expressed as a CASE column, still one
  scan and zero shuffles.

Bucket scheme: ``md5(key || ':' || seed)`` first 4 hex chars -> int in
[0, 65536); keep when ``bucket < round(fraction * 65536)``.  Rates are
therefore quantized to 1/65536 — documented contract, not a bug.

Hash-domain discipline (learned the hard way — see quota_cap /
assign_splits): operators that SELECT rows by hash must not share a hash
domain with downstream hash-keyed operators, or composition silently
correlates (quota survivors all landing in 'train'; two same-seed
samplers composing as min(rate1, rate2) instead of rate1*rate2).
quota_cap uses ``key:quota:seed``, assign_splits ``key:split:seed``,
mixing ``key:mix:seed``; the two samplers below share the bare
``key:seed`` domain BY DESIGN (a re-run of the same sample must be the
same set) — compose them with DIFFERENT seeds.
"""

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 1 << 16


def sample_bucket(key_col: str, seed: int = 0) -> Column:
    """Deterministic int bucket in [0, 65536) from a key column."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col(key_col), F.lit(str(seed)))), 1, 4),
        16,
        10,
    ).cast("int")


def _keep_threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return round(fraction * BUCKETS)


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Reproducible Bernoulli-style sample keyed on ``key_col``."""
    return df.where(sample_bucket(key_col, seed) < F.lit(_keep_threshold(fraction)))


def assign_splits(
    df: DataFrame,
    fractions: dict,
    key_col: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic, disjoint, exhaustive train/val/test assignment: each
    row gets exactly one split label from its md5 bucket and the
    cumulative fraction thresholds (insertion order of ``fractions``).

    The properties that matter at 10^12 rows: (a) pure projection — zero
    shuffles, assignment happens in the scan stage; (b) stable under
    repartitioning, re-runs, engines, and INCREMENTAL GROWTH — a doc's
    split never changes when more docs arrive, so yesterday's test set
    stays a test set (per-partition RNG splitting silently violates
    this); (c) leakage-auditable — membership is a pure function of
    (key, seed), so any engine can re-derive it.  Fractions must sum to
    1 (within bucket quantization); rates quantize to 1/65536 like the
    samplers above.

    The hash domain is operator-scoped (``key:split:seed``, vs the
    samplers' ``key:seed`` and quota_cap's ``key:quota:seed``): composed
    stages must be statistically independent, and a shared hash is
    silently NOT — quota_cap keeps each group's smallest-hash rows, so
    thresholding the same hash here would have sent every quota survivor
    to 'train' (caught in an end-to-end CLI run)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if not fractions:
        raise ValueError("fractions must name at least one split")
    bucket = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col(key_col).cast("string"), F.lit("split"), F.lit(str(seed))
                )
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("int")
    expr = None
    cum = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        cum += frac
        thr = _keep_threshold(cum)
        cond = bucket < F.lit(thr)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(items[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def quota_cap(
    df: DataFrame,
    group_col: str,
    cap: int,
    key_col: str = "doc_id",
    seed: int = 0,
    slack: float = 2.0,
) -> DataFrame:
    """Keep at most ``cap`` rows per group — deterministically the ``cap``
    rows with the smallest ``(md5(key:seed), key)`` — without ever sorting
    a whole group.

    Per-domain/source caps are a standard curation step (bound the share
    of any one crawl domain), and the naive implementation —
    ``row_number() OVER (PARTITION BY group ORDER BY hash)`` — serializes
    each group through one task: a 10^9-doc domain becomes a single-task
    sort.  This operator keeps the exact window semantics but bounds the
    window's input:

    1. per-group exact counts (map-side-combined aggregate, |groups| rows);
    2. groups with ``count <= cap`` pass through untouched — no window, no
       sort, just the count join;
    3. oversize groups are PREFILTERED to rows whose uniform md5 hash
       falls below ``slack * cap / count`` — expected ``slack * cap``
       candidates per group regardless of group size — and only those
       candidates enter the window.  Because the prefilter is a prefix of
       the window's own ordering, the smallest ``cap`` rows are provably
       inside it whenever it holds at least ``cap`` rows;
    4. the rare group whose prefilter under-covers (Chernoff-improbable
       at ``slack``>=2, but possible) falls back to the full window — the
       result is EXACT for every group, never "approximately cap".

    Determinism: the kept set depends only on (key, seed), never on
    partitioning or executor count.  Ties in the 60-bit hash order break
    on the key itself.  A NULL group is one group (null-safe joins
    throughout), matching SQL ``PARTITION BY``.  The hash domain is
    operator-scoped (``key:quota:seed``) so downstream hash-keyed stages
    (split assignment, sampling) stay independent of WHICH rows survived
    the cap — see assign_splits' docstring for the trap this avoids."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if slack <= 1.0:
        raise ValueError(f"slack must be > 1, got {slack}")
    hx = F.md5(
        F.concat_ws(
            ":", F.col(key_col).cast("string"), F.lit("quota"), F.lit(str(seed))
        )
    )
    hnum = F.conv(F.substring(hx, 1, 15), 16, 10).cast("double") / float(1 << 60)
    work = df.withColumn("_qhex", hx).withColumn("_qnum", hnum)

    def _gjoin(left: DataFrame, right: DataFrame, how: str) -> DataFrame:
        cond = left[group_col].eqNullSafe(right["_qg"])
        out = left.join(right, cond, how)
        return out.drop("_qg") if how == "inner" else out

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_gn"))
    work = _gjoin(work, counts.withColumnRenamed(group_col, "_qg"), "inner")

    small = work.where(F.col("_gn") <= cap)

    big = work.where(F.col("_gn") > cap)
    cand = big.where(F.col("_qnum") * F.col("_gn") < F.lit(float(slack) * cap))
    # exactness guard: a group is window-safe only if its candidate set
    # holds >= cap rows (then the cap smallest of the group are all in it,
    # because the prefilter is a prefix of the window's own hash order)
    safe_groups = (
        cand.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_cn"))
        .where(F.col("_cn") >= cap)
        .select(F.col(group_col).alias("_qg"))
    )
    w = Window.partitionBy(group_col).orderBy("_qhex", key_col)
    ranked_safe = (
        _gjoin(cand, safe_groups, "left_semi")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
    )
    # under-covered (or hash-degenerate) oversize groups: exact full window
    ranked_rest = (
        _gjoin(big, safe_groups, "left_anti")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
    )
    kept = small.unionByName(ranked_safe.drop("_rn")).unionByName(
        ranked_rest.drop("_rn")
    )
    return kept.drop("_qhex", "_qnum", "_gn")


def stratified_sample(
    df: DataFrame,
    fractions: dict,
    strata_col: str,
    key_col: str = "doc_id",
    default_fraction: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. ``{"en": 0.1, "de": 0.5}``).

    Strata absent from ``fractions`` keep ``default_fraction`` of rows; a
    NULL stratum is treated as absent.  The per-row threshold is a CASE
    expression, so the whole operator stays one filtered scan."""
    thr = F.lit(_keep_threshold(default_fraction))
    for value, fraction in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(_keep_threshold(fraction))
        ).otherwise(thr)
    return df.where(sample_bucket(key_col, seed) < thr)


def weighted_priority(key_col: str, weight_col: str, seed: int = 0) -> Column:
    """Sequential-Poisson priority ``u / w``: u is a 60-bit md5 fraction
    of ``key:wsample:seed`` mapped into (0, 1] (the +1 keeps a zero hash
    from producing priority 0 for every weight).  Pure double arithmetic
    over exact integer inputs — any engine reproduces it bit-for-bit."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(key_col), F.lit("wsample"), F.lit(str(seed)))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(float(1 << 60))
    return u / F.col(weight_col).cast("double")


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sample of ``n`` rows without replacement,
    inclusion probability approximately proportional to ``weight_col`` —
    Ohlsson's sequential Poisson sampling (the published πps estimator
    behind "priority sampling"): keep the n SMALLEST priorities
    ``u / w``.  High weight ⇒ small priority ⇒ kept.

    Why this formulation and not exact A-ES (``-ln(u)/w``): the log makes
    the key depend on libm rounding, which engines disagree on at the
    ulp level — sequential Poisson's key is two IEEE divisions over
    exact integers, so runs, parallelism levels, and engines (the DuckDB
    oracle) produce the IDENTICAL row set, which is what corpus curation
    needs from a sample.  The distributional price is documented by
    Ohlsson: inclusion probabilities are o(1)-close to exact πps.

    Scale shape: priority is a scan-stage projection (zero shuffles);
    the top-n is ``orderBy(...).limit(n)`` — Catalyst plans
    TakeOrderedAndProject (per-partition heads + driver merge), never a
    corpus sort.  Rows with NULL or non-positive weight are EXCLUDED
    (zero weight means inclusion probability zero by definition).
    Hash domain ``key:wsample:seed`` per the module's composition
    discipline.  Ties (two identical priorities) break on ``key_col``."""
    if n < 0:
        raise ValueError(f"weighted_sample: n must be >= 0, got {n}")
    pr = weighted_priority(key_col, weight_col, seed)
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_pr", pr)
        .orderBy("_pr", key_col)
        .limit(n)
        .drop("_pr")
    )


def split_leakage(
    pairs: DataFrame,
    splits: DataFrame,
    key_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Train/test contamination audit: near-duplicate pairs whose members
    landed in DIFFERENT splits — the leak a per-document split assignment
    cannot see (each doc's label is individually fine; the PAIR straddles
    the boundary, so the test set contains a near-copy of training data).

    ``pairs`` is any dedup-family output with ``id_a``/``id_b`` columns
    (MinHash/SimHash/Jaccard/edit-distance/embedding); ``splits`` maps
    ``key_col`` to ``split_col`` (``assign_splits`` output or any stored
    assignment).  Returns the straddling pairs with both labels appended.

    Scale shape: pairs are delta-sized by the dedup operators'
    construction and the split frame is a thin (key, label) projection,
    so the two key equi-joins are the whole cost; no corpus scan happens
    here at all.  The fix for flagged pairs is policy (move one member,
    drop one member, or re-split by component id via
    ``dedup.connected_components`` so whole duplicate CLUSTERS get one
    split — the component-keyed split is the preventive form of this
    audit)."""
    sa = splits.select(
        F.col(key_col).alias("id_a"), F.col(split_col).alias("split_a")
    )
    sb = splits.select(
        F.col(key_col).alias("id_b"), F.col(split_col).alias("split_b")
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .where(F.col("split_a") != F.col("split_b"))
    )


def component_splits(
    df: DataFrame,
    pairs: DataFrame,
    fractions: dict,
    key_col: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup-aware split assignment — the PREVENTIVE form of
    ``split_leakage``: every member of a duplicate cluster hashes on its
    connected-component id instead of its own, so a cluster lands in ONE
    split by construction and the leakage audit returns zero rows on the
    result (pytest-pinned).  Docs in no cluster keep their own key —
    for them this is exactly ``assign_splits`` (same hash domain, same
    thresholds), so adding pair evidence later only ever MOVES clustered
    docs, never reshuffles the singletons.

    Scale shape: component labels come from the O(log n) large-star/
    small-star rounds (dedup.connected_components — pairs are delta-sized
    dedup output); the label join is one key shuffle; the split itself
    stays a pure projection.  Consistency caveat documented: the split
    of a clustered doc depends on the cluster's min id, so growing a
    cluster can move it between releases — that is the price of the
    no-leakage guarantee and the reason releases version their pair
    evidence alongside the corpus."""
    from .dedup import connected_components

    labels = connected_components(pairs, id_a, id_b)
    j = df.join(
        labels.select(F.col("id").alias(key_col), "comp_id"), key_col, "left"
    )
    skey = F.coalesce(F.col("comp_id"), F.col(key_col)).cast("string")
    out = assign_splits(
        j.withColumn("_skey", skey), fractions, key_col="_skey", seed=seed,
        split_col=split_col,
    )
    return out.drop("_skey")
