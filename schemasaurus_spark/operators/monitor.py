"""Pipeline-observability operators: ingest FRESHNESS and VOLUME anomaly
detection — the Monte-Carlo/Soda-style monitoring family that tells an
operator the feed is stale or bursting BEFORE any value-level check fires.

Reference tie-in: schemasaurus validates one document against one schema;
it has no notion of a feed.  Like the drift family (drift.py,
snapshot.py), these extend the north rule's distribution checks
(BASELINE.json) to the table's TEMPORAL axis: "is every source still
arriving?" (freshness) and "did a source double or vanish this hour?"
(volume).

Determinism discipline (shared with the quartiles family): all statistics
fold EXACT integers (microsecond epochs, bucket counts), every float is
produced by one fixed IEEE expression over those integers, and outputs
are rounded to 6 decimals — so any engine replaying the same arithmetic
chain hash-matches.  No wall clock anywhere: freshness lag is measured
against the corpus's own max timestamp unless the caller passes an
explicit ``as_of`` — a monitoring run pinned to "now" is unreproducible
by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def freshness_profile(
    df: DataFrame,
    ts_col: str,
    by: str | None = None,
    as_of: str | None = None,
) -> DataFrame:
    """Per-group arrival profile: ``(group?, n, first_ts, last_ts,
    lag_seconds, span_seconds, mean_interarrival_seconds)``.

    ``lag_seconds`` is staleness of the group's newest row relative to
    ``as_of`` (an ISO timestamp string) or, when omitted, to the NEWEST
    ROW ANYWHERE — "which sources have stopped arriving?" relative to the
    feed itself, reproducible across reruns.  ``mean_interarrival`` is
    span/(n-1), NULL for single-row groups.

    Scale shape: one map-side-combined groupBy over the group key (min/
    max/count all combine), output |groups| rows; the global as_of is an
    aggregate OVER THAT OUTPUT (metadata-sized), broadcast back — the
    corpus is scanned exactly once.
    """
    keys = [by] if by else []
    g = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
    ).withColumn(
        # cast: parquet timestamps read as TIMESTAMP_NTZ, which
        # unix_micros rejects; the session tz is pinned UTC so the
        # NTZ->LTZ cast is deterministic
        "_first_us",
        F.unix_micros(F.col("first_ts").cast("timestamp")),
    ).withColumn("_last_us", F.unix_micros(F.col("last_ts").cast("timestamp")))
    if as_of is not None:
        g = g.withColumn("_as_of_us", F.unix_micros(F.to_timestamp(F.lit(as_of))))
    else:
        g = g.crossJoin(F.broadcast(g.agg(F.max("_last_us").alias("_as_of_us"))))
    span = F.col("_last_us") - F.col("_first_us")
    return g.select(
        *keys,
        "n",
        "first_ts",
        "last_ts",
        F.round((F.col("_as_of_us") - F.col("_last_us")) / 1000000.0, 6).alias(
            "lag_seconds"
        ),
        F.round(span / 1000000.0, 6).alias("span_seconds"),
        F.when(
            F.col("n") > 1, F.round(span / (F.col("n") - 1) / 1000000.0, 6)
        ).alias("mean_interarrival_seconds"),
    )


def bucket_counts_filled(df: DataFrame, ts_col: str, bucket: str = "hour") -> DataFrame:
    """Zero-filled ``(bucket_ts, cnt)`` over the frame's own time span —
    the shared primitive of batch ``volume_anomalies`` and the streaming
    volume monitor.  One map-side-combined groupBy on the truncated
    timestamp plus one sequence() explode of a 1-row min/max aggregate."""
    counts = (
        df.select(F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"))
        .groupBy("bucket_ts")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rng = counts.agg(F.min("bucket_ts").alias("_lo"), F.max("bucket_ts").alias("_hi"))
    spine = rng.select(
        F.explode(F.expr(f"sequence(_lo, _hi, interval 1 {bucket})")).alias(
            "bucket_ts"
        )
    )
    return spine.join(counts, "bucket_ts", "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0).cast("long"))
    )


def volume_anomalies(
    df: DataFrame,
    ts_col: str,
    bucket: str = "hour",
    z: float = 3.0,
) -> DataFrame:
    """Row-volume anomaly detection over zero-filled time buckets:
    ``(bucket_ts, cnt, mean, stddev, zscore, anomalous)`` — one row per
    ``bucket`` (hour/day/...) from the corpus's first bucket to its last,
    MISSING buckets included as cnt=0 (a silent feed outage looks exactly
    like no row at all; an observed-buckets-only monitor can never see
    it).  ``anomalous`` flags |zscore| > z against the population
    mean/stddev of all bucket counts; zscore is NULL (never anomalous)
    when stddev is 0.

    Scale shape: one map-side-combined groupBy on the truncated timestamp
    (bucket domain = time range / bucket width — bounded, not data-sized);
    the spine is one `sequence()` explode of a 1-row min/max aggregate;
    mean/stddev fold exact integer sums (S1, S2) over the bucket table
    (metadata-sized).  The corpus is scanned exactly once.
    """
    filled = bucket_counts_filled(df, ts_col, bucket)
    stats = filled.agg(
        F.count(F.lit(1)).alias("_nb"),
        F.sum("cnt").alias("_s1"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("_s2"),
    )
    w = filled.crossJoin(F.broadcast(stats))
    mean_d = F.col("_s1") / F.col("_nb")
    # greatest(..., 0): the exact-integer folds make var 0.0 exactly for a
    # constant column, but a near-constant one can land an ulp below zero
    # and sqrt(negative) is NaN here / an error in other engines
    var_d = F.greatest(
        F.col("_s2") / F.col("_nb") - mean_d * mean_d, F.lit(0.0)
    )
    std_d = F.sqrt(var_d)
    zscore = F.when(std_d > 0, F.round((F.col("cnt") - mean_d) / std_d, 6))
    return w.select(
        "bucket_ts",
        "cnt",
        F.round(mean_d, 6).alias("mean"),
        F.round(std_d, 6).alias("stddev"),
        zscore.alias("zscore"),
        F.coalesce(F.abs(zscore) > z, F.lit(False)).alias("anomalous"),
    )
