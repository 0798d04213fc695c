"""spark-submit entrypoint for the ingest-monitoring pass — the
observability side of the validation engine: before (or instead of)
re-validating every value, check that the feed itself is healthy.

Two launches:

    # once, over a healthy reference window: persist the volume baseline
    spark-submit --py-files dist/schemasaurus_spark.zip jobs/monitor_submit.py \
        --input /data/reference_window --output /data/baselines \
        --make-volume-baseline [--ts-col ts] [--bucket hour]

    # per increment: freshness + volume (+ optional Benford) reports
    spark-submit --py-files dist/schemasaurus_spark.zip jobs/monitor_submit.py \
        --input  /data/increment \
        --output /data/monitor_out \
        [--ts-col ts] [--by source]        (freshness grouping column)
        [--as-of "2026-08-19 00:00:00"]    (default: the increment's own max)
        [--volume-baseline /data/baselines/volume_baseline]
        [--bucket hour] [--z 3.0]
        [--benford-col amount]             (positive integral column)
        [--fail-on-anomaly]                (exit 2 when anything flags —
                                            the CI-gate shape)

Artifacts under --output (parquet dirs; summary.json via the Hadoop FS
API so s3a/hdfs outputs work):
    freshness/  [volume/]  [benford/]  summary.json

Cost model: freshness is ONE map-side-combined groupBy; volume is one
groupBy over the bounded bucket domain plus a metadata-sized spine;
Benford is one groupBy over a nine-value domain.  Nothing here shuffles
the corpus, and the baseline is one row loaded driver-side.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

try:
    import schemasaurus_spark  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_session() -> SparkSession:
    return (
        SparkSession.builder.appName("schemasaurus_spark.monitor")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--ts-col", default="ts")
    ap.add_argument("--bucket", default="hour")
    ap.add_argument("--make-volume-baseline", action="store_true")
    ap.add_argument("--by", default=None)
    ap.add_argument("--as-of", default=None)
    ap.add_argument("--volume-baseline", default=None)
    ap.add_argument("--z", type=float, default=3.0)
    ap.add_argument("--benford-col", default=None)
    ap.add_argument("--fail-on-anomaly", action="store_true")
    args = ap.parse_args()

    from schemasaurus_spark.operators.monitor import freshness_profile
    from schemasaurus_spark.operators.stats import benford_profile, benford_verdict
    from schemasaurus_spark.sources.io import write_text_file
    from schemasaurus_spark.streaming.volume_stream import (
        volume_baseline,
        volume_report,
    )

    spark = build_session()
    df = spark.read.parquet(args.input)

    if args.make_volume_baseline:
        out = os.path.join(args.output, "volume_baseline")
        volume_baseline(df, args.ts_col, args.bucket).write.mode(
            "overwrite"
        ).parquet(out)
        row = spark.read.parquet(out).collect()[0].asDict()
        print(json.dumps({"volume_baseline": row}))
        spark.stop()
        sys.exit(0)

    summary: dict = {"config": vars(args)}
    flagged = False

    fresh = freshness_profile(df, args.ts_col, by=args.by, as_of=args.as_of)
    fresh.write.mode("overwrite").parquet(os.path.join(args.output, "freshness"))
    fr = spark.read.parquet(os.path.join(args.output, "freshness"))
    agg = fr.agg(
        F.count(F.lit(1)).alias("groups"), F.max("lag_seconds").alias("max_lag")
    ).collect()[0]
    summary["freshness"] = {
        "groups": agg["groups"],
        "max_lag_seconds": agg["max_lag"],
    }

    if args.volume_baseline:
        base = spark.read.parquet(args.volume_baseline).collect()[0].asDict()
        rep = volume_report(df, args.ts_col, args.bucket, base, args.z)
        rep.write.mode("overwrite").parquet(os.path.join(args.output, "volume"))
        vr = spark.read.parquet(os.path.join(args.output, "volume"))
        n_anom = vr.where("anomalous").count()
        summary["volume"] = {
            "buckets": vr.count(),
            "anomalous_buckets": n_anom,
            "baseline": base,
        }
        flagged = flagged or n_anom > 0

    if args.benford_col:
        benford_profile(df, args.benford_col).write.mode("overwrite").parquet(
            os.path.join(args.output, "benford")
        )
        v = benford_verdict(df, args.benford_col).collect()[0]
        summary["benford"] = {
            "n": v["n"],
            "chi2": v["chi2"],
            "flagged": bool(v["flagged"]),
        }
        flagged = flagged or bool(v["flagged"])

    summary["flagged"] = flagged
    write_text_file(
        spark,
        os.path.join(args.output, "summary.json"),
        json.dumps(summary, indent=2, default=str),
    )
    print(json.dumps(summary, default=str))
    spark.stop()
    sys.exit(2 if (args.fail_on_anomaly and flagged) else 0)


if __name__ == "__main__":
    main()
