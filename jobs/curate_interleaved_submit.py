"""spark-submit entrypoint for the INTERLEAVED curation pipeline.

    spark-submit --py-files dist/schemasaurus_spark.zip \\
        jobs/curate_interleaved_submit.py \\
        --input   /data/documents          (parquet dir: doc_id, spans) \\
        --output  /data/curated_out        (curated/ parquet + report.json) \\
        [--catalog /data/media_catalog]    (media_ref dimension -> referential repair) \\
        [--min-docs-boilerplate 5] [--min-text-chars 20] [--with-counts]

Runs plans/interleaved_pipeline.py — span repair, cross-document
span-boilerplate removal, trainability gate, training-text render —
over the north-rule interleaved table and writes the training-ready
corpus (doc_id, training_text, media_refs_csv, char/placeholder
accounting) plus a JSON report.  Without --with-counts the whole
pipeline is one lazy plan executed by the single corpus write; the
row count rides that write as an Observation (no extra scan).  Cluster
sizing comes from spark-submit's conf; this script sets only
engine-level SQL conf (AQE for the boilerplate-profile shuffles).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

try:
    import schemasaurus_spark  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_session() -> SparkSession:
    return (
        SparkSession.builder.appName("schemasaurus_spark.curate_interleaved")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--catalog", default=None)
    ap.add_argument("--min-docs-boilerplate", type=int, default=5)
    ap.add_argument("--min-text-chars", type=int, default=20)
    ap.add_argument("--with-counts", action="store_true")
    args = ap.parse_args()

    from schemasaurus_spark.plans.interleaved_pipeline import InterleavedPipeline
    from schemasaurus_spark.sources.io import write_text_file

    spark = build_session()
    docs = spark.read.parquet(args.input)
    catalog = spark.read.parquet(args.catalog) if args.catalog else None
    pipe = InterleavedPipeline(
        min_docs_boilerplate=args.min_docs_boilerplate,
        min_text_chars=args.min_text_chars,
    )

    report: dict = {"config": vars(args)}
    out_path = os.path.join(args.output, "curated")
    if args.with_counts:
        curated, counts = pipe.run_with_counts(docs, catalog)
        report["stage_counts"] = counts
        curated.write.mode("overwrite").parquet(out_path)
        report["curated_rows"] = counts["curated_rows"]
    else:
        curated = pipe.run(docs, catalog)
        obs = Observation("curated")
        curated.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(out_path)
        report["curated_rows"] = int(obs.get["n"])

    write_text_file(
        spark,
        os.path.join(args.output, "report.json"),
        json.dumps(report, indent=2),
    )
    print(json.dumps(report))
    spark.stop()
    sys.exit(0)


if __name__ == "__main__":
    main()
