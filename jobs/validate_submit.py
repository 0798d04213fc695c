"""spark-submit entrypoint for the north-rule validation pass.

    spark-submit --py-files dist/schemasaurus_spark.zip jobs/validate_submit.py \
        --input  /data/documents        (parquet dir or Iceberg table id) \
        --output /data/validation_out   (violations/ + manifests/ + verdicts.json) \
        [--schema schema.json] [--files-per-unit 16] [--resume]

On a cluster the session comes from spark-submit's conf (master, executor
counts, memory); this script only sets engine-level SQL conf.  Without
--resume the output dir's manifests are ignored and everything reruns.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

from pyspark.sql import SparkSession


def build_session() -> SparkSession:
    return (
        SparkSession.builder.appName("schemasaurus_spark.validate")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--schema", default=None, help="JSON Schema file (default: north-rule document schema)")
    ap.add_argument("--files-per-unit", type=int, default=16)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from schemasaurus_spark.runstate import ResumableValidation

    schema = None
    if args.schema:
        with open(args.schema) as f:
            schema = json.load(f)

    if not args.resume and os.path.isdir(os.path.join(args.output, "manifests")):
        shutil.rmtree(os.path.join(args.output, "manifests"))

    spark = build_session()
    rv = ResumableValidation(schema, files_per_unit=args.files_per_unit)
    summary = rv.run(spark, args.input, args.output)
    with open(os.path.join(args.output, "verdicts.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    spark.stop()
    sys.exit(0)


if __name__ == "__main__":
    main()
