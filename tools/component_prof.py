"""Per-component scaling profile: times each job of the full validation
pass separately at local[$SPARK_GRAFT_CPUS].  Usage:
    SPARK_GRAFT_CPUS=8 python tools/component_prof.py /tmp/bench_docs_2m
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from schemasaurus_spark.operators.referential import dangling_media_refs
from schemasaurus_spark.operators.stats import column_stats
from schemasaurus_spark.operators.uniqueness import duplicate_keys
from schemasaurus_spark.plans.validation_job import ValidationJob
from schemasaurus_spark.session import get_spark
from schemasaurus_spark.sources.generator import generate_media_catalog


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    docs_path = sys.argv[1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"prof{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(docs_path)
    catalog = generate_media_catalog(spark, seed=7)
    job = ValidationJob()

    components = {
        "scan_only": lambda: force(docs.select(F.length("doc_id").alias("l"))),
        "verdicts_fast": lambda: force(job.verdicts(job.counted(docs))),
        "violations": lambda: force(job.violations(job.validated(docs))),
        "uniqueness": lambda: force(duplicate_keys(docs, "doc_id")),
        "referential": lambda: force(dangling_media_refs(docs, catalog)),
        "stats": lambda: force(
            column_stats(
                docs.select("doc_id", F.size("spans").alias("n_spans")),
                ["doc_id", "n_spans"],
                approx=True,
            )
        ),
    }
    out = {"cpus": cpus}
    for name, thunk in components.items():
        thunk()  # warm: compile plans
        best = None
        for _ in range(2):
            t0 = time.time()
            thunk()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
