"""Single-parallelism leg of the scaling bench: runs the full north-rule
validation pass (count-mode verdicts + violation rows + salted uniqueness +
broadcast referential + column stats) over a pre-materialized documents
parquet at ``local[$SPARK_GRAFT_CPUS]`` and prints one JSON line with
timings.  Invoked as a subprocess by tools/scaling_bench.py so each leg
gets a fresh JVM (no cross-leg JIT/GC contamination).
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


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    docs_path = sys.argv[1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))
    spark = get_spark(f"scaling_local_{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()
    catalog = generate_media_catalog(spark, seed=7)
    job = ValidationJob()

    def full_pass() -> None:
        force(job.verdicts(job.counted(docs)))
        force(job.violations(job.validated(docs)))
        force(duplicate_keys(docs, "doc_id"))
        force(dangling_media_refs(docs, catalog))
        force(column_stats(docs.select("doc_id", F.size("spans").alias("n_spans")),
                           ["doc_id", "n_spans"], approx=True))

    # one untimed warm-up compiles every plan's generated code (Janino + C2)
    # so the timed repeats measure steady-state throughput, not JIT
    full_pass()

    times = []
    for _ in range(repeats):
        t0 = time.time()
        full_pass()
        times.append(round(time.time() - t0, 2))

    best = min(times)
    print(json.dumps({
        "cpus": cpus,
        "n_docs": n_docs,
        "times_sec": times,
        "best_sec": best,
        "docs_per_sec": round(n_docs / best, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
