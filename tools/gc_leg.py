"""One full-pass scaling leg with GC logging + steal sampling, for
attributing the 8->32 residual (VERDICT r2 item 7): is the lost
efficiency JVM GC, host steal, or shared memory bandwidth?

Runs the same workload as tools/scaling_runner.py at
``local[$SPARK_GRAFT_CPUS]`` with ``-Xlog:gc`` enabled, then reports the
timed-window wall, the GC pause total inside that window, and the host
steal delta (/proc/stat) across it.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import re
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


def read_cpu_jiffies() -> tuple[int, int]:
    """(total, steal) jiffies from /proc/stat's aggregate cpu line."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def gc_pause_ms(log_path: str, lo: float, hi: float) -> float:
    """Sum of GC pause milliseconds whose JVM-uptime stamp falls in
    [lo, hi) (seconds).  -Xlog:gc lines look like:
    [12.345s][info][gc] GC(7) Pause Young (...) 123M->45M(8192M) 6.789ms"""
    total = 0.0
    stamp = re.compile(r"^\[(\d+\.\d+)s\]")
    pause = re.compile(r"Pause.*?([\d.]+)ms\s*$")
    try:
        with open(log_path) as f:
            for line in f:
                m = stamp.match(line)
                p = pause.search(line)
                if m and p and lo <= float(m.group(1)) < hi:
                    total += float(p.group(1))
    except FileNotFoundError:
        return -1.0
    return total


def main() -> None:
    docs_path = sys.argv[1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    gclog = f"/tmp/gc_leg_{cpus}_{os.getpid()}.log"
    gc_opts = (
        f"-XX:+UseG1GC -XX:ParallelGCThreads={max(8, cpus // 2)} "
        f"-XX:ConcGCThreads={max(2, cpus // 4)} -Xlog:gc:{gclog}"
    )
    jvm_start = time.time()
    spark = get_spark(
        f"gc_leg_{cpus}", cpus=cpus,
        extra_conf={"spark.driver.extraJavaOptions": gc_opts},
    )
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

    full_pass()  # untimed warm-up (Janino + C2)

    t0_up = time.time() - jvm_start
    j0_tot, j0_steal = read_cpu_jiffies()
    t0 = time.time()
    full_pass()
    wall = time.time() - t0
    t1_up = time.time() - jvm_start
    j1_tot, j1_steal = read_cpu_jiffies()

    gc_ms = gc_pause_ms(gclog, t0_up, t1_up)
    steal_pct = 100.0 * (j1_steal - j0_steal) / max(1, j1_tot - j0_tot)
    print(json.dumps({
        "cpus": cpus,
        "n_docs": n_docs,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
        "gc_pause_sec": round(gc_ms / 1000.0, 2),
        "gc_pct_of_wall": round(100.0 * gc_ms / 1000.0 / wall, 2),
        "host_steal_pct": round(steal_pct, 2),
    }))
    spark.stop()
    os.remove(gclog) if os.path.exists(gclog) else None


if __name__ == "__main__":
    main()
