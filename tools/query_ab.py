"""Interleaved per-query A/B between two repo checkouts (verdict item:
re-measure single-window bench regressions before calling them real).

For one query name, alternates fresh-JVM legs — A1 B1 A2 B2 ... — where A
runs the query from ``repo_a``'s code and B from ``repo_b``'s (e.g. a git
worktree of the previous round's commit vs HEAD).  Each leg warms codegen
+ the Arrow worker pool, then times the query once with a noop-sink force,
exactly like bench.py.  Pairing legs in time makes each ratio a
same-window comparison on this co-tenant box; the median ratio is the
drift-cancelled delta.

Usage:
    python tools/query_ab.py <query> <repo_a> <repo_b> [pairs] [sf_dir]

``validate_spans_violations`` / ``validate_spans_verdicts`` are bench
-internal passes (not ``queries()`` entries): the leg generates the
deterministic 200k-doc table once to a shared path and times the
validation pass over it.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

LEG_CODE = r"""
import os, sys, time
sys.path.insert(0, sys.argv[1])
import __spark_entry__ as entry
from schemasaurus_spark.session import get_spark

query, sf_dir, docs_path = sys.argv[2], sys.argv[3], sys.argv[4]
spark = get_spark("query_ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
spark.sparkContext.setLogLevel("ERROR")

def force(df):
    df.write.format("noop").mode("overwrite").save()

from pyspark.sql.functions import pandas_udf
_warm = pandas_udf(lambda s: s.str.len(), "long")
force(spark.range(64).selectExpr("cast(id as string) s").select(_warm("s")))

if query.startswith("validate_spans"):
    from schemasaurus_spark.plans.validation_job import ValidationJob
    job = ValidationJob()
    docs = spark.read.parquet(docs_path)
    force(job.verdicts(job.validated(docs.limit(1000))))  # codegen warm
    t0 = time.time()
    if query == "validate_spans_violations":
        force(job.violations(job.validated(docs)))
    else:
        force(job.verdicts(job.counted(docs)))
    wall = time.time() - t0
else:
    qs = entry.queries()
    t0 = time.time()
    force(qs[query](spark, sf_dir))
    wall = time.time() - t0
print(f"WALL {wall:.3f}")
spark.stop()
"""


def leg(repo: str, query: str, sf_dir: str, docs_path: str) -> float:
    env = dict(os.environ, PYTHONPATH=repo)
    out = subprocess.run(
        [sys.executable, "-c", LEG_CODE, repo, query, sf_dir, docs_path],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("WALL "):
            return float(line.split()[1])
    sys.stderr.write(out.stderr[-3000:])
    raise RuntimeError(f"leg failed for {repo} / {query}")


def main() -> None:
    query = sys.argv[1]
    repo_a, repo_b = sys.argv[2], sys.argv[3]
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    sf_dir = sys.argv[5] if len(sys.argv) > 5 else "/root/testdata/sf0.1"

    docs_path = ""
    if query.startswith("validate_spans"):
        docs_path = os.path.join(tempfile.gettempdir(), "query_ab_docs_200k")
        if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
            code = (
                "import sys; sys.path.insert(0, %r); "
                "from schemasaurus_spark.session import get_spark; "
                "from schemasaurus_spark.sources.generator import generate_documents; "
                "s = get_spark('gen', cpus=32); "
                "generate_documents(s, n_docs=200000, seed=7)"
                ".write.mode('overwrite').parquet(%r); s.stop()"
            ) % (repo_b, docs_path)
            subprocess.run([sys.executable, "-c", code], check=True,
                           env=dict(os.environ, PYTHONPATH=repo_b))

    results = []
    for i in range(pairs):
        a = leg(repo_a, query, sf_dir, docs_path)
        b = leg(repo_b, query, sf_dir, docs_path)
        results.append({"pair": i, "a_sec": round(a, 3), "b_sec": round(b, 3),
                        "ratio_b_over_a": round(b / a, 3)})
        print(json.dumps(results[-1]), file=sys.stderr)
    med = statistics.median(r["ratio_b_over_a"] for r in results)
    print(json.dumps({"query": query, "repo_a": repo_a, "repo_b": repo_b,
                      "pairs": results, "median_ratio_b_over_a": round(med, 3)}))


if __name__ == "__main__":
    main()
