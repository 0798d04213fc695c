"""The north rule's launch shape, literally: ``spark-submit --py-files``
at N and 4N EXECUTORS — not threads — using Spark's ``local-cluster``
master, which forks one real JVM per executor (separate heaps, real
serialized shuffle over the block manager, executor-side deserialization
of the shipped --py-files zip).  This is the closest a single box gets
to a multi-executor cluster: the only things still shared are the
machine's cores/memory-bandwidth, which is exactly what the interleaved
A/B pairing is designed to cancel.

Protocol mirrors tools/scaling_ab.py (BENCH/BASELINE.md): alternate
low/high legs in time — each leg a fresh spark-submit with its own
warm-up — and take the median per-pair ratio.  N=2 executors x 2 cores
vs 4N=8 executors x 2 cores (4 -> 16 total cores, the same pairing the
thread-mode evidence uses).

Usage:
  python tools/scaling_cluster.py <docs_path> [low_execs] [high_execs] [pairs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")
CORES_PER_EXEC = 2
WORKER_MEM_MB = 4096


def ensure_zip() -> str:
    out = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "make_pyfiles.sh")],
        capture_output=True, text=True,
    )
    if out.returncode != 0:
        raise RuntimeError(f"make_pyfiles failed: {out.stderr[-500:]}")
    return os.path.join(REPO, out.stdout.strip().splitlines()[-1])


def leg(n_execs: int, docs_path: str, zip_path: str) -> dict:
    master = f"local-cluster[{n_execs},{CORES_PER_EXEC},{WORKER_MEM_MB}]"
    total_cores = n_execs * CORES_PER_EXEC
    env = dict(
        os.environ,
        SPARK_GRAFT_MASTER=master,
        SPARK_GRAFT_CPUS=str(total_cores),  # sizes shuffle partitions
        SPARK_GRAFT_SCALE_REPEATS="1",
        SPARK_DRIVER_MEMORY="8g",
        PYTHONPATH=REPO,
    )
    cmd = [
        SPARK_SUBMIT,
        "--master", master,
        "--conf", "spark.executor.memory=3g",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(REPO, "tools", "scaling_runner.py"),
        docs_path,
    ]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise RuntimeError(f"leg local-cluster[{n_execs}] failed")
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line in leg output: {out.stdout[-500:]}")


def main() -> None:
    docs_path = sys.argv[1]
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    zip_path = ensure_zip()

    results = []
    for i in range(pairs):
        a = leg(low, docs_path, zip_path)
        b = leg(high, docs_path, zip_path)
        ratio = a["best_sec"] / b["best_sec"]
        results.append(
            {"pair": i, "low_sec": a["best_sec"], "high_sec": b["best_sec"],
             "n_docs": a["n_docs"], "ratio": round(ratio, 3)}
        )
        print(json.dumps(results[-1]), file=sys.stderr, flush=True)

    ratios = [r["ratio"] for r in results]
    med = statistics.median(ratios)
    factor = high / low
    print(json.dumps({
        "mode": "spark-submit + local-cluster (one JVM per executor)",
        "low_executors": low,
        "high_executors": high,
        "cores_per_executor": CORES_PER_EXEC,
        "pairs": results,
        "median_speedup": round(med, 3),
        "scaling_efficiency": round(med / factor, 3),
    }))


if __name__ == "__main__":
    main()
