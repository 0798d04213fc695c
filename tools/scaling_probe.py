"""Microprobes attributing the 8->32 scaling residual (VERDICT r2 #7):

* ``cpu``  — near-zero-allocation compute: fold xxhash64 over a range.
  A tight whole-stage-codegen loop with no heap churn and no input bytes;
  if THIS scales ~4x from 8 to 32 threads, the scheduler/JVM are fine and
  the residual belongs to the workload's memory traffic.
* ``scan`` — allocation/bandwidth-heavy: parquet scan + per-span string
  length fold (decompression, UTF8String allocation, shared-bandwidth
  bound — the shape of the real validation pass).

Leg mode (subprocess, fresh JVM):   scaling_probe.py leg <probe> <cpus> [docs_path]
Orchestrator (interleaved pairs):   scaling_probe.py run <docs_path> [low] [high] [pairs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Sized so the 8-thread leg runs ~25s: short legs (<5s) are dominated by
# task scheduling + JIT and showed a meaningless 1.3x "speedup" at 4B rows.
CPU_ROWS = 40_000_000_000


def leg(probe: str, cpus: int, docs_path: str | None) -> None:
    from pyspark.sql import functions as F

    from schemasaurus_spark.session import get_spark

    spark = get_spark(f"probe_{probe}_{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    if probe == "cpu":
        def run():
            # bit_xor, not sum: xxhash64 outputs span the full int64 range,
            # so a 4B-row sum overflows under ANSI mode; xor is overflow-free
            # and keeps the loop inside whole-stage codegen.
            return (
                spark.range(0, CPU_ROWS, 1, cpus * 4)
                .select(F.expr("bit_xor(xxhash64(id))"))
                .collect()
            )
    elif probe == "scan":
        docs = spark.read.parquet(docs_path)

        def run():
            return docs.select(
                F.sum(
                    F.expr(
                        "aggregate(spans, 0L, (a, s) -> a + coalesce(length(s.text), 0L))"
                    )
                )
            ).collect()
    else:
        raise SystemExit(f"unknown probe {probe}")

    run()  # warm-up
    times = []
    for _ in range(2):
        t0 = time.time()
        run()
        times.append(round(time.time() - t0, 2))
    print(json.dumps({"probe": probe, "cpus": cpus, "times": times,
                      "best_sec": min(times)}))
    spark.stop()


def orchestrate(docs_path: str, low: int, high: int, pairs: int) -> None:
    def run_leg(probe: str, cpus: int) -> dict:
        env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS=str(cpus))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "leg", probe, str(cpus), docs_path],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-1500:])
            raise RuntimeError(f"probe leg failed: {probe} local[{cpus}]")
        return json.loads(out.stdout.strip().splitlines()[-1])

    summary = {}
    for probe in ("cpu", "scan"):
        ratios = []
        for i in range(pairs):
            a = run_leg(probe, low)
            b = run_leg(probe, high)
            r = round(a["best_sec"] / b["best_sec"], 3)
            ratios.append(r)
            print(json.dumps({"probe": probe, "pair": i, "low_sec": a["best_sec"],
                              "high_sec": b["best_sec"], "ratio": r}), file=sys.stderr)
        med = statistics.median(ratios)
        summary[probe] = {
            "ratios": ratios,
            "median_speedup": round(med, 3),
            "efficiency": round(med / (high / low), 3),
        }
    print(json.dumps({"low": low, "high": high, **summary}))


if __name__ == "__main__":
    if sys.argv[1] == "leg":
        leg(sys.argv[2], int(sys.argv[3]), sys.argv[4] if len(sys.argv) > 4 else None)
    else:
        orchestrate(
            sys.argv[2],
            int(sys.argv[3]) if len(sys.argv) > 3 else 8,
            int(sys.argv[4]) if len(sys.argv) > 4 else 32,
            int(sys.argv[5]) if len(sys.argv) > 5 else 2,
        )
