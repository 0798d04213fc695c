"""Interleaved A/B scaling measurement: alternate single-repeat legs
(A=low parallelism, B=high) in time — A1 B1 A2 B2 ... — each leg in a
fresh JVM with its own full-pass warm-up.  On a co-tenant VM whose
capacity drifts between windows, pairing repeat i of A with repeat i of
B makes each ratio A_i/B_i a same-window comparison; the median ratio is
the drift-cancelled speedup.

Usage: python tools/scaling_ab.py <docs_path> [low] [high] [pairs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def leg(cpus: int, docs_path: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SCALE_REPEATS="1",
        SPARK_DRIVER_MEMORY="8g",
        PYTHONPATH=REPO,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_runner.py"), docs_path],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
        raise RuntimeError(f"leg local[{cpus}] failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    docs_path = sys.argv[1]
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    results = []
    for i in range(pairs):
        a = leg(low, docs_path)
        b = leg(high, docs_path)
        ratio = a["best_sec"] / b["best_sec"]
        results.append({"pair": i, "low_sec": a["best_sec"], "high_sec": b["best_sec"],
                        "n_docs": a["n_docs"], "ratio": round(ratio, 3)})
        print(json.dumps(results[-1]), file=sys.stderr)

    ratios = [r["ratio"] for r in results]
    med = statistics.median(ratios)
    print(json.dumps({
        "low_cpus": low,
        "high_cpus": high,
        "pairs": results,
        "median_speedup": round(med, 3),
        "efficiency": round(med / (high / low), 3),
    }))


if __name__ == "__main__":
    main()
