"""Corpus-size ladder for incremental component maintenance: measure
``dedup.incremental_components`` against a from-scratch
``connected_components`` recompute at 1x / 2x / 4x assignment sizes with a
FIXED ingest batch — the claim under test is the operator's whole reason
to exist (per-ingest cost ~ O(batch + corpus-streamed-once), vs the full
recompute's O(corpus) SHUFFLED per star round).

Setup (deterministic, no external data):

* assignment: ``spark.range(n)`` labeled into 2-clusters
  (comp_id = id - id % 2) and materialized to parquet — the historical
  corpus state a real deployment would have on disk;
* batch: 10,000 pairs linking md5-derived pseudo-random ids across the id
  space (plus 1,000 brand-new ids), the same batch at every rung;
* measured: (a) incremental = incremental_components(assignment, batch)
  forced via noop write; (b) full = connected_components over the
  assignment's own star edges + the batch (what a non-incremental engine
  must run), also forced.

Expected shape: the incremental wall grows only with the two STREAMED
corpus scans (broadcast probe + broadcast relabel — no corpus shuffle;
its CC runs on the batch-sized reduced graph), so its x1→x4 step should
be far below 4x and its absolute wall far below the full recompute,
whose every star round shuffles the corpus-sized edge set.

Usage:  python tools/incr_cc_ladder.py [--base 1000000] [--factors 1 2 4]
Output: one JSON line {"ladder": {"incremental": {...}, "full": {...}},
        "speedup": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from schemasaurus_spark.operators.dedup import (
    connected_components,
    incremental_components,
)
from schemasaurus_spark.session import get_spark


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=1_000_000)
    ap.add_argument("--factors", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--batch-pairs", type=int, default=10_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    spark = get_spark("incr_cc_ladder", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="incr_cc_ladder_")
    ladder: dict = {"incremental": {}, "full": {}}
    try:
        # the fixed ingest batch: pseudo-random links across the 1x id space
        # (so every rung sees the same batch), plus brand-new ids
        m = args.batch_pairs
        batch = (
            spark.range(m)
            .select(
                (F.abs(F.xxhash64(F.col("id"))) % args.base).alias("id_a"),
                (F.abs(F.xxhash64(F.col("id") + 7)) % args.base).alias("id_b"),
            )
            .unionByName(
                spark.range(1000).select(
                    (F.col("id") + 10 * args.base).alias("id_a"),
                    (F.abs(F.xxhash64(F.col("id") + 13)) % args.base).alias("id_b"),
                )
            )
        )
        batch_path = os.path.join(tmp, "batch")
        batch.write.mode("overwrite").parquet(batch_path)
        batch = spark.read.parquet(batch_path)

        for k in args.factors:
            n = args.base * k
            apath = os.path.join(tmp, f"assignment_{k}")
            spark.range(n).select(
                F.col("id"), (F.col("id") - F.col("id") % 2).alias("comp_id")
            ).write.mode("overwrite").parquet(apath)
            assignment = spark.read.parquet(apath)

            t0 = time.time()
            _force(incremental_components(assignment, batch))
            ladder["incremental"][str(k)] = round(time.time() - t0, 3)

            star = assignment.where(F.col("id") != F.col("comp_id")).select(
                F.col("id").alias("id_a"), F.col("comp_id").alias("id_b")
            )
            t0 = time.time()
            _force(connected_components(star.unionByName(batch)))
            ladder["full"][str(k)] = round(time.time() - t0, 3)

        speedup = {
            k: round(ladder["full"][k] / ladder["incremental"][k], 2)
            for k in ladder["full"]
        }
        print(
            json.dumps(
                {
                    "ladder": ladder,
                    "speedup": speedup,
                    "base": args.base,
                    "batch_pairs": args.batch_pairs,
                    "cpus": args.cpus,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
