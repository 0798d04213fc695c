"""Scale ladder for the INTERLEAVED curation pipeline (session 11): run
plans/interleaved_pipeline.py end-to-end over generated north-rule
corpora at x1/x2/x4 document counts and report wall + survivor rows.

Ideal-work argument: every pipeline stage except the boilerplate
profile is row-local (repair, gate, render — one fused projection
scan), and the profile's two keyed aggregates are linear in total span
count; the generator's text distribution is scale-free (span texts are
word-soups keyed by (seed, doc, span) hashes), so the repeated-span set
grows slowly while per-doc work is constant.  Wall should therefore
track the corpus linearly; a super-linear step indicts the plan.

Corpora are materialized to parquet first (the pipeline reads a stored
table, as in bench.py), timings are per-rung with cache cleared, one
JVM for the whole ladder (warm-up paid once).

Usage:  python tools/interleaved_ladder.py [--base 50000] [--factors 1 2 4]
Output: one JSON line {"ladder": {...}, "rows": {...}, "exponents": [...]}
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from schemasaurus_spark.plans.interleaved_pipeline import (  # noqa: E402
    InterleavedPipeline,
)
from schemasaurus_spark.session import get_spark  # noqa: E402
from schemasaurus_spark.sources.generator import (  # noqa: E402
    generate_documents,
    generate_media_catalog,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=50_000)
    ap.add_argument("--factors", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--min-docs-boilerplate", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark()
    tmp = tempfile.mkdtemp(prefix="interleaved_ladder_")
    catalog = generate_media_catalog(spark, seed=7)
    pipe = InterleavedPipeline(
        min_docs_boilerplate=args.min_docs_boilerplate, min_text_chars=20
    )
    walls: dict[str, float] = {}
    rows: dict[str, int] = {}
    try:
        for k in args.factors:
            n = args.base * k
            path = os.path.join(tmp, f"docs_x{k}")
            generate_documents(spark, n_docs=n, seed=7).write.mode(
                "overwrite"
            ).parquet(path)
            docs = spark.read.parquet(path)
            spark.catalog.clearCache()
            t0 = time.monotonic()
            out_rows = pipe.run(docs, catalog).count()
            walls[str(k)] = round(time.monotonic() - t0, 2)
            rows[str(k)] = out_rows
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    fs = [str(k) for k in args.factors]
    exponents = [
        round(
            math.log(walls[b] / walls[a]) / math.log(int(b) / int(a)), 2
        )
        for a, b in zip(fs, fs[1:])
    ]
    print(
        json.dumps(
            {
                "base_docs": args.base,
                "ladder": walls,
                "rows": rows,
                "exponents": exponents,
            }
        )
    )


if __name__ == "__main__":
    main()
