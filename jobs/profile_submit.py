"""spark-submit entrypoint for the data-profiling pass — the bootstrap
side of the validation engine: before a gate can be erected, someone has
to discover what contract the corpus currently keeps.

    spark-submit --py-files dist/schemasaurus_spark.zip jobs/profile_submit.py \
        --input  /data/documents        (parquet dir; or an Iceberg table id
                                         when the runtime jar is present) \
        --output /data/profile_out
        [--columns c1,c2]               (default: all columns)
        [--approx]                      (HLL cardinalities — the 100 TB path)
        [--fd-columns c1,c2,c3]         (functional-dependency discovery)
        [--corr-columns c1,c2]          (exact Pearson profile; integral cols)
        [--quasi-cols zip,yob --k 5 [--sensitive diag --l 2]]
                                        (k-anonymity / l-diversity audit)
        [--checksum]                    (order-invariant dataset checksum)
        [--script-profile] [--license-profile] [--text-col text]
                                        (Unicode-script/mojibake forensics and
                                         usage-rights tagging over a text column)
        [--suggest-rules]               (ALSO write the suggestions as an
                                         enforceable quality-gate rule suite
                                         -> suggested_rules.json, the direct
                                         input of validate_submit --gate)

Artifacts under --output (each a parquet dir; summary.json via the
Hadoop FS API so s3a/hdfs outputs work):
    column_stats/  suggestions/  [fds/]  [correlations/]  [kanon/]
    [checksum/]  [script_profile/]  [license_profile/]  summary.json
    [suggested_rules.json]

Cost model: column_stats + suggestions share the profiling design
(operators/suggest.py — one aggregate scan, plus a guarded second pass
only for proven-low-cardinality domains); every optional artifact is one
additional single-scan aggregate.  Nothing here shuffles the corpus.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import SparkSession

try:
    import schemasaurus_spark  # noqa: F401
except ModuleNotFoundError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_session() -> SparkSession:
    return (
        SparkSession.builder.appName("schemasaurus_spark.profile")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--columns", default=None)
    ap.add_argument("--approx", action="store_true")
    ap.add_argument("--fd-columns", default=None)
    ap.add_argument("--corr-columns", default=None)
    ap.add_argument("--quasi-cols", default=None)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--sensitive", default=None)
    ap.add_argument("--l", type=int, default=None)
    ap.add_argument("--checksum", action="store_true")
    ap.add_argument("--suggest-rules", action="store_true")
    ap.add_argument("--text-col", default="text")
    ap.add_argument(
        "--script-profile", action="store_true",
        help="Unicode script + mojibake forensics over --text-col",
    )
    ap.add_argument(
        "--license-profile", action="store_true",
        help="usage-rights tagging over --text-col",
    )
    ap.add_argument(
        "--categorical-max-distinct", type=int, default=20,
        help="domain-suggestion cardinality bound (suggest.py pass-2 guard)",
    )
    ap.add_argument(
        "--infer-schema", action="store_true",
        help="write the tightest draft-4 schema accepting the observed data "
        "(schema/infer.py) to inferred_schema.json — ready for "
        "validate_submit --schema / migrate_submit --schema-old",
    )
    ap.add_argument("--enum-max", type=int, default=10)
    args = ap.parse_args()

    from schemasaurus_spark.operators.stats import column_stats
    from schemasaurus_spark.operators.suggest import suggest_constraints, to_rules
    from schemasaurus_spark.sources.io import TableRef, read_table, write_text_file

    spark = build_session()
    df = read_table(spark, TableRef(path=args.input) if "/" in args.input
                    else TableRef(table=args.input))
    cols = args.columns.split(",") if args.columns else list(df.columns)
    out = args.output.rstrip("/")
    summary: dict = {"input": args.input, "columns": cols, "approx": args.approx}

    stats = column_stats(df, cols, approx=args.approx)
    stats.write.mode("overwrite").parquet(f"{out}/column_stats")
    summary["column_stats_rows"] = spark.read.parquet(f"{out}/column_stats").count()

    sugg = suggest_constraints(
        df, cols, categorical_max_distinct=args.categorical_max_distinct,
        approx=args.approx,
    )
    sugg.write.mode("overwrite").parquet(f"{out}/suggestions")
    sugg_rows = spark.read.parquet(f"{out}/suggestions").collect()
    summary["suggestions"] = len(sugg_rows)
    if args.suggest_rules:
        rules = to_rules(sugg_rows)
        write_text_file(
            spark,
            f"{out}/suggested_rules.json",
            json.dumps([r.__dict__ for r in rules], indent=2),
        )
        summary["suggested_rules"] = len(rules)

    if args.fd_columns:
        from schemasaurus_spark.operators.fd import fd_profile

        fds = fd_profile(df, args.fd_columns.split(","))
        fds.write.mode("overwrite").parquet(f"{out}/fds")
        held = [r for r in spark.read.parquet(f"{out}/fds").collect() if r.holds]
        summary["fds_held"] = [f"{r.lhs}->{r.rhs}" for r in held]

    if args.corr_columns:
        from schemasaurus_spark.operators.stats import correlation_profile

        corr = correlation_profile(df, args.corr_columns.split(","))
        corr.write.mode("overwrite").parquet(f"{out}/correlations")
        summary["correlations"] = spark.read.parquet(f"{out}/correlations").count()

    if args.quasi_cols:
        from schemasaurus_spark.operators.privacy import (
            k_anonymity_report,
            privacy_summary,
        )

        quasi = args.quasi_cols.split(",")
        report = k_anonymity_report(
            df, quasi, args.k, sensitive_col=args.sensitive, l=args.l
        )
        report.write.mode("overwrite").parquet(f"{out}/kanon")
        psum = privacy_summary(df, quasi, args.k).collect()[0]
        summary["privacy"] = {
            "k": args.k,
            "n_groups": psum.n_groups,
            "n_violating_groups": psum.n_violating_groups,
            "n_exposed_rows": psum.n_exposed_rows,
            "is_k_anonymous": bool(psum.is_k_anonymous),
        }

    if args.checksum:
        from schemasaurus_spark.operators.diff import dataset_checksum

        chk = dataset_checksum(df, cols)
        chk.write.mode("overwrite").parquet(f"{out}/checksum")
        row = spark.read.parquet(f"{out}/checksum").collect()[0]
        summary["checksum"] = {"n_rows": row.n_rows, "checksum": row.checksum}

    if args.script_profile:
        from pyspark.sql import functions as F

        from schemasaurus_spark.operators.encoding import script_profile

        sp = script_profile(df, text_col=args.text_col)
        sp.write.mode("overwrite").parquet(f"{out}/script_profile")
        sp2 = spark.read.parquet(f"{out}/script_profile")
        by_script = {
            r.dominant_script: r.n
            for r in sp2.groupBy("dominant_script")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        art = sp2.agg(
            F.sum("n_replacement").alias("rep"),
            F.sum("n_c1").alias("c1"),
            F.sum("n_mojibake_pairs").alias("moj"),
        ).first()
        summary["script_profile"] = {
            "dominant_script_docs": by_script,
            "n_replacement_chars": int(art.rep or 0),
            "n_c1_chars": int(art.c1 or 0),
            "n_mojibake_pairs": int(art.moj or 0),
        }

    if args.license_profile:
        from pyspark.sql import functions as F

        from schemasaurus_spark.operators.compliance import license_profile

        lp = license_profile(df, text_col=args.text_col)
        lp.write.mode("overwrite").parquet(f"{out}/license_profile")
        summary["license_classes"] = {
            r.license_class: r.n
            for r in spark.read.parquet(f"{out}/license_profile")
            .groupBy("license_class")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    if args.infer_schema:
        from schemasaurus_spark.schema.infer import infer_schema

        inferred = infer_schema(df, columns=cols, enum_max=args.enum_max)
        write_text_file(
            spark, f"{out}/inferred_schema.json", json.dumps(inferred, indent=2)
        )
        summary["inferred_schema"] = {
            "columns": sorted(inferred["properties"]),
            "required": sorted(
                c for c, s in inferred["properties"].items() if s.get("required")
            ),
            "enums": sorted(
                c for c, s in inferred["properties"].items() if "enum" in s
            ),
        }

    write_text_file(spark, f"{out}/summary.json", json.dumps(summary, indent=2))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
