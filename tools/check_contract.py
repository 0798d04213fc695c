"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry against its DuckDB oracle at a given
sf dir and report row-count / column-set / order-insensitive value-hash
matches.  Usage:  python tools/check_contract.py [sf_dir] [query ...]
                  [--summary-json PATH]

The last line is a machine-readable JSON summary (ok/rows_only/failed
counts + the authoritative registry size, always len(queries())) so the
driver — which samples only ~50 rows per round — can ingest a full-sweep
verdict; ``--summary-json`` additionally writes it to a file (the
CONTRACT_rN.json artifact committed per session).
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod
from schemasaurus_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df_pandas) -> tuple[int, list[str], str]:
    pdf = df_pandas.reindex(sorted(df_pandas.columns), axis=1)

    def cell(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if v != v:
                return "∅"
            return repr(round(v, 9))
        return str(v)

    rows = sorted("|".join(cell(v) for v in row) for row in pdf.itertuples(index=False))
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(rows), sorted(pdf.columns), h


def main():
    argv = list(sys.argv[1:])
    summary_path = None
    if "--summary-json" in argv:
        i = argv.index("--summary-json")
        if i + 1 >= len(argv):
            sys.exit("usage: check_contract.py [sf_dir] [query ...] --summary-json PATH")
        summary_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("check_contract")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    n_ok = n_rows_only = 0
    t_start = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(ex).__name__}: {ex}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            n_rows_only += 1
            print(f"ok(rows-only) {name}: {len(sdf)} rows  [{dt:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: oracle error {ex}")
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        status = "ok" if (sn, sc, sh) == (on, oc, oh) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        else:
            n_ok += 1
        print(f"{status}    {name}: spark({sn} rows, {sh}) oracle({on} rows, {oh})  [{dt:.1f}s]")
        if status == "FAIL":
            if sc != oc:
                print(f"      columns: spark={sc} oracle={oc}")
            elif sn == on:
                spdf = sdf.reindex(sorted(sdf.columns), axis=1)
                opdf = odf.reindex(sorted(odf.columns), axis=1)
                srows = sorted(map(str, spdf.itertuples(index=False)))
                orows = sorted(map(str, opdf.itertuples(index=False)))
                diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
                for a, b in diffs:
                    print(f"      spark : {a[:200]}\n      oracle: {b[:200]}")
    print("\n" + ("ALL OK" if not failures else f"FAILURES: {failures}"))
    summary = {
        "registry_count": len(qs),
        "checked": n_ok + n_rows_only + len(failures),
        "hash_ok": n_ok,
        "rows_only_ok": n_rows_only,
        "failed": sorted(failures),
        "sf_dir": sf_dir,
        "wall_sec": round(time.time() - t_start, 1),
    }
    print(json.dumps(summary))
    if summary_path:
        with open(summary_path, "w") as fh:
            json.dump(summary, fh, indent=1)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
