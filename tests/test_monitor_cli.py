"""jobs/monitor_submit.py end-to-end: baseline launch persists the one-row
baseline, the per-increment launch lands freshness/volume/benford
artifacts with a faithful summary, and --fail-on-anomaly exits 2 on a
burst increment."""

from __future__ import annotations

import datetime as dt
import json
import sys

import pytest

T0 = dt.datetime(2024, 6, 1, 0, 0, 0)


def _write_hours(spark, spec, path, value_of=None):
    rows = [
        ("s%d" % (h % 2), T0 + dt.timedelta(hours=h, seconds=i),
         (value_of(h, i) if value_of else (h * 100 + i + 1)))
        for h, n in spec.items()
        for i in range(n)
    ]
    spark.createDataFrame(rows, "source string, ts timestamp, amount long") \
        .coalesce(1).write.mode("overwrite").parquet(path)


def _run(cli, monkeypatch, argv):
    monkeypatch.setattr(sys, "argv", ["monitor_submit.py"] + argv)
    with pytest.raises(SystemExit) as e:
        cli.main()
    return e.value.code


def test_monitor_submit_end_to_end(spark, tmp_path, monkeypatch):
    import jobs.monitor_submit as cli

    monkeypatch.setattr(cli, "build_session", lambda: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    ref, inc, base_out, out = (
        str(tmp_path / p) for p in ("ref", "inc", "baselines", "mon")
    )
    _write_hours(spark, {0: 10, 1: 12, 2: 8, 3: 10, 4: 11, 5: 9}, ref)
    # increment: quiet hour + 5x burst hour
    _write_hours(spark, {6: 10, 7: 50}, inc)

    assert _run(cli, monkeypatch, [
        "--input", ref, "--output", base_out, "--make-volume-baseline",
    ]) == 0
    base = spark.read.parquet(f"{base_out}/volume_baseline").collect()[0]
    assert base["mean"] == 10.0

    code = _run(cli, monkeypatch, [
        "--input", inc, "--output", out, "--by", "source",
        "--volume-baseline", f"{base_out}/volume_baseline",
        "--benford-col", "amount", "--fail-on-anomaly",
    ])
    assert code == 2, "burst increment must gate"

    summary = json.loads(open(f"{out}/summary.json").read())
    assert summary["flagged"] and summary["volume"]["anomalous_buckets"] == 1
    assert summary["volume"]["buckets"] == 2
    assert summary["freshness"]["groups"] == 2
    vol = {r["bucket_ts"]: r for r in spark.read.parquet(f"{out}/volume").collect()}
    assert vol[T0 + dt.timedelta(hours=7)]["anomalous"]
    assert not vol[T0 + dt.timedelta(hours=6)]["anomalous"]
    assert spark.read.parquet(f"{out}/freshness").count() == 2
    assert spark.read.parquet(f"{out}/benford").count() == 9
    assert "benford" in summary

    # quiet increment passes the gate
    quiet_out = str(tmp_path / "mon_quiet")
    _write_hours(spark, {8: 10, 9: 11}, inc)
    assert _run(cli, monkeypatch, [
        "--input", inc, "--output", quiet_out,
        "--volume-baseline", f"{base_out}/volume_baseline",
        "--fail-on-anomaly",
    ]) == 0
    q = json.loads(open(f"{quiet_out}/summary.json").read())
    assert not q["flagged"] and q["volume"]["anomalous_buckets"] == 0
