"""License tagging: marker detection, precedence fold, SPDX extraction,
copyright counting, NULL text, partition invariance, zero-shuffle plan."""

from schemasaurus_spark.operators.compliance import license_profile

SCHEMA = "doc_id string, text string"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r.doc_id: r.asDict() for r in license_profile(df).collect()}


def test_marker_detection_and_classes(spark):
    got = _run(
        spark,
        [
            ("arr", "Some page. All Rights Reserved."),
            ("nc", "shared under CC BY-NC-SA 4.0 terms"),
            ("nd", "license: cc by-nd"),
            ("noncom", "for Non-Commercial use only"),
            ("by", "licensed cc by-sa 4.0"),
            ("ccattr", "Creative Commons Attribution applies"),
            ("pd", "released into the public domain"),
            ("cc0", "marked CC0 by the author"),
            ("spdx", "// SPDX-License-Identifier: Apache-2.0\ncode"),
            ("none", "plain text with no markers"),
        ],
    )
    expect = {
        "arr": "all_rights_reserved",
        "nc": "cc_restricted",
        "nd": "cc_restricted",
        "noncom": "cc_restricted",
        "by": "cc_by",
        "ccattr": "cc_by",
        "pd": "public_domain",
        "cc0": "public_domain",
        "spdx": "spdx",
        "none": "none",
    }
    for d, k in expect.items():
        assert got[d]["license_class"] == k, (d, got[d])
    assert got["spdx"]["spdx_id"] == "apache-2.0"
    assert got["none"]["spdx_id"] is None


def test_most_restrictive_wins(spark):
    got = _run(
        spark,
        [
            ("a", "public domain but also all rights reserved"),
            ("b", "cc by-sa and cc by-nc together"),
            ("c", "SPDX-License-Identifier: MIT, public domain"),
        ],
    )
    assert got["a"]["license_class"] == "all_rights_reserved"
    assert got["b"]["license_class"] == "cc_restricted"
    assert got["c"]["license_class"] == "public_domain"
    assert got["c"]["spdx_id"] == "mit"


def test_copyright_counting(spark):
    got = _run(
        spark,
        [
            ("two", "Copyright 2020, copyright 2021"),
            ("sign", "© 2024 Corp ©"),
            ("both", "Copyright © 2024"),
            ("zero", "no marks here"),
        ],
    )
    assert got["two"]["n_copyright_marks"] == 2
    assert got["sign"]["n_copyright_marks"] == 2
    assert got["both"]["n_copyright_marks"] == 2
    assert got["zero"]["n_copyright_marks"] == 0


def test_null_text(spark):
    got = _run(spark, [("n", None)])
    r = got["n"]
    assert r["license_class"] == "none"
    assert r["spdx_id"] is None and r["n_copyright_marks"] == 0
    assert (r["f_arr"], r["f_cc_restricted"], r["f_cc_by"], r["f_public_domain"]) == (
        0, 0, 0, 0,
    )


def test_partition_invariance_and_dup_ids(spark):
    rows = [
        (f"d{i}", f"doc {i} " + ("cc by " if i % 3 == 0 else "plain "))
        for i in range(30)
    ] + [("dup", "all rights reserved"), ("dup", "cc0")]
    from pyspark.sql import functions as _F

    df = spark.createDataFrame(rows, SCHEMA)
    base = sorted(map(tuple, license_profile(df).collect()))
    re7 = sorted(
        map(tuple, license_profile(df.repartition(7, "doc_id")).collect())
    )
    assert base == re7
    assert sorted(t[1] for t in base if t[0] == "dup") == [
        "all_rights_reserved",
        "public_domain",
    ]


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([("a", "x")], SCHEMA)
    plan = license_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
