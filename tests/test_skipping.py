"""Zone maps + range-skipping layout evaluation: closed-form fixture,
NULL-file pruning, exact match counts, partition invariance, and the
one-scan multi-layout property."""

from pyspark.sql import functions as F

from schemasaurus_spark.operators.skipping import (
    range_skipping_profile,
    zone_maps,
)


def _fixture(spark):
    # 3 "ingest" files of 4 rows; values clustered so a value layout prunes
    rows = [
        (0, 10), (1, 11), (2, 12), (3, 13),      # ingest file 0: 10..13
        (4, 50), (5, 51), (6, 52), (7, 53),      # ingest file 1: 50..53
        (8, None), (9, None), (10, 40), (11, 70) # ingest file 2: NULLs +
        # values straddling [45, 60] with nothing inside -> the false keep
    ]
    return spark.createDataFrame(rows, ["id", "v"])


def test_zone_maps_closed_form(spark):
    df = _fixture(spark)
    got = {
        r.file_id: (r.n_rows, r.min_v, r.max_v, r.n_nulls)
        for r in zone_maps(df, F.expr("id DIV 4"), "v").collect()
    }
    assert got == {0: (4, 10, 13, 0), 1: (4, 50, 53, 0), 2: (4, 40, 70, 2)}


def test_range_skipping_profile_verdicts_and_counts(spark):
    df = _fixture(spark)
    layouts = {
        "ingest": F.expr("id DIV 4"),
        "clustered": F.expr("v DIV 40"),  # NULL v -> NULL file
    }
    for frame in (df, df.repartition(7)):
        got = {
            (r.layout, r.file_id): (r.n_rows, r.min_v, r.max_v,
                                    r.n_matching, r.prunable)
            for r in range_skipping_profile(
                frame, layouts, "v", 45, 60
            ).collect()
        }
        assert got[("ingest", 0)] == (4, 10, 13, 0, True)    # max < lo
        assert got[("ingest", 1)] == (4, 50, 53, 4, False)   # all match
        assert got[("ingest", 2)] == (4, 40, 70, 0, False)   # FALSE KEEP:
        # [40, 70] straddles the range but holds nothing inside it -> the
        # metadata verdict keeps a file the scan will read for 0 rows
        assert got[("clustered", 0)] == (4, 10, 13, 0, True)
        assert got[("clustered", 1)] == (6, 40, 70, 4, False)  # 40/70 land
        # in the same value bucket as the true matches under this layout
        assert got[("clustered", None)] == (2, None, None, 0, True)
        # all-NULL file: min IS NULL -> prunable, matches nothing


def test_multi_layout_profile_is_one_scan(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    _fixture(spark).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    plan = range_skipping_profile(
        df,
        {"a": F.expr("id DIV 4"), "b": F.expr("v DIV 40")},
        "v", 45, 60,
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1  # k layouts, one pass over the data
