"""Z-order clustering (operators/zorder.py): Morton-code parity with a
Python reference, the data-skipping tightness claim vs a single-column
layout, scaling edges (constant column, NULLs), and the range-partition
write path."""

from pyspark.sql import functions as F

from schemasaurus_spark.operators.zorder import (
    cluster_by_zorder,
    with_zorder_key,
    zorder_layout,
)


def _morton(vals, bits):
    z = 0
    k = len(vals)
    for j, v in enumerate(vals):
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * k + j)
    return z


def test_morton_parity_with_reference(spark):
    # x, y already span [0, 15] so min/max scaling at bits=4 is identity
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = {
        (r.x, r.y): r._z
        for r in with_zorder_key(df, ["x", "y"], bits=4).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton([x, y], 4), (x, y)


def test_zorder_tightens_all_dims_vs_single_column_sort(spark):
    # 64x64 grid; 16 buckets.  Single-column (x-sorted) buckets span the
    # FULL y domain; z-buckets must span at most half of each domain.
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    layout = zorder_layout(df, ["x", "y"], bits=6, n_buckets=16).collect()
    assert sum(r.n_rows for r in layout) == 64 * 64
    for r in layout:
        assert r.x_max - r.x_min <= 31, r
        assert r.y_max - r.y_min <= 31, r
    # the x-sorted counterfactual: bucket by x DIV 4 -> y range is 63
    naive = (
        df.withColumn("bucket", (F.col("x") / 4).cast("long"))
        .groupBy("bucket")
        .agg(F.min("y").alias("ymin"), F.max("y").alias("ymax"))
        .collect()
    )
    assert all(r.ymax - r.ymin == 63 for r in naive)


def test_constant_column_and_nulls(spark):
    rows = [(1, 5), (2, 5), (3, 5), (None, 5)]
    df = spark.createDataFrame(rows, "x bigint, c bigint")
    zd = with_zorder_key(df, ["x", "c"], bits=4).collect()
    by_x = {r.x: r._z for r in zd}
    assert by_x[None] is None  # NULL dim -> NULL key (clusters together)
    assert by_x[1] == 0  # min scales to 0; constant dim contributes 0
    layout = zorder_layout(df, ["x", "c"], bits=4, n_buckets=4)
    assert any(r.bucket is None for r in layout.collect())


def test_cluster_by_zorder_write_path(spark):
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    out = cluster_by_zorder(df, ["x", "y"], bits=5, n_partitions=8)
    assert out.columns == ["x", "y"]  # key dropped
    assert out.count() == 32 * 32
    # every partition's per-dim ranges stay sub-domain (the skipping win)
    parts = out.select(
        F.spark_partition_id().alias("p"), "x", "y"
    ).groupBy("p").agg(
        F.max("x").alias("xmax"), F.min("x").alias("xmin"),
        F.max("y").alias("ymax"), F.min("y").alias("ymin"),
        F.count(F.lit(1)).alias("n"),
    ).collect()
    assert sum(r.n for r in parts) == 32 * 32
    nonempty = [r for r in parts if r.n > 0]
    assert all(
        (r.xmax - r.xmin) <= 16 and (r.ymax - r.ymin) <= 16 for r in nonempty
    ), nonempty


def test_validation_errors(spark):
    df = spark.createDataFrame([(1, 2)], "a bigint, b bigint")
    for bad in (
        lambda: with_zorder_key(df, []),
        lambda: zorder_layout(df, ["a", "b"], n_buckets=0),
        lambda: with_zorder_key(df, ["a", "b"], bits=32),
    ):
        try:
            bad()
            assert False
        except ValueError:
            pass
