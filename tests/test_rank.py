"""Fixed-point PageRank (operators/rank.py): exact parity with a pure-
Python reference loop, edge hygiene (self-loops, duplicate edges,
dangling sinks), and partition-invariance of the integer arithmetic."""

import pytest

from schemasaurus_spark.operators.rank import PAGERANK_SCALE, pagerank_fixed_point


def _py_pagerank(edges, n_iter):
    """Reference implementation: same fixed-point recurrence, plain dicts."""
    eset = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in eset} | {d for _, d in eset})
    outdeg = {}
    for s, _ in eset:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: PAGERANK_SCALE for v in nodes}
    base = (15 * PAGERANK_SCALE) // 100
    for _ in range(n_iter):
        mass = {v: 0 for v in nodes}
        for s, d in eset:
            mass[d] += rank[s] // outdeg[s]
        rank = {v: base + (85 * mass[v]) // 100 for v in nodes}
    return {v: (rank[v], outdeg.get(v, 0)) for v in nodes}


EDGES = [
    ("a", "b"),
    ("a", "c"),
    ("b", "c"),
    ("c", "a"),
    ("c", "d"),  # d is dangling (no out-edges): mass leaks there
    ("a", "a"),  # self-loop: dropped
    ("a", "b"),  # duplicate: collapses
]


def _run(spark, edges, n_iter, n_part=None):
    df = spark.createDataFrame(edges, "src string, dst string")
    if n_part:
        df = df.repartition(n_part)
    rows = pagerank_fixed_point(df, n_iter=n_iter).collect()
    return {r["node"]: (r["rank_fp"], r["out_degree"]) for r in rows}


def test_matches_python_reference(spark):
    got = _run(spark, EDGES, n_iter=10)
    assert got == _py_pagerank(EDGES, 10)


def test_zero_iterations_is_uniform(spark):
    got = _run(spark, EDGES, n_iter=0)
    assert set(got) == {"a", "b", "c", "d"}
    assert all(r == PAGERANK_SCALE for r, _ in got.values())


def test_dangling_node_has_zero_outdeg_and_receives_mass(spark):
    got = _run(spark, EDGES, n_iter=3)
    rank_d, deg_d = got["d"]
    assert deg_d == 0
    assert rank_d > (15 * PAGERANK_SCALE) // 100  # received in-mass from c


def test_partition_invariance(spark):
    # integer sums are order-invariant: any input partitioning, same table
    a = _run(spark, EDGES, n_iter=6, n_part=1)
    b = _run(spark, EDGES, n_iter=6, n_part=7)
    assert a == b


def test_cycle_converges_to_symmetric_ranks(spark):
    # pure 3-cycle: every node identical by symmetry, outdeg 1 everywhere
    cyc = [("x", "y"), ("y", "z"), ("z", "x")]
    got = _run(spark, cyc, n_iter=12)
    ranks = {r for r, _ in got.values()}
    assert len(ranks) == 1
    assert all(d == 1 for _, d in got.values())


def test_negative_iterations_rejected(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError):
        pagerank_fixed_point(df, n_iter=-1)


def test_contract_query_matches_oracle(spark, tmp_path):
    """End-to-end: the contract entry vs its DuckDB oracle on a small
    deterministic documents table (same check the driver runs)."""
    import duckdb

    import __spark_entry__ as entrymod

    docs = spark.range(0, 400).selectExpr(
        "id AS doc_id",
        "'s' || CAST(id % 4 AS STRING) AS source",
        "'t' AS text",
        "'en' AS lang",
        "CAST(1 AS BIGINT) AS n_chars",
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    sdf = entrymod.host_authority_rank(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    odf = con.sql(entrymod._pagerank_oracle_sql(10)).df()

    key = lambda df: sorted(map(tuple, df[["node", "rank_fp", "out_degree"]].values))
    assert key(sdf) == key(odf)
    assert len(sdf) > 4
