"""Driver-contract surface invariants: every query must (a) have a DuckDB
oracle, and (b) return only flat (non-nested) columns — the round-1 red row
was a nested array column crashing the harness canonicalizer, and this
pins that class of regression."""

from pyspark.sql import types as T


def test_contract_queries_have_flat_schemas_and_oracles(spark):
    import __spark_entry__ as e

    queries = e.queries()
    oracles = e.oracle_sql()
    assert set(queries) == set(oracles), (
        f"queries without oracle: {set(queries) - set(oracles)}; "
        f"oracles without query: {set(oracles) - set(queries)}"
    )
    nested = []
    for name, fn in queries.items():
        df = fn(spark, "/root/testdata/sf0.001")
        for f in df.schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType)):
                nested.append((name, f.name, f.dataType.simpleString()))
    assert not nested, f"nested output columns break the compare harness: {nested}"
