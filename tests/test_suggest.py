"""Constraint suggestion (operators/suggest.py): every lexicon branch on a
planted frame, the two-phase domain guard, and the bootstrap loop —
suggestions converted to rules must pass the gate on the data that
produced them."""

from pyspark.sql import functions as F

from schemasaurus_spark.operators.quality_gate import quality_gate
from schemasaurus_spark.operators.suggest import suggest_constraints, to_rules


def _frame(spark):
    rows = [
        (i, None if i % 5 == 0 else f"t{i}", ["a", "b"][i % 2], i % 7, float(i))
        for i in range(1, 21)
    ]
    return spark.createDataFrame(
        rows, "id bigint, txt string, cat string, small int, score double"
    )


def test_every_suggestion_branch(spark):
    out = suggest_constraints(_frame(spark), categorical_max_distinct=3)
    got = {(r.col_name, r.suggestion): r.arg for r in out.collect()}
    assert got[("id", "not_null")] is None
    assert got[("id", "unique")] is None
    assert got[("id", "value_range")] == "1..20"
    # txt: 4 of 20 NULL -> completeness floor((100*16)//20) = 80, no unique
    assert got[("txt", "completeness_ge")] == "80"
    assert ("txt", "unique") not in got and ("txt", "not_null") not in got
    assert got[("txt", "max_length_le")] == "3"  # 't19'
    assert ("txt", "categorical_domain") not in got  # 16 distinct > 3
    assert got[("cat", "categorical_domain")] == "a,b"
    assert got[("small", "value_range")] == "0..6"
    assert ("small", "unique") not in got
    # double column: no value_range (integral-only), no max_length
    assert not any(c == "score" and s in ("value_range", "max_length_le")
                   for c, s in got)
    assert got[("score", "not_null")] is None


def test_all_null_and_empty_suggest_nothing(spark):
    df = spark.createDataFrame([(None,), (None,)], "x string")
    assert suggest_constraints(df).count() == 0
    empty = spark.createDataFrame([], "x string, y bigint")
    assert suggest_constraints(empty).count() == 0


def test_column_subset_and_unknown_column(spark):
    df = _frame(spark)
    out = suggest_constraints(df, columns=["id"])
    assert {r.col_name for r in out.collect()} == {"id"}
    try:
        suggest_constraints(df, columns=["nope"])
        assert False, "expected ValueError"
    except ValueError as e:
        assert "nope" in str(e)


def test_bootstrap_loop_suggest_then_gate_passes(spark):
    df = _frame(spark)
    rules = to_rules(suggest_constraints(df, categorical_max_distinct=3))
    assert rules  # every suggestion kind mapped
    verdicts = quality_gate(df, rules).collect()
    assert all(v.passed for v in verdicts), [
        (v.rule_id, v.value) for v in verdicts if not v.passed
    ]
    # and the gate actually checks something: perturb -> some rule fails
    worse = df.withColumn("id", F.when(F.col("id") == 3, None).otherwise(F.col("id")))
    verdicts2 = quality_gate(worse, rules).collect()
    assert any(not v.passed for v in verdicts2)
