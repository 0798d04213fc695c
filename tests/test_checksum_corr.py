"""Dataset checksum (diff.dataset_checksum) and exact Pearson profile
(stats.correlation_profile): invariance, sensitivity, and closed-form
arithmetic checks."""

import math

from schemasaurus_spark.operators.diff import dataset_checksum
from schemasaurus_spark.operators.stats import correlation_profile


def _chk(spark, rows, ddl, cols=None, parts=None):
    df = spark.createDataFrame(rows, ddl)
    if parts:
        df = df.repartition(parts)
    r = dataset_checksum(df, cols).collect()[0]
    return r.n_rows, r.checksum


def test_checksum_order_and_partition_invariant(spark):
    rows = [(i, f"t{i}", None if i % 5 == 0 else i * 2) for i in range(200)]
    ddl = "id bigint, s string, v bigint"
    a = _chk(spark, rows, ddl, parts=1)
    b = _chk(spark, list(reversed(rows)), ddl, parts=32)
    assert a == b and a[0] == 200


def test_checksum_detects_any_change(spark):
    rows = [(1, "a"), (2, "b")]
    base = _chk(spark, rows, "id bigint, s string")
    assert _chk(spark, [(1, "a"), (2, "c")], "id bigint, s string") != base
    assert _chk(spark, [(1, "a"), (2, None)], "id bigint, s string") != base
    # multiset semantics: duplicate rows count
    dup = _chk(spark, rows + [(2, "b")], "id bigint, s string")
    assert dup != base and dup[0] == 3
    # NULL vs the string '-' must not collide (fixed-width segments)
    assert _chk(spark, [(None,)], "s string") != _chk(spark, [("-",)], "s string")


def test_checksum_empty_is_zero(spark):
    df = spark.createDataFrame([], "id bigint")
    r = dataset_checksum(df).collect()[0]
    assert (r.n_rows, r.checksum) == (0, 0)


def _pearson(pairs):
    xs = [x for x, y in pairs]
    ys = [y for x, y in pairs]
    n = len(pairs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in pairs)
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    denx = math.sqrt(n * sxx - sx * sx)
    deny = math.sqrt(n * syy - sy * sy)
    if denx == 0 or deny == 0:
        return None
    return (n * sxy - sx * sy) / (denx * deny)


def test_correlation_exact_formula_parity(spark):
    rows = [(i, 3 * i + 1, (i * 7) % 5, 9) for i in range(50)]
    df = spark.createDataFrame(rows, "a bigint, b bigint, c bigint, k bigint")
    got = {
        (r.col_x, r.col_y): r
        for r in correlation_profile(df, ["a", "b", "c", "k"]).collect()
    }
    # bit-identical with the Python mirror of the same IEEE formula —
    # including the affine pair, where sqrt(a)*sqrt(b) lands one ulp
    # under 1.0 (the formula is exact, floats are floats)
    want_ab = _pearson([(i, 3 * i + 1) for i in range(50)])
    assert got[("a", "b")].r == want_ab and abs(want_ab - 1.0) < 1e-12
    assert got[("a", "k")].r is None  # zero variance side
    want_ac = _pearson([(i, (i * 7) % 5) for i in range(50)])
    assert got[("a", "c")].r == want_ac  # bit-identical, not approx
    assert got[("a", "b")].n == 50


def test_correlation_pairwise_nulls_and_validation(spark):
    rows = [(1, 10, None), (2, 20, 5), (3, None, 6), (4, 40, 7)]
    df = spark.createDataFrame(rows, "a bigint, b bigint, c bigint")
    got = {
        (r.col_x, r.col_y): r for r in correlation_profile(df, ["a", "b", "c"]).collect()
    }
    assert got[("a", "b")].n == 3  # row 3 excluded pairwise
    assert got[("b", "c")].n == 2
    assert got[("a", "b")].r == _pearson([(1, 10), (2, 20), (4, 40)])
    for bad_cols, exc in [(["a"], ValueError), (["a", "nope"], ValueError)]:
        try:
            correlation_profile(df, bad_cols)
            assert False
        except exc:
            pass
    fdf = spark.createDataFrame([(1.5, 2)], "x double, y bigint")
    try:
        correlation_profile(fdf, ["x", "y"])
        assert False
    except ValueError as e:
        assert "non-integral" in str(e)


def test_category_concentration_hand_computed(spark):
    import math

    from schemasaurus_spark.operators.stats import category_concentration

    # a: 8x'x', 2x'y'  -> p = .8/.2 ; b: constant ; c: has NULLs
    rows = [("x", "k", "v" if i < 5 else None) for i in range(8)]
    rows += [("y", "k", "v") for _ in range(2)]
    df = spark.createDataFrame(rows, "a string, b string, c string")
    got = {r.column: r for r in category_concentration(df, ["a", "b", "c"]).collect()}
    a = got["a"]
    assert (a.n, a.n_distinct, a.max_share) == (10, 2, 0.8)
    assert a.gini == round(1 - (0.64 + 0.04), 6)
    want_ent = round(-(0.8 * math.log(0.8) + 0.2 * math.log(0.2)), 6)
    assert a.entropy == want_ent
    assert a.norm_entropy == round(want_ent / math.log(2.0), 6)
    b = got["b"]
    assert (b.n_distinct, b.entropy, b.norm_entropy) == (1, 0.0, None)
    import math as _m
    assert _m.copysign(1, b.entropy) == 1.0  # +0.0, not -0.0
    assert got["c"].n == 7  # NULLs excluded from the value distribution
