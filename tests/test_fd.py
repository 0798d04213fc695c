"""Functional-dependency discovery (operators/fd.py): planted holding /
failing / NULL-edge FDs against hand-computed expectations."""

from schemasaurus_spark.operators.fd import fd_profile


def _rows(spark, data, ddl):
    df = spark.createDataFrame(data, ddl)
    return {(r.lhs, r.rhs): r for r in fd_profile(df).collect()}


def test_planted_fds(spark):
    # id is a key; cat -> grp holds (a->x, b->y); grp -> cat fails
    # (x maps to both a and c)
    data = [
        (1, "a", "x"),
        (2, "a", "x"),
        (3, "b", "y"),
        (4, "c", "x"),
    ]
    got = _rows(spark, data, "id bigint, cat string, grp string")
    assert got[("id", "cat")].holds and got[("id", "grp")].holds
    assert got[("id", "cat")].n_groups == 4
    assert got[("cat", "grp")].holds
    assert got[("cat", "grp")].n_groups == 3
    r = got[("grp", "cat")]
    assert not r.holds and r.n_violating == 1 and r.n_groups == 2
    # cat -> id fails: group 'a' has ids {1, 2}
    assert not got[("cat", "id")].holds


def test_null_semantics(spark):
    # NULL lhs is a group; NULL rhs never violates
    data = [
        (None, "x"),
        (None, "x"),
        ("a", None),
        ("a", "y"),
        ("b", None),
    ]
    got = _rows(spark, data, "k string, v string")
    r = got[("k", "v")]
    # groups: NULL->{x}, a->{y} (NULL ignored), b->{} -> all hold
    assert r.holds and r.n_groups == 3 and r.n_violating == 0
    # v -> k: x->{NULL excluded...}: count_distinct(k) ignores NULL ->
    # x maps to {} (both k NULL), y->{a}, NULL group -> {a, b} violates
    r2 = got[("v", "k")]
    assert not r2.holds and r2.n_violating == 1


def test_empty_and_errors(spark):
    df = spark.createDataFrame([], "a string, b string")
    got = {(r.lhs, r.rhs): r for r in fd_profile(df).collect()}
    assert got[("a", "b")].holds and got[("a", "b")].n_groups == 0
    try:
        fd_profile(df, ["a"])
        assert False
    except ValueError:
        pass
    try:
        fd_profile(df, ["a", "nope"])
        assert False
    except ValueError as e:
        assert "nope" in str(e)
