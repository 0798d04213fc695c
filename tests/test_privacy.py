"""Privacy audit (operators/privacy.py): planted under-k groups,
l-diversity with NULL-sensitive semantics, k-subsumes-l reporting, and
the gate-able summary."""

from schemasaurus_spark.operators.privacy import k_anonymity_report, privacy_summary


def _frame(spark):
    # groups by (zip, yob): A=3 rows diverse, B=3 rows single-diagnosis,
    # C=1 row (under k), D=2 rows with NULL zip (NULL is a group value),
    # E=2 rows whose sensitive values are NULL (diversity 0)
    rows = [
        ("94z", 1980, "flu"), ("94z", 1980, "cold"), ("94z", 1980, "flu"),
        ("10x", 1990, "hiv"), ("10x", 1990, "hiv"), ("10x", 1990, "hiv"),
        ("77q", 1955, "flu"),
        (None, 2000, "flu"), (None, 2000, "cold"),
        ("33a", 1970, None), ("33a", 1970, None),
    ]
    return spark.createDataFrame(rows, "zip string, yob int, diag string")


def test_k_anonymity_only(spark):
    got = {
        (r.zip, r.yob): r
        for r in k_anonymity_report(_frame(spark), ["zip", "yob"], k=2).collect()
    }
    assert set(got) == {("77q", 1955)}
    assert got[("77q", 1955)].group_size == 1
    assert got[("77q", 1955)].issue == "k_anonymity"


def test_l_diversity_and_subsumption(spark):
    got = {
        (r.zip, r.yob): r
        for r in k_anonymity_report(
            _frame(spark), ["zip", "yob"], k=2, sensitive_col="diag", l=2
        ).collect()
    }
    # 10x: 3 rows, 1 distinct diag -> l_diversity; 77q: under k (subsumes);
    # 33a: 2 rows, 0 non-null diags -> l_diversity; NULL-zip group: diverse
    assert got[("10x", 1990)].issue == "l_diversity"
    assert got[("10x", 1990)].distinct_sensitive == 1
    assert got[("77q", 1955)].issue == "k_anonymity"
    assert got[("33a", 1970)].issue == "l_diversity"
    assert got[("33a", 1970)].distinct_sensitive == 0
    assert (None, 2000) not in got and ("94z", 1980) not in got


def test_summary_and_validation(spark):
    r = privacy_summary(_frame(spark), ["zip", "yob"], k=2).collect()[0]
    assert (r.n_groups, r.n_violating_groups, r.n_exposed_rows) == (5, 1, 1)
    assert r.min_group_size == 1 and not r.is_k_anonymous
    ok = privacy_summary(_frame(spark), ["zip", "yob"], k=1).collect()[0]
    assert ok.is_k_anonymous and ok.n_exposed_rows == 0
    empty = spark.createDataFrame([], "zip string, yob int")
    e = privacy_summary(empty, ["zip"], k=5).collect()[0]
    assert e.is_k_anonymous and e.n_groups == 0
    for bad in (
        lambda: k_anonymity_report(_frame(spark), [], 2),
        lambda: k_anonymity_report(_frame(spark), ["zip"], 0),
        lambda: k_anonymity_report(_frame(spark), ["zip"], 2, sensitive_col="diag"),
    ):
        try:
            bad()
            assert False
        except ValueError:
            pass


def test_suppress_under_k_null_safe_and_sound(spark):
    from schemasaurus_spark.operators.privacy import suppress_under_k

    df = _frame(spark)
    out = suppress_under_k(df, ["zip", "yob"], k=2)
    kept = {(r.zip, r.yob) for r in out.collect()}
    assert ("77q", 1955) not in kept            # under-k group removed whole
    assert (None, 2000) in kept                 # NULL group of 2 survives k=2
    assert out.count() == 10
    # result is k-anonymous by construction
    s = privacy_summary(out, ["zip", "yob"], k=2).collect()[0]
    assert s.is_k_anonymous
    # null-safe removal: with k=3 the NULL-zip group (size 2) must GO —
    # the classic broken version leaves NULL groups behind
    out3 = suppress_under_k(df, ["zip", "yob"], k=3)
    assert (None, 2000) not in {(r.zip, r.yob) for r in out3.collect()}


# ------------------------------------------------------------- pseudonymize


def _pseudo_df(spark):
    rows = [(1, "alice", "alice"), (2, "bob", "alice"), (3, None, "bob")]
    return spark.createDataFrame(rows, "id long, user string, referrer string")


def test_pseudonymize_deterministic_null_and_python_parity(spark):
    import hashlib

    from schemasaurus_spark.operators.privacy import pseudonymize

    df = _pseudo_df(spark)
    a = {r.id: r.user for r in pseudonymize(df, ["user"], secret="s1").collect()}
    b = {r.id: r.user for r in pseudonymize(df, ["user"], secret="s1").collect()}
    assert a == b  # deterministic across runs
    assert a[3] is None  # NULL stays NULL
    assert a[1] != a[2] and all(len(v) == 32 for v in a.values() if v)
    # engine-portable: plain sha256 over the documented preimage
    assert a[1] == hashlib.sha256(b"s1:user:alice").hexdigest()[:32]


def test_pseudonymize_column_name_in_preimage_and_secret_isolation(spark):
    from schemasaurus_spark.operators.privacy import pseudonymize

    out = {
        r.id: r
        for r in pseudonymize(_pseudo_df(spark), ["user", "referrer"], "s1").collect()
    }
    # same raw value in two different columns -> unrelated surrogates
    assert out[1].user != out[1].referrer
    # same column, same value -> same surrogate (joins survive)
    assert out[1].referrer == out[2].referrer
    # a different secret produces a disjoint mapping
    other = {
        r.id: r.user for r in pseudonymize(_pseudo_df(spark), ["user"], "s2").collect()
    }
    assert other[1] != out[1].user


def test_pseudonymize_validation(spark):
    import pytest as _pytest

    from schemasaurus_spark.operators.privacy import pseudonymize

    df = _pseudo_df(spark)
    with _pytest.raises(ValueError):
        pseudonymize(df, [], "s")
    with _pytest.raises(ValueError):
        pseudonymize(df, ["nope"], "s")
    with _pytest.raises(ValueError):
        pseudonymize(df, ["user"], "s", truncate=4)
