"""Join-key skew profile (operators/skew.py): planted hot key, NULL-key
handling, salt-factor arithmetic, top-N truncation."""

import math

from schemasaurus_spark.operators.skew import skew_profile


def test_planted_hot_key_and_salt_factor(spark):
    # 1000 rows on hot key + 100 keys x 10 rows: n=2000, n_distinct=101
    rows = [(0,)] * 1000 + [(k,) for k in range(1, 101) for _ in range(10)]
    df = spark.createDataFrame(rows, "k bigint")
    prof = skew_profile(df, "k", top_n=5).collect()
    assert len(prof) == 5
    head = prof[0]
    assert (head.rank, head.key, head.cnt) == (1, 0, 1000)
    assert head.share == 0.5
    assert head.salt_factor == math.ceil(1000 * 101 / 2000)  # 51
    assert all(r.salt_factor == 1 for r in prof[1:])  # avg-load keys
    # cumulative share strictly increases with rank
    assert [round(r.cum_share, 6) for r in prof] == sorted(
        round(r.cum_share, 6) for r in prof
    )


def test_null_keys_profile_like_values(spark):
    rows = [(None,)] * 30 + [("a",)] * 5 + [("b",)] * 2
    df = spark.createDataFrame(rows, "k string")
    prof = skew_profile(df, "k", top_n=3).collect()
    assert prof[0].key is None and prof[0].cnt == 30
    assert prof[0].salt_factor == math.ceil(30 * 3 / 37)


def test_top_n_and_validation(spark):
    df = spark.createDataFrame([(i % 7,) for i in range(70)], "k bigint")
    assert skew_profile(df, "k", top_n=3).count() == 3
    assert skew_profile(df, "k", top_n=50).count() == 7
    try:
        skew_profile(df, "k", top_n=0)
        assert False
    except ValueError:
        pass
