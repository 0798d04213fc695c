"""Property-based armor for the session-11 algorithmic kernels:
sorted_array_contains (exact binary search as a fixed-depth fold) and
the CUSUM closed form.  One Spark job per property batch: hypothesis
generates the cases, Spark evaluates them all in one DataFrame pass
(per-example Spark jobs would take minutes)."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from schemasaurus_spark.operators.arrays import sorted_array_contains
from schemasaurus_spark.operators.cusum import cusum_changepoints, quantize

_token = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), max_size=8
)


@settings(max_examples=30, deadline=None)
@given(
    vocab=st.lists(_token, min_size=0, max_size=60, unique=True),
    probes=st.lists(_token, min_size=1, max_size=10),
)
def test_sorted_array_contains_matches_python(spark, vocab, probes):
    vocab_sorted = sorted(vocab)
    arr = (
        F.array(*[F.lit(v) for v in vocab_sorted])
        if vocab_sorted
        else F.array().cast("array<string>")
    )
    df = spark.createDataFrame([(p,) for p in probes], "key string")
    got = df.select(
        "key", sorted_array_contains(arr, F.col("key")).alias("hit")
    ).collect()
    expect = set(vocab)
    for r in got:
        assert r.hit == (r.key in expect), (r.key, vocab_sorted)


@settings(max_examples=15, deadline=None)
@given(
    values=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=40,
    ),
    target=st.floats(min_value=-100, max_value=100, allow_nan=False),
    slack=st.floats(min_value=0, max_value=10, allow_nan=False),
)
def test_cusum_closed_form_matches_recurrence(spark, values, target, slack):
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), "e", v)
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = (
        cusum_changepoints(df, target=target, threshold=1.0, slack=slack)
        .orderBy("event_id")
        .collect()
    )
    up = dn = 0
    q_up = quantize(target) + quantize(slack)
    q_dn = quantize(target) - quantize(slack)
    for r, v in zip(got, values):
        qv = quantize(v)
        up = max(0, up + (qv - q_up))
        dn = max(0, dn + (q_dn - qv))
        assert (r.cusum_up_q, r.cusum_down_q) == (up, dn), (v, target, slack)
