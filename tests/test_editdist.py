"""Edit-distance similarity join (operators/editdist.py): brute-force
parity (the exactness claim IS the contract), the short-panel escape
hatch, distance-0 duplicates, and the threshold boundary."""

import random

from schemasaurus_spark.operators.editdist import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, k):
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1 :]:
            if sa is None or sb is None:
                continue
            d = _lev(sa, sb)
            if d <= k:
                lo, hi = min(ia, ib), max(ia, ib)
                out.add((lo, hi, d))
    return out


def _got(spark, rows, k, q=2):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(df, max_dist=k, q=q).collect()
    }


def test_brute_force_parity_planted_typos(spark):
    rng = random.Random(41)
    alphabet = "abcde "
    rows = []
    for i in range(90):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(6, 18)))
        rows.append((i, s))
        if i % 3 == 0:  # planted single-char substitution
            p = rng.randrange(len(s))
            rows.append((1000 + i, s[:p] + "z" + s[p + 1 :]))
        if i % 7 == 0:  # planted deletion
            p = rng.randrange(len(s))
            rows.append((2000 + i, s[:p] + s[p + 1 :]))
    for k in (1, 2):
        want = _brute(rows, k)
        assert _got(spark, rows, k) == want and want, f"k={k}"


def test_short_strings_and_empties(spark):
    # every string at or below the short-panel bound, incl. zero-gram and
    # empty — the gram join sees nothing here; the panel must catch all
    rows = [(i, s) for i, s in enumerate(["", "a", "b", "ab", "ba", "abc",
                                          "abcd", "xy", "x", "abcde"])]
    for k in (1, 2):
        assert _got(spark, rows, k) == _brute(rows, k)


def test_mixed_short_long_boundary(spark):
    # pairs straddling the short/long boundary (len 5 vs 6 at q=2,k=2)
    rows = [(1, "abcde"), (2, "abcdef"), (3, "abcdx"), (4, "zzzzzz"),
            (5, "abcdefg"), (6, None)]
    assert _got(spark, rows, 2) == _brute(rows, 2)


def test_exact_duplicates_are_distance_zero(spark):
    rows = [(1, "same title"), (2, "same title"), (3, "same titl")]
    got = _got(spark, rows, 1)
    assert (1, 2, 0) in got and (1, 3, 1) in got and (2, 3, 1) in got


def test_threshold_is_strict(spark):
    rows = [(1, "aaaa"), (2, "bbbb")]  # distance 4
    assert _got(spark, rows, 2) == set()
    assert _got(spark, rows, 4) == {(1, 2, 4)}
