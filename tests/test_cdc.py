"""Changelog (CDC) resolution: latest-revision semantics vs brute force,
delete handling, snapshot merge, and partitioning invariance."""

import random

from pyspark.sql import functions as F

from schemasaurus_spark.operators.cdc import (
    apply_changelog,
    latest_revisions,
    scd2_intervals,
)


def _brute_latest(rows, with_op=True):
    """rows: (doc_id, rev, op, text). Latest rev per key; drop keys whose
    winning op is delete."""
    best = {}
    for k, rev, op, text in rows:
        if k not in best or rev > best[k][0]:
            best[k] = (rev, op, text)
    return {
        k: (rev, op, text)
        for k, (rev, op, text) in best.items()
        if not (with_op and op == "delete")
    }


def test_latest_revisions_matches_brute_force_and_is_partition_invariant(spark):
    rng = random.Random(7)
    rows = []
    for k in range(40):
        for rev in range(rng.randint(1, 6)):
            op = "delete" if rng.random() < 0.2 else "upsert"
            rows.append((k, rev, op, f"text-{k}-{rev}"))
    df = spark.createDataFrame(rows, ["doc_id", "rev", "op", "text"])
    want = _brute_latest(rows)
    for frame in (df, df.repartition(13)):
        got = {
            r.doc_id: (r.rev, r.op, r.text)
            for r in latest_revisions(frame, op_col="op").collect()
        }
        assert got == want
    # non-vacuous: some key must actually have been deleted
    assert len(want) < 40


def test_latest_revisions_delete_then_reupsert_resurrects(spark):
    rows = [(1, 0, "upsert", "a"), (1, 1, "delete", None), (1, 2, "upsert", "c"),
            (2, 0, "upsert", "x"), (2, 1, "delete", None)]
    df = spark.createDataFrame(rows, ["doc_id", "rev", "op", "text"])
    got = {r.doc_id: r.text for r in latest_revisions(df, op_col="op").collect()}
    assert got == {1: "c"}


def test_latest_revisions_multi_column_version_and_null_op(spark):
    # version = (ts, seq): lexicographic struct order, ties broken by seq;
    # a NULL op row is an upsert, never dropped
    rows = [(1, 10, 0, "upsert", "old"), (1, 10, 1, None, "new"),
            (2, 5, 0, "upsert", "only")]
    df = spark.createDataFrame(rows, ["doc_id", "ts", "seq", "op", "text"])
    got = {
        r.doc_id: r.text
        for r in latest_revisions(df, version_cols=("ts", "seq"), op_col="op").collect()
    }
    assert got == {1: "new", 2: "only"}


def test_corpus_diff_classifies_and_handles_nulls(spark):
    """added/removed/changed classification; NULL vs the literal string
    'null' (and a value containing the separator) must NOT collide in the
    fingerprint; unchanged rows are absent."""
    from schemasaurus_spark.operators.diff import corpus_diff

    old = spark.createDataFrame(
        [(1, "same", "en"), (2, "will change", "en"), (3, "gone", "de"),
         (4, None, "en"), (5, "\x00null\x00", "en")],
        ["doc_id", "text", "lang"],
    )
    new = spark.createDataFrame(
        [(1, "same", "en"), (2, "did change", "en"),
         (4, "\x00null\x00", "en"),  # NULL -> sentinel-looking string: changed
         (5, None, "en"),            # sentinel-looking string -> NULL: changed
         (6, "brand new", "fr")],
        ["doc_id", "text", "lang"],
    )
    got = {r.doc_id: r.change for r in corpus_diff(old, new).collect()}
    assert got == {2: "changed", 3: "removed", 4: "changed", 5: "changed", 6: "added"}
    # explicit compare_cols: restricting to lang hides the text edits
    got_lang = {
        r.doc_id: r.change
        for r in corpus_diff(old, new, compare_cols=["lang"]).collect()
    }
    assert got_lang == {3: "removed", 6: "added"}


def test_apply_changelog_merges_base_snapshot(spark):
    base = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], ["doc_id", "text"]
    )
    chg = spark.createDataFrame(
        [(2, 0, "upsert", "two-v2"), (3, 0, "delete", None),
         (4, 0, "upsert", "four"), (4, 1, "upsert", "four-v2")],
        ["doc_id", "rev", "op", "text"],
    )
    merged = apply_changelog(base, chg, op_col="op")
    assert merged.columns == base.columns
    got = {r.doc_id: r.text for r in merged.collect()}
    assert got == {1: "one", 2: "two-v2", 4: "four-v2"}


def _brute_scd2(rows):
    """rows: (doc_id, rev, op, text) -> {(doc_id, valid_from): (valid_to,
    is_current, op, text)} for upsert revisions only; every revision
    (including deletes) closes the interval before it."""
    by_key = {}
    for k, rev, op, text in rows:
        by_key.setdefault(k, []).append((rev, op, text))
    out = {}
    for k, revs in by_key.items():
        revs.sort()
        for i, (rev, op, text) in enumerate(revs):
            nxt = revs[i + 1][0] if i + 1 < len(revs) else None
            if op != "delete":
                out[(k, rev)] = (nxt, nxt is None, op, text)
    return out


def test_scd2_intervals_matches_brute_force_and_is_partition_invariant(spark):
    rng = random.Random(11)
    rows = []
    for k in range(40):
        for rev in range(rng.randint(1, 6)):
            op = "delete" if rng.random() < 0.25 else "upsert"
            rows.append((k, rev, op, f"text-{k}-{rev}"))
    df = spark.createDataFrame(rows, ["doc_id", "rev", "op", "text"])
    want = _brute_scd2(rows)
    for frame in (df, df.repartition(13)):
        got = {
            (r.doc_id, r.valid_from): (r.valid_to, r.is_current, r.op, r.text)
            for r in scd2_intervals(frame, op_col="op").collect()
        }
        assert got == want
    # non-vacuous fixture: closed, current, and delete-closed intervals exist
    assert any(vt is not None for vt, _, _, _ in want.values())
    assert any(cur for _, cur, _, _ in want.values())
    assert any(  # some key's final op is a delete -> no current row at all
        all(not want[(k, vf)][1] for (kk, vf) in want if kk == k)
        for k in {k for k, _ in want}
    )


def test_scd2_delete_closes_interval_and_upsert_resurrects(spark):
    chg = spark.createDataFrame(
        [(1, 0, "upsert", "a"), (1, 1, "delete", None), (1, 2, "upsert", "b"),
         (2, 0, "upsert", "x"), (2, 1, "delete", None)],
        ["doc_id", "rev", "op", "text"],
    )
    got = {
        (r.doc_id, r.valid_from): (r.valid_to, r.is_current)
        for r in scd2_intervals(chg, op_col="op").collect()
    }
    # key 1: rev 0 closed BY the delete at rev 1; rev 2 resurrected + open
    # key 2: rev 0 closed by its delete, and no current row survives
    assert got == {(1, 0): (1, False), (1, 2): (None, True), (2, 0): (1, False)}


def test_scd2_without_op_col_every_revision_is_an_interval(spark):
    chg = spark.createDataFrame(
        [(1, 0, "a"), (1, 3, "b"), (1, 7, "c")], ["doc_id", "rev", "text"]
    )
    got = sorted(
        (r.valid_from, r.valid_to, r.is_current, r.text)
        for r in scd2_intervals(chg).collect()
    )
    assert got == [(0, 3, False, "a"), (3, 7, False, "b"), (7, None, True, "c")]
