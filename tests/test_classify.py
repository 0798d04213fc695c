"""Naive Bayes classifier (operators/classify.py): exact Python parity
of the fixed-point train/score chain, held-out accuracy on separable
classes, Laplace/unseen-token handling, prior-only fallback, the
vocabulary cap, and partition invariance."""

import hashlib
import math

from pyspark.sql import functions as F

from schemasaurus_spark.operators.classify import (
    nb_bucket,
    nb_classify,
    nb_train,
    nb_train_classify,
)

FP = 1_000_000.0


def _bucket(key, seed=0):
    return int(hashlib.md5(f"{key}:nb:{seed}".encode()).hexdigest()[:4], 16)


def _fp(x):
    return math.floor(x * FP + 0.5)


def _nb_py(train_rows, test_rows, max_vocab=100_000):
    """(doc_id -> (predicted, score)) with the module's exact arithmetic."""
    toks = lambda t: t.strip().lower().split()
    counts, totals, ndocs, tok_counts = {}, {}, {}, {}
    for _, text, label in train_rows:
        ndocs[label] = ndocs.get(label, 0) + 1
        for t in toks(text):
            tok_counts[t] = tok_counts.get(t, 0) + 1
    vocab = set(
        t
        for t, _ in sorted(tok_counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :max_vocab
        ]
    )
    for _, text, label in train_rows:
        for t in toks(text):
            if t in vocab:
                counts[(t, label)] = counts.get((t, label), 0) + 1
                totals[label] = totals.get(label, 0) + 1
    v = len(vocab)
    n_train = sum(ndocs.values())
    labels = sorted(ndocs)
    prior = {c: _fp(math.log(float(ndocs[c]) / float(n_train))) for c in labels}
    w0 = {c: _fp(math.log(1.0 / (float(totals.get(c, 0)) + float(v)))) for c in labels}
    w = {
        (t, c): _fp(math.log((cnt + 1.0) / (float(totals[c]) + float(v))))
        for (t, c), cnt in counts.items()
    }
    out = {}
    for did, text, _ in test_rows:
        best = None
        for c in labels:
            s = prior[c] + sum(
                w.get((t, c), w0[c]) for t in toks(text) if t in vocab
            )
            if best is None or (-s, c) < best:
                best = (-s, c)
        out[did] = (best[1], -best[0])
    return out


def _mk_rows(n=120, seed_words=None):
    seed_words = seed_words or {
        "red": "apple cherry crimson scarlet ruby",
        "green": "leaf moss emerald jade fern",
        "blue": "ocean sky sapphire navy azure",
    }
    rows = []
    labels = sorted(seed_words)
    for i in range(n):
        lab = labels[i % 3]
        ws = seed_words[lab].split()
        text = " ".join(ws[(i + j) % len(ws)] for j in range(6)) + " the and"
        rows.append((i, text, lab))
    return rows


def test_holdout_accuracy_on_separable_classes(spark):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    preds = nb_train_classify(df, label_col="lang").collect()
    assert len(preds) > 20
    acc = sum(1 for r in preds if r.predicted == r.label) / len(preds)
    assert acc == 1.0, acc


def test_python_parity_exact(spark):
    rows = _mk_rows(60)
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    got = {
        r.doc_id: (r.predicted, r.score)
        for r in nb_train_classify(df, label_col="lang").collect()
    }
    thr = int(round(0.7 * 65536))
    train = [r for r in rows if _bucket(r[0]) < thr]
    test = [r for r in rows if _bucket(r[0]) >= thr]
    want = _nb_py(train, test)
    assert got == want


def test_vocab_cap_parity(spark):
    rows = _mk_rows(60)
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    got = {
        r.doc_id: (r.predicted, r.score)
        for r in nb_train_classify(df, label_col="lang", max_vocab=4).collect()
    }
    thr = int(round(0.7 * 65536))
    train = [r for r in rows if _bucket(r[0]) < thr]
    test = [r for r in rows if _bucket(r[0]) >= thr]
    want = _nb_py(train, test, max_vocab=4)
    assert got == want


def test_prior_only_for_out_of_vocab_doc(spark):
    rows = _mk_rows(60)
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    model = nb_train(df, label_col="lang")
    probe = spark.createDataFrame(
        [(999, "zzz qqq xxx")], "doc_id bigint, text string"
    )
    got = nb_classify(model, probe).collect()
    assert len(got) == 1
    # prior-only: predicted is the class with the max prior_fp (tie -> label asc)
    best = min((-p, lab) for lab, p, _, _, _ in model.classes)
    assert got[0].predicted == best[1]
    assert got[0].score == -best[0]


def test_null_label_and_null_text_excluded(spark):
    rows = _mk_rows(40) + [(900, "apple cherry", None), (901, None, "red"), (902, "   ", "red")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    preds = nb_train_classify(df, label_col="lang").collect()
    ids = {r.doc_id for r in preds}
    assert 900 not in ids and 901 not in ids and 902 not in ids


def test_partition_invariance(spark):
    rows = _mk_rows(90)
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    a = sorted(map(tuple, nb_train_classify(df, label_col="lang").collect()))
    b = sorted(
        map(tuple, nb_train_classify(df.repartition(13), label_col="lang").collect())
    )
    assert a == b


def test_bucket_matches_python(spark):
    df = spark.range(50).select(F.col("id").alias("doc_id"))
    got = {r.doc_id: r.b for r in df.select("doc_id", nb_bucket("doc_id").alias("b")).collect()}
    for i in range(50):
        assert got[i] == _bucket(i)


def test_confusion_matrix_closed_form(spark):
    from schemasaurus_spark.operators.classify import confusion_matrix

    preds = spark.createDataFrame(
        [("a", "a"), ("a", "a"), ("a", "b"), ("b", "b")],
        "label string, predicted string",
    )
    got = {
        (r.label, r.predicted): (r.n, r.share_of_label)
        for r in confusion_matrix(preds).collect()
    }
    assert got == {
        ("a", "a"): (2, round(2 / 3, 6)),
        ("a", "b"): (1, round(1 / 3, 6)),
        ("b", "b"): (1, 1.0),
    }


def test_nb_train_empty_input_raises(spark):
    df = spark.createDataFrame(
        [(1, None, "a"), (2, "  ", "a"), (3, "words here", None)],
        "doc_id bigint, text string, lang string",
    )
    try:
        nb_train(df, label_col="lang")
        raise AssertionError("expected ValueError on empty training signal")
    except ValueError as ex:
        assert "no labeled" in str(ex)
