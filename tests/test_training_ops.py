"""Round-4 training-pipeline operators: exact substring dedup (Lee et al.
ACL 2022 style) and PII redaction.  Substring spans are property-checked
against an independent pure-Python brute force (raw window strings, no
hashing) on randomized corpora, plus planted-passage fixtures.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from schemasaurus_spark.operators.pii import redact_pii
from schemasaurus_spark.operators.substring_dedup import (
    substring_dup_stats,
    substring_duplicate_spans,
)


def _brute_spans(texts: dict[int, str], window: int, min_count: int):
    """Independent reference: raw-string window counts + interval merge."""
    toks = {
        i: re.split(r"\s+", t.strip().lower())
        for i, t in texts.items()
        if t is not None and t.strip()
    }
    counts: dict[str, int] = {}
    for t in toks.values():
        for p in range(len(t) - window + 1):
            w = " ".join(t[p : p + window])
            counts[w] = counts.get(w, 0) + 1
    out = set()
    for i, t in toks.items():
        covered = [
            p
            for p in range(len(t) - window + 1)
            if counts[" ".join(t[p : p + window])] >= min_count
        ]
        start = end = None
        for p in covered:
            if start is None:
                start, end = p, p + window
            elif p <= end:
                end = p + window
            else:
                out.add((i, start, end, end - start))
                start, end = p, p + window
        if start is not None:
            out.add((i, start, end, end - start))
    return out


def _mk_docs(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )


def test_substring_spans_planted_passage(spark):
    passage = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    texts = {
        1: f"one two three {passage} four five",
        2: f"{passage} totally different tail words here",
        3: "no duplicated content in this document at all whatsoever",
        4: f"self repeat {passage} and again {passage} end",
    }
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in substring_duplicate_spans(
            _mk_docs(spark, texts), window=8, min_count=2
        ).collect()
    }
    assert got == _brute_spans(texts, 8, 2)
    # the planted passage is found in all three carrying docs
    assert {d for d, *_ in got} == {1, 2, 4}


def test_substring_spans_merge_overlapping_windows(spark):
    # a 10-token shared passage with window 8 covers positions p, p+1, p+2
    # -> ONE maximal span of 10 tokens, not three windows
    passage = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    texts = {1: f"{passage} unique tail one", 2: f"prefix {passage} other tail"}
    rows = substring_duplicate_spans(
        _mk_docs(spark, texts), window=8, min_count=2
    ).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    assert len(rows) == 2
    assert (by_doc[1]["span_start"], by_doc[1]["span_end"]) == (0, 10)
    assert (by_doc[2]["span_start"], by_doc[2]["span_end"]) == (1, 11)


def test_substring_spans_brute_force_parity_random(spark):
    import random

    rng = random.Random(13)
    vocab = [f"t{i}" for i in range(12)]  # tiny vocab forces chance repeats
    for trial in range(3):
        texts = {
            i: " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40)))
            for i in range(30)
        }
        texts[97] = None
        texts[98] = "   "
        texts[99] = "short doc"
        got = {
            (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
            for r in substring_duplicate_spans(
                _mk_docs(spark, texts), window=5, min_count=2
            ).collect()
        }
        assert got == _brute_spans(texts, 5, 2), f"trial {trial}"


def test_substring_dup_stats_rollup(spark):
    passage = "a b c d e f g h"
    texts = {1: f"{passage} x y", 2: f"z {passage}", 3: "all unique words here"}
    rows = substring_dup_stats(
        _mk_docs(spark, texts), window=8, min_count=2
    ).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    assert set(by_doc) == {1, 2}
    assert by_doc[1]["dup_tokens"] == 8 and by_doc[1]["n_doc_tokens"] == 10
    assert by_doc[1]["dup_fraction"] == 0.8


def test_pii_redaction_all_types(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "call 555-123-4567 or ssn 123-45-6789"),
            (3, "host 192.168.0.1 and 10.0.255.2"),
            (4, None),
            (5, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert rows[1]["n_email"] == 1
    assert rows[1]["text_redacted"] == "mail [EMAIL] now"
    assert rows[2]["n_phone"] == 1 and rows[2]["n_ssn"] == 1
    assert rows[2]["text_redacted"] == "call [PHONE] or ssn [SSN]"
    assert rows[3]["n_ipv4"] == 2
    assert rows[3]["text_redacted"] == "host [IPV4] and [IPV4]"
    assert rows[4]["text_redacted"] is None
    assert rows[4]["n_email"] == 0
    assert rows[5]["text_redacted"] == "nothing sensitive here"
    assert all(
        rows[5][c] == 0 for c in ("n_email", "n_ssn", "n_phone", "n_ipv4")
    )


def test_pii_counts_null_safe_and_column_order(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    out = redact_pii(df)
    assert out.columns == [
        "doc_id", "n_email", "n_ssn", "n_phone", "n_ipv4", "text_redacted",
    ]
    r = out.first()
    assert (r["n_email"], r["n_ssn"], r["n_phone"], r["n_ipv4"]) == (0, 0, 0, 0)


def test_packing_deterministic_and_budget_semantics(spark):
    from schemasaurus_spark.operators.packing import pack_documents, packing_stats

    texts = {i: " ".join(f"w{j}" for j in range(5 + i % 13)) for i in range(60)}
    texts[97] = None
    texts[98] = "  "
    df = _mk_docs(spark, texts)
    a = pack_documents(df, budget=16, n_shards=4, seed=3)
    rows = a.collect()
    # null/empty docs excluded; everyone else packed exactly once
    assert {r["doc_id"] for r in rows} == set(range(60))
    # determinism across partitioning: repartitioned input, same layout
    b = pack_documents(df.repartition(13), budget=16, n_shards=4, seed=3)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, b.collect()))
    # within a shard, offsets reconstruct the running concatenation:
    # sort docs by the md5 order key and replay the cumsum
    from pyspark.sql import functions as F2

    keyed = df.where(F2.col("text").isNotNull() & (F2.trim("text") != "")).select(
        "doc_id",
        F2.md5(F2.concat_ws(":", F2.col("doc_id").cast("string"), F2.lit("3"))).alias("k"),
    )
    order = {r["doc_id"]: r["k"] for r in keyed.collect()}
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, members in by_shard.items():
        members.sort(key=lambda r: order[r["doc_id"]])
        run = 0
        for r in members:
            assert r["seq_id"] == run // 16
            assert r["seq_offset"] == run % 16
            run += r["n_tokens"]
    # stats rollup: fill fraction in (0, 1], sequences cover the tokens
    st = {r["shard"]: r for r in packing_stats(a, budget=16).collect()}
    for shard, r in st.items():
        assert 0 < r["fill_fraction"] <= 1.0
        assert r["n_sequences"] >= r["total_tokens"] // 16


def test_packing_oversize_doc_spills(spark):
    from schemasaurus_spark.operators.packing import pack_documents

    df = _mk_docs(spark, {1: " ".join(f"t{i}" for i in range(40))})
    r = pack_documents(df, budget=16, n_shards=1, seed=0).first()
    assert r["n_tokens"] == 40 and r["seq_id"] == 0 and r["seq_offset"] == 0

    import pytest as _pt

    with _pt.raises(ValueError):
        pack_documents(df, budget=0)


# ---------------------------------------------------------------- decontam


def _brute_contamination(corpus: dict[int, str], bench: dict[int, str], window: int):
    """Independent reference: raw-string window join, no hashing."""
    def wins(t):
        toks = re.split(r"\s+", t.strip().lower())
        return [
            (p, " ".join(toks[p : p + window]))
            for p in range(len(toks) - window + 1)
        ]

    bench_set = {w for t in bench.values() if t and t.strip() for _, w in wins(t)}
    out = {}
    for i, t in corpus.items():
        if not t or not t.strip():
            continue
        hits = [(p, w) for p, w in wins(t) if w in bench_set]
        if hits:
            out[i] = (
                len(hits),
                len({w for _, w in hits}),
                min(p for p, _ in hits),
            )
    return out


def test_contamination_planted_overlap(spark):
    from schemasaurus_spark.operators.decontam import (
        contamination_report,
        decontaminate,
    )

    passage = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    bench = {100: f"question: {passage} answer: forty two"}
    corpus = {
        1: f"clean document with no overlap at all in any window",
        2: f"leaked {passage} verbatim inside a training doc",
        3: f"double {passage} and later {passage} again trailing",
    }
    got = {
        r["doc_id"]: (r["n_window_hits"], r["n_distinct_ngrams"], r["first_hit_pos"])
        for r in contamination_report(
            _mk_docs(spark, corpus), _mk_docs(spark, bench), window=8
        ).collect()
    }
    assert got == _brute_contamination(corpus, bench, 8)
    assert set(got) == {2, 3}
    kept = {
        r["doc_id"]
        for r in decontaminate(
            _mk_docs(spark, corpus), _mk_docs(spark, bench), window=8
        ).collect()
    }
    assert kept == {1}


def test_contamination_brute_force_parity_random(spark):
    import random

    from schemasaurus_spark.operators.decontam import contamination_report

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(3):
        bench = {
            1000 + i: " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 30)))
            for i in range(6)
        }
        corpus = {
            i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))
            for i in range(25)
        }
        window = rng.choice([4, 6])
        got = {
            r["doc_id"]: (
                r["n_window_hits"],
                r["n_distinct_ngrams"],
                r["first_hit_pos"],
            )
            for r in contamination_report(
                _mk_docs(spark, corpus),
                _mk_docs(spark, bench),
                window=window,
            ).collect()
        }
        assert got == _brute_contamination(corpus, bench, window), (
            f"trial {trial} window {window}"
        )


def test_contamination_partitioning_invariant(spark):
    from schemasaurus_spark.operators.decontam import contamination_report

    passage = " ".join(f"p{i}" for i in range(10))
    corpus = {i: f"doc {i} says {passage} here" for i in range(12)}
    bench = {99: f"eval asks about {passage} exactly"}
    a = contamination_report(
        _mk_docs(spark, corpus).repartition(1),
        _mk_docs(spark, bench),
        window=8,
    )
    b = contamination_report(
        _mk_docs(spark, corpus).repartition(7),
        _mk_docs(spark, bench),
        window=8,
        broadcast_benchmark=False,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------- repetition


def _brute_repetition(texts: dict[int, str], long_n: int):
    """Independent reference for the Gopher repetition signals."""
    out = {}
    for i, t in texts.items():
        if t is None or not t.strip():
            continue
        toks = re.split(r"\s+", t.strip().lower())
        if len(toks) < 2:
            continue
        bgs = [" ".join(toks[p : p + 2]) for p in range(len(toks) - 1)]
        counts: dict[str, int] = {}
        for g in bgs:
            counts[g] = counts.get(g, 0) + 1
        top = max(counts.items(), key=lambda kv: (kv[1], kv[0]))
        if len(toks) >= long_n:
            lgs = [
                " ".join(toks[p : p + long_n])
                for p in range(len(toks) - long_n + 1)
            ]
            lc: dict[str, int] = {}
            for g in lgs:
                lc[g] = lc.get(g, 0) + 1
            n_lg = len(lgs)
            dup = sum(c for c in lc.values() if c > 1) / n_lg
        else:
            n_lg, dup = 0, 0.0
        out[i] = (
            len(bgs),
            top[0],
            top[1],
            round(top[1] / len(bgs), 9),
            n_lg,
            round(dup, 9),
        )
    return out


def test_repetition_profile_planted(spark):
    from schemasaurus_spark.operators.repetition import (
        filter_repetitive,
        repetition_profile,
    )

    texts = {
        1: "spam spam spam spam spam spam",                      # one bigram owns all
        2: "all words here are completely distinct tokens now",  # no repetition
        3: "a b c d e a b c d e a b c d e",                      # repeated 5-gram loop
        4: "x",                                                  # too short: excluded
    }
    got = {
        r["doc_id"]: (
            r["n_bigrams"],
            r["top_bigram"],
            r["top_bigram_count"],
            round(r["top_bigram_frac"], 9),
            r["n_longgrams"],
            round(r["dup_longgram_frac"], 9),
        )
        for r in repetition_profile(_mk_docs(spark, texts), long_n=5).collect()
    }
    assert got == _brute_repetition(texts, 5)
    assert got[1][3] == 1.0          # modal bigram owns every position
    assert got[2][5] == 0.0          # no repeated 5-grams
    assert got[3][5] > 0.5           # looping doc flagged
    kept = {
        r["doc_id"]
        for r in filter_repetitive(
            _mk_docs(spark, texts), 0.2, 0.15, long_n=5
        ).collect()
    }
    # docs 1 and 3 breach; doc 4 never enters the profile so it survives
    assert kept == {2, 4}


def test_repetition_brute_force_parity_random(spark):
    import random

    from schemasaurus_spark.operators.repetition import repetition_profile

    rng = random.Random(29)
    vocab = [f"w{i}" for i in range(8)]  # tiny vocab => heavy repetition
    texts = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        for i in range(40)
    }
    got = {
        r["doc_id"]: (
            r["n_bigrams"],
            r["top_bigram"],
            r["top_bigram_count"],
            round(r["top_bigram_frac"], 9),
            r["n_longgrams"],
            round(r["dup_longgram_frac"], 9),
        )
        for r in repetition_profile(_mk_docs(spark, texts), long_n=5).collect()
    }
    assert got == _brute_repetition(texts, 5)


# ---------------------------------------------------------------- passage removal


def _brute_removed(texts: dict[int, str], window: int, min_count: int):
    """Independent reference for remove_duplicate_passages: brute spans
    applied to the token stream."""
    spans_by_doc: dict[int, list[tuple[int, int]]] = {}
    for i, s, e, _n in _brute_spans(texts, window, min_count):
        spans_by_doc.setdefault(i, []).append((s, e))
    out = {}
    for i, t in texts.items():
        if t is None or not t.strip():
            continue
        toks = re.split(r"\s+", t.strip().lower())
        covered = set()
        for s, e in spans_by_doc.get(i, []):
            covered.update(range(s, e))
        kept = [tok for p, tok in enumerate(toks) if p not in covered]
        out[i] = (len(toks), len(toks) - len(kept), " ".join(kept))
    return out


def test_passage_removal_planted(spark):
    from schemasaurus_spark.operators.substring_dedup import (
        remove_duplicate_passages,
    )

    passage = "the boilerplate footer repeated in every page of the crawl"
    texts = {
        1: f"unique alpha text one {passage} tail one",
        2: f"unique beta text two {passage} tail two",
        3: "completely unique document with no repeats at all here",
    }
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in remove_duplicate_passages(
            _mk_docs(spark, texts), window=8, min_count=2
        ).collect()
    }
    assert got == _brute_removed(texts, 8, 2)
    # the planted passage is gone from both carriers, uniques survive
    assert "boilerplate" not in got[1][2] and "boilerplate" not in got[2][2]
    assert got[3] == (9, 0, texts[3])


def test_passage_removal_fully_duplicated_doc_survives_empty(spark):
    from schemasaurus_spark.operators.substring_dedup import (
        remove_duplicate_passages,
    )

    dup = "a b c d e f g h"
    texts = {1: dup, 2: dup, 3: None, 4: "  "}
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in remove_duplicate_passages(
            _mk_docs(spark, texts), window=8, min_count=2
        ).collect()
    }
    assert got == {1: (8, 8, ""), 2: (8, 8, "")}


def test_passage_removal_brute_force_parity_random(spark):
    import random

    from schemasaurus_spark.operators.substring_dedup import (
        remove_duplicate_passages,
    )

    rng = random.Random(97)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> organic repeats
    texts = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        for i in range(50)
    }
    for window, min_count in [(4, 2), (5, 3)]:
        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
            for r in remove_duplicate_passages(
                _mk_docs(spark, texts), window=window, min_count=min_count
            ).collect()
        }
        assert got == _brute_removed(texts, window, min_count)


# ------------------------------------------------- weighted sampling


def _priority_py(key, w, seed=0):
    import hashlib

    h = int(hashlib.md5(f"{key}:wsample:{seed}".encode()).hexdigest()[:15], 16)
    return ((h + 1) / float(1 << 60)) / w


def test_weighted_sample_exact_python_parity_and_partition_invariance(spark):
    from schemasaurus_spark.operators.sampling import weighted_sample

    rows = [(i, (i % 7) + 1) for i in range(300)]
    want = {
        k for k, _ in sorted(
            ((k, _priority_py(k, w)) for k, w in rows), key=lambda t: (t[1], t[0])
        )[:40]
    }
    df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
    for parts in (1, 32):
        got = {
            r.doc_id
            for r in weighted_sample(df.repartition(parts), 40, "w").collect()
        }
        assert got == want, parts


def test_weighted_sample_bias_and_exclusions(spark):
    from schemasaurus_spark.operators.sampling import weighted_sample

    # 200 heavy (w=50) + 200 light (w=1): a 100-row sample should be
    # dominated by heavy rows (deterministic outcome, not a flaky bound)
    rows = [(i, 50) for i in range(200)] + [(1000 + i, 1) for i in range(200)]
    rows += [(5000, 0), (5001, -3), (5002, None)]  # excluded
    df = spark.createDataFrame(rows, "doc_id bigint, w int")
    got = weighted_sample(df, 100, "w").collect()
    assert len(got) == 100
    heavy = sum(1 for r in got if r.doc_id < 1000)
    assert heavy > 85, heavy
    assert all(r.doc_id < 5000 for r in got)
    # n exceeding eligible rows returns all eligible
    assert weighted_sample(df, 10_000, "w").count() == 400


def test_split_leakage_flags_straddling_pairs_only(spark):
    from schemasaurus_spark.operators.sampling import split_leakage

    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (3, 4, 0.8), (5, 6, 0.7)], "id_a bigint, id_b bigint, sim double"
    )
    splits = spark.createDataFrame(
        [(1, "train"), (2, "test"), (3, "train"), (4, "train"), (5, "val"), (6, "test")],
        "doc_id bigint, split string",
    )
    got = {(r.id_a, r.id_b, r.split_a, r.split_b)
           for r in split_leakage(pairs, splits).collect()}
    assert got == {(1, 2, "train", "test"), (5, 6, "val", "test")}


def test_component_splits_eliminate_leakage_and_preserve_singletons(spark):
    from schemasaurus_spark.operators.sampling import (
        assign_splits,
        component_splits,
        split_leakage,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id bigint"
    )
    # chain 0-1-2 plus pair (10, 11); everything else singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a bigint, id_b bigint"
    )
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = component_splits(docs, pairs, fr)
    by_id = {r.doc_id: r.split for r in out.collect()}
    # every cluster shares one split -> the leakage audit is empty
    splits_df = out.select("doc_id", "split")
    assert split_leakage(pairs, splits_df).count() == 0
    assert by_id[0] == by_id[1] == by_id[2]
    assert by_id[10] == by_id[11]
    # singletons match plain assign_splits exactly (same hash domain)
    plain = {r.doc_id: r.split for r in assign_splits(docs, fr, seed=0).collect()}
    clustered = {0, 1, 2, 10, 11}
    for i in range(200):
        if i not in clustered:
            assert by_id[i] == plain[i], i


def test_context_length_profile_closed_form(spark):
    from schemasaurus_spark.operators.packing import context_length_profile

    docs = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "one two three four five"),
            (3, "x"),
            (4, None),  # excluded entirely
            (5, "   "),  # 0 tokens but still a document
        ],
        "doc_id long, text string",
    )
    got = {
        r["context_len"]: r
        for r in context_length_profile(docs, lengths=(2, 4)).collect()
    }
    assert set(got) == {2, 4}
    for L in (2, 4):
        assert got[L]["n_docs"] == 4
        assert got[L]["tokens_total"] == 9
    assert got[2]["n_docs_truncated"] == 2
    assert got[2]["tokens_kept"] == 5  # 2+2+1+0
    assert got[2]["kept_bp"] == 5555  # 50000 DIV 9
    assert got[4]["n_docs_truncated"] == 1
    assert got[4]["tokens_kept"] == 8
    assert got[4]["kept_bp"] == 8888


def test_context_length_profile_zero_token_corpus(spark):
    from schemasaurus_spark.operators.packing import context_length_profile

    docs = spark.createDataFrame(
        [(1, ""), (2, "   ")], "doc_id long, text string"
    )
    rows = context_length_profile(docs, lengths=(8,)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_docs"], r["tokens_total"], r["tokens_kept"]) == (2, 0, 0)
    assert r["kept_bp"] is None  # no division by zero, NULL not a crash
