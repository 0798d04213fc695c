"""Composed training-corpus curation pipeline (plans/pipeline.py).

The oracle contract (doc_training_corpus) pins the exact survivor set;
these tests pin the pipeline's *shape*: stage attribution accounts for
every dropped row, each stage drops what it should and nothing else, and
the single-plan ``run`` equals the instrumented ``run_with_counts``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schemasaurus_spark.plans.pipeline import CorpusPipeline

SCHEMA = {
    "type": "object",
    "properties": {
        "doc_id": {"type": "integer", "required": True, "minimum": 0},
        "text": {"type": "string", "required": True, "minLength": 5},
        "lang": {"type": "string", "enum": ["en", "de"]},
    },
}


@pytest.fixture(scope="module")
def raw_docs(spark):
    words = (
        "alpine borrow cactus dolphin ember forest glacier harbor island "
        "jungle kettle lantern meadow nectar orchard pebble quarry river "
        "saddle timber urchin velvet walnut yonder zephyr basalt copper "
        "drizzle ferret gossip hammock ivory jigsaw kayak lichen mosaic"
    ).split()
    rows = []
    # 20 valid docs with genuinely distinct content: the doc-index suffix on
    # every word keeps cross-doc shingle overlap (hence Jaccard) near zero
    for i in range(20):
        w = [f"{words[(i + k * 3) % len(words)]}{i}" for k in range(8)]
        rows.append((i, f"doc {i}: " + " ".join(w), "en"))
    base0 = rows[0][1]
    base1 = rows[1][1]
    # exact duplicates of doc 0 (normalized-whitespace variants)
    rows.append((100, base0, "en"))
    rows.append((101, "  " + base0.replace(" ", "   ") + "  ", "en"))
    # near duplicate of doc 1 (one word appended)
    rows.append((102, base1 + " extra", "en"))
    # schema violations: bad lang, short text, negative id
    rows.append((103, "perfectly fine text here", "zz"))
    rows.append((104, "tiny", "en"))
    rows.append((-1, "negative id document text", "de"))
    # junk quality: pure punctuation
    rows.append((105, "!!! ??? *** &&& ^^^ %%% $$$ @@@ ###", "de"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_stage_attribution_accounts_for_every_row(spark, raw_docs):
    pipe = CorpusPipeline(schema=SCHEMA, quality_min=0.3, minhash_threshold=0.5)
    out, counts = pipe.run_with_counts(raw_docs)
    assert counts["input"] == 27
    assert counts["after_validation"] == 24  # -103 (enum) -104 (minLength) -(-1) (minimum)
    assert counts["after_quality"] == 23  # -105 (punctuation junk)
    assert counts["after_exact_dedup"] == 21  # -100 -101 (copies of doc 0)
    assert counts["after_near_dedup"] == 20  # -102 (near-dup of doc 1)
    assert counts["after_sampling"] == 20  # no sampling configured
    # monotone non-increasing by construction
    vals = list(counts.values())
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_canonical_choices_and_survivors(spark, raw_docs):
    pipe = CorpusPipeline(schema=SCHEMA, quality_min=0.3, minhash_threshold=0.5)
    kept = {r.doc_id for r in pipe.run(raw_docs).select("doc_id").collect()}
    assert kept == set(range(20))  # min-id canonical survives each cluster


def test_run_equals_instrumented_run(spark, raw_docs):
    pipe = CorpusPipeline(
        schema=SCHEMA,
        quality_min=0.3,
        sample_fractions={"en": 0.5},
        sample_default=1.0,
        sample_seed=3,
    )
    a = sorted(r.doc_id for r in pipe.run(raw_docs).collect())
    b, counts = pipe.run_with_counts(raw_docs)
    assert a == sorted(r.doc_id for r in b.collect())
    assert counts["after_sampling"] == len(a) < counts["after_near_dedup"]


def test_no_pinned_frames_survive_pipeline_run(spark, raw_docs, monkeypatch):
    """near_deduped wraps the LSH stage in pin_scope: every frame _pin
    persisted during the run must be unpersisted by the time run() returns
    (round-3 verdict: long-lived sessions leaked persisted LSH frames)."""
    from schemasaurus_spark.operators import dedup as dd

    pinned = []
    real_pin = dd._pin

    def recording_pin(df):
        out = real_pin(df)
        pinned.append(out)
        return out

    monkeypatch.setattr(dd, "_pin", recording_pin)
    pipe = CorpusPipeline(schema=SCHEMA, quality_min=0.3, minhash_threshold=0.5)
    pipe.run(raw_docs)
    assert pinned, "expected the LSH stage to pin intermediates"
    for df in pinned:
        lvl = df.storageLevel
        assert not (lvl.useMemory or lvl.useDisk), "pin leaked past pin_scope"


def test_run_with_counts_scans_raw_input_once(spark, raw_docs, monkeypatch):
    """The instrumented path persists the validation boundary and rides the
    input count on an Observation — the raw input is scanned exactly once
    (round-3 verdict: it recomputed the raw prefix per stage count)."""
    acc = spark.sparkContext.accumulator(0)

    def bump(it):
        acc.add(1)
        yield from it

    one_part = raw_docs.coalesce(1)
    counted = spark.createDataFrame(
        one_part.rdd.mapPartitions(bump), schema=raw_docs.schema
    )
    pipe = CorpusPipeline(schema=SCHEMA, quality_min=0.3, minhash_threshold=0.5)
    out, counts = pipe.run_with_counts(counted)
    assert counts["input"] == 27
    assert acc.value == 1, f"raw input scanned {acc.value} times, expected 1"
    # boundary caches must not outlive the call
    from pyspark.sql import DataFrame as _DF  # noqa: F401
    # (pin leakage is covered by test_no_pinned_frames_survive_pipeline_run;
    # the persisted valid/exact boundaries are unpersisted in the finally)
    out.count()  # caller's action still computes after unpersist


def test_quality_column_present_in_output(spark, raw_docs):
    pipe = CorpusPipeline(schema=SCHEMA, quality_min=0.0)
    out = pipe.run(raw_docs)
    assert "quality" in out.columns
    assert out.where(F.col("quality") < 0).count() == 0


def test_optional_decontam_and_repetition_stages(spark, raw_docs):
    # plant one repetitious doc and one benchmark-contaminated doc that
    # survive every default stage, then flip the optional stages on
    extra = spark.createDataFrame(
        [
            (200, "loop loop loop loop loop loop loop loop loop loop", "en"),
            (201, "the hidden eval passage appears verbatim right here okay", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    docs = raw_docs.union(extra)
    bench = spark.createDataFrame(
        [(900, "question: the hidden eval passage appears verbatim right here")],
        "doc_id long, text string",
    )

    base = CorpusPipeline(schema=SCHEMA, quality_min=0.0, minhash_threshold=0.5)
    base_ids = {r["doc_id"] for r in base.run(docs).collect()}
    assert {200, 201} <= base_ids  # both pass the default five stages

    pipe = CorpusPipeline(
        schema=SCHEMA,
        quality_min=0.0,
        minhash_threshold=0.5,
        repetition_thresholds=(0.5, 0.5),
        benchmark=bench,
        decontam_window=8,
    )
    out, counts = pipe.run_with_counts(docs)
    ids = {r["doc_id"] for r in out.collect()}
    assert 200 not in ids and 201 not in ids
    assert ids == base_ids - {200, 201}
    assert (
        counts["after_optional_filters"]
        == counts["after_exact_dedup"] - 2
    )
    # run() composes the same stages as the instrumented path
    assert {r["doc_id"] for r in pipe.run(docs).collect()} == ids


def test_optional_quota_cap_stage(spark, raw_docs):
    """Stage 4c bounds each group's share post-dedup; run() and the
    instrumented run agree, counts attribute the capped rows, and the
    default config keeps the stage off."""
    base = CorpusPipeline(schema=SCHEMA, quality_min=0.3, minhash_threshold=0.5)
    capped = CorpusPipeline(
        schema=SCHEMA,
        quality_min=0.3,
        minhash_threshold=0.5,
        quota_group_col="lang",
        quota_cap_docs=5,
    )
    uncapped_out = base.run(raw_docs)
    out, counts = capped.run_with_counts(raw_docs)
    sizes = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert sizes and all(n <= 5 for n in sizes.values())
    assert counts["after_quota_cap"] == sum(sizes.values())
    assert counts["after_quota_cap"] < counts["after_near_dedup"]
    # run() plan equals the instrumented run
    ids_run = {r.doc_id for r in capped.run(raw_docs).select("doc_id").collect()}
    ids_counts = {r.doc_id for r in out.select("doc_id").collect()}
    assert ids_run == ids_counts
    # capped output is a subset of the uncapped corpus
    ids_uncapped = {r.doc_id for r in uncapped_out.select("doc_id").collect()}
    assert ids_run < ids_uncapped


def test_optional_split_labeling_stage(spark, raw_docs):
    """Terminal split labeling: every surviving doc gets exactly one
    label, the column is absent when the stage is off, and run() agrees
    with the instrumented run."""
    off = CorpusPipeline(schema=SCHEMA, quality_min=0.3, minhash_threshold=0.5)
    assert "split" not in off.run(raw_docs).columns
    pipe = CorpusPipeline(
        schema=SCHEMA,
        quality_min=0.3,
        minhash_threshold=0.5,
        split_fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    out = pipe.run(raw_docs)
    assert "split" in out.columns
    rows = out.select("doc_id", "split").collect()
    assert rows and all(r.split in ("train", "val", "test") for r in rows)
    out2, _ = pipe.run_with_counts(raw_docs)
    assert {(r.doc_id, r.split) for r in out2.select("doc_id", "split").collect()} == {
        (r.doc_id, r.split) for r in rows
    }


def test_optional_mixing_stage(spark, raw_docs):
    docs = raw_docs.withColumn(
        "source", F.when(F.col("doc_id") % 2 == 0, "web").otherwise("code")
    )
    base = CorpusPipeline(schema=SCHEMA, quality_min=0.0, minhash_threshold=0.5)
    survivors = base.run(docs).collect()
    n_web = sum(1 for r in survivors if r["source"] == "web")
    n_code = len(survivors) - n_web

    # budget = 2x the curated corpus split evenly: rates 2*total*0.5/n_s
    pipe = CorpusPipeline(
        schema=SCHEMA,
        quality_min=0.0,
        minhash_threshold=0.5,
        mix_weights={"web": 0.5, "code": 0.5},
        mix_budget_factor=2.0,
        mix_source_col="source",
    )
    out, counts = pipe.run_with_counts(docs)
    rows = out.collect()
    assert "epoch" in out.columns
    assert counts["after_mixing"] == len(rows)
    # every pre-mix survivor appears floor(rate) times at least
    total = n_web + n_code
    for src, n_s in (("web", n_web), ("code", n_code)):
        rate = 2.0 * total * 0.5 / n_s
        per_doc = {}
        for r in rows:
            if r["source"] == src:
                per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
        assert set(per_doc.values()) <= {int(rate // 1), int(rate // 1) + 1}
    # plain run() composes the same stage
    assert len(pipe.run(docs).collect()) == len(rows)


def test_optional_passage_removal_stage(spark, raw_docs):
    """Stage 4b rewrites survivors with duplicated passages deleted, and
    run == run_with_counts with the stage on."""
    # plant the same 8-token passage inside two otherwise-distinct docs
    passage = "shared boilerplate footer phrase repeated across crawl pages"
    planted = raw_docs.withColumn(
        "text",
        F.when(
            F.col("doc_id").isin(2, 3),
            F.concat(F.col("text"), F.lit(" " + passage)),
        ).otherwise(F.col("text")),
    )
    pipe = CorpusPipeline(
        schema=SCHEMA,
        quality_min=0.3,
        minhash_threshold=0.5,
        passage_removal_window=8,
    )
    out, counts = pipe.run_with_counts(planted)
    rows = {r.doc_id: r.text for r in out.select("doc_id", "text").collect()}
    # the passage is gone from both carriers, docs themselves survive
    assert "boilerplate" not in rows[2] and "boilerplate" not in rows[3]
    assert rows[2].startswith("doc 2:") and rows[3].startswith("doc 3:")
    # untouched docs keep their (token-normalized) text
    assert rows[5] == next(
        r.text for r in planted.where("doc_id = 5").collect()
    )
    assert counts["after_passage_removal"] == counts["after_near_dedup"]
    a = sorted((r.doc_id, r.text) for r in pipe.run(planted).collect())
    assert a == sorted(rows.items())


def test_passage_removal_drops_hollowed_docs(spark):
    """A doc that is nothing but a duplicated passage falls below
    passage_min_tokens and is dropped, attributed to the stage."""
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, dup, "en"),
        (2, dup + " plus unique trailing words here", "en"),
        (3, "totally unrelated document body with plenty words", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    pipe = CorpusPipeline(
        schema=SCHEMA,
        quality_min=0.0,
        minhash_threshold=0.95,
        passage_removal_window=8,
        passage_min_tokens=1,
    )
    out, counts = pipe.run_with_counts(docs)
    kept = {r.doc_id for r in out.collect()}
    assert kept == {2, 3}
    assert counts["after_passage_removal"] == 2 < counts["after_near_dedup"]


def test_optional_license_gate_stage(spark, raw_docs):
    extra = spark.createDataFrame(
        [
            (210, "useful prose but sadly All Rights Reserved by the site", "en"),
            (211, "useful prose shared as CC BY-NC only for research use", "en"),
            (212, "useful prose released into the public domain entirely", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    docs = raw_docs.union(extra)

    base = CorpusPipeline(schema=SCHEMA, quality_min=0.0, minhash_threshold=0.5)
    base_ids = {r["doc_id"] for r in base.run(docs).collect()}
    assert {210, 211, 212} <= base_ids  # license ignored by default

    pipe = CorpusPipeline(
        schema=SCHEMA,
        quality_min=0.0,
        minhash_threshold=0.5,
        license_allow={"none", "public_domain", "cc_by"},
    )
    out, counts = pipe.run_with_counts(docs)
    ids = {r["doc_id"] for r in out.collect()}
    assert 210 not in ids and 211 not in ids  # restrictive classes gone
    assert 212 in ids  # public domain allowed
    assert ids == base_ids - {210, 211}
    assert counts["after_optional_filters"] == counts["after_exact_dedup"] - 2
