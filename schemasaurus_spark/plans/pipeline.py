"""End-to-end training-corpus curation pipeline.

Composes the engine's operators into the job a large-scale training-data
pipeline actually runs over a raw document corpus:

    1. schema validation  — keep only docs passing the draft-4 schema
                            (columns backend: vectorized predicates)
    2. quality filter     — composite length/punctuation/stopword score
    3. exact dedup        — one doc (min id) per normalized-text fingerprint
    4. near-dup dedup     — MinHash+LSH pairs -> connected components ->
                            drop non-canonical cluster members
    5. stratified sample  — deterministic md5-bucket downsampling per stratum

Scale shape: stages 1-3 and 5 are single-scan filters / one
map-side-combined shuffle each, and stage 4 — the only expensive stage —
runs over the ALREADY filtered+exact-deduped corpus, so the banded LSH
self-join sees the smallest possible input.  Every stage is lazily
composed; nothing is collected driver-side.  ``run_with_counts`` forces one
count per stage boundary for observability (each count is a cheap
aggregate over the lazily shared plan prefix) — production runs that don't
need stage counts call ``run`` and pay for exactly one job.

The whole pipeline is deterministic and engine-portable (md5-derived
hashing end to end), which is what makes the ``doc_training_corpus``
contract query SQL-oracle-able: DuckDB reproduces every stage bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schemasaurus_spark.operators.dedup import (
    dedup_by_components,
    dedup_exact,
    minhash_near_duplicates,
)
from schemasaurus_spark.operators.sampling import stratified_sample
from schemasaurus_spark.operators.text import quality_score
from schemasaurus_spark.schema.columns import validate_dataframe


@dataclass
class CorpusPipeline:
    """Config for the curation run; every knob mirrors an operator arg."""

    schema: dict
    quality_min: float = 0.0
    minhash_threshold: float = 0.5
    sample_fractions: dict = field(default_factory=dict)
    sample_default: float = 1.0
    sample_seed: int = 0
    strata_col: str = "lang"
    text_col: str = "text"
    id_col: str = "doc_id"

    def valid_docs(self, docs: DataFrame) -> DataFrame:
        v = validate_dataframe(docs, self.schema)
        return v.where(F.col("valid")).drop("valid", "errors")

    def quality_docs(self, docs: DataFrame) -> DataFrame:
        q = docs.withColumn("quality", quality_score(F.col(self.text_col)))
        return q.where(F.col("quality") >= F.lit(self.quality_min))

    def exact_deduped(self, docs: DataFrame) -> DataFrame:
        return dedup_exact(docs, self.text_col, self.id_col)

    def near_deduped(self, docs: DataFrame) -> DataFrame:
        pairs = minhash_near_duplicates(
            docs, self.text_col, self.id_col, threshold=self.minhash_threshold
        )
        return dedup_by_components(docs, pairs, self.id_col)

    def sampled(self, docs: DataFrame) -> DataFrame:
        if not self.sample_fractions and self.sample_default >= 1.0:
            return docs
        return stratified_sample(
            docs,
            self.sample_fractions,
            strata_col=self.strata_col,
            key_col=self.id_col,
            default_fraction=self.sample_default,
            seed=self.sample_seed,
        )

    def run(self, docs: DataFrame) -> DataFrame:
        """The curated corpus as one lazy plan."""
        return self.sampled(
            self.near_deduped(self.exact_deduped(self.quality_docs(self.valid_docs(docs))))
        )

    def run_with_counts(self, docs: DataFrame) -> tuple[DataFrame, dict]:
        """Curated corpus + per-stage survivor counts (the no-silent-drops
        report: every row lost between raw input and final corpus is
        attributed to a stage)."""
        counts = {"input": docs.count()}
        cur = self.valid_docs(docs)
        counts["after_validation"] = cur.count()
        cur = self.quality_docs(cur)
        counts["after_quality"] = cur.count()
        cur = self.exact_deduped(cur)
        counts["after_exact_dedup"] = cur.count()
        cur = self.near_deduped(cur)
        counts["after_near_dedup"] = cur.count()
        out = self.sampled(cur)
        counts["after_sampling"] = out.count()
        return out, counts
