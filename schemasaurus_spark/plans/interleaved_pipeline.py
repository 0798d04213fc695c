"""End-to-end curation pipeline for the INTERLEAVED north-rule table —
the spans-native sibling of ``pipeline.py``'s document pipeline.

Raw interleaved text+media documents in, training-ready serialized
rows out:

    1. span repair       — kind-from-ref coercion, forbidden-text drop,
                           unrepairable-span removal, referential drop
                           against the broadcast media catalog, minimal
                           offset canonicalization (operators/repair.py)
    2. span boilerplate  — text spans repeated across >= min_docs
                           distinct documents removed
                           (operators/span_boilerplate.py; the profile
                           is computed on the REPAIRED corpus so spans
                           rescued by repair participate)
    3. trainability gate — keep docs with >= min_text_chars of text in
                           >= 1 surviving text span (untrainable husks
                           — all-media or boilerplate-only docs — drop)
    4. render            — one training string per doc with <|kind|>
                           media placeholders + fetch manifest
                           (operators/interleave.py)

Stage order rationale at 10^12 docs: repair first (row-local, zero
shuffles) so the boilerplate profile never counts spans repair would
delete; the gate runs BEFORE render only conceptually — both are
row-local projections over the same scan, so Catalyst fuses stages 3+4
into one map stage.  The whole pipeline carries exactly the
boilerplate profile's two map-side-combined shuffles; everything else
is embarrassingly parallel.  Nothing is collected driver-side; the
profile rides back as the single-row broadcast array.

Deterministic and engine-portable end to end, which is what makes the
``northrule_curated_corpus`` contract query SQL-oracle-able: DuckDB
replays repair's closed-form offset recurrence, the boilerplate set,
the gate and the render lambda bit-for-bit.

``run_with_counts`` reports per-stage survivors; the doc-level stages
share the lazily composed prefix, and the repaired boundary is
persisted for the duration of the counting run (MEMORY_AND_DISK, freed
before return) so the repair projection is not recomputed per count.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from schemasaurus_spark.operators.interleave import render_training_text
from schemasaurus_spark.operators.repair import repair_spans
from schemasaurus_spark.operators.span_boilerplate import (
    remove_boilerplate_spans,
    span_boilerplate_profile,
)

__all__ = ["InterleavedPipeline"]


@dataclass
class InterleavedPipeline:
    """Config for the interleaved curation run."""

    min_docs_boilerplate: int = 5
    min_text_chars: int = 20
    spans_col: str = "spans"
    id_col: str = "doc_id"

    def repaired(self, docs: DataFrame, catalog: DataFrame | None) -> DataFrame:
        return repair_spans(
            docs, spans_col=self.spans_col, id_col=self.id_col, catalog=catalog
        ).drop("repairs")

    def boilerplate_cleaned(self, repaired: DataFrame) -> DataFrame:
        prof = span_boilerplate_profile(
            repaired,
            min_docs=self.min_docs_boilerplate,
            spans_col=self.spans_col,
            id_col=self.id_col,
        )
        return remove_boilerplate_spans(
            repaired, prof, spans_col=self.spans_col, id_col=self.id_col
        ).drop("n_boilerplate_removed")

    def rendered(self, cleaned: DataFrame) -> DataFrame:
        return render_training_text(
            cleaned, spans_col=self.spans_col, id_col=self.id_col
        )

    def gated(self, rendered: DataFrame) -> DataFrame:
        return rendered.where(
            F.col("n_text_chars") >= F.lit(self.min_text_chars)
        )

    def run(self, docs: DataFrame, catalog: DataFrame | None = None) -> DataFrame:
        """Lazily composed plan: repair -> de-boilerplate -> render ->
        gate (the gate filters on render's exact char accounting, so
        rendering before gating costs nothing extra — one fused map
        stage)."""
        return self.gated(
            self.rendered(self.boilerplate_cleaned(self.repaired(docs, catalog)))
        )

    def run_with_counts(
        self, docs: DataFrame, catalog: DataFrame | None = None
    ) -> tuple[DataFrame, dict]:
        """The curated frame plus per-stage survivor counts.  Persists
        the repaired boundary while counting (freed before return)."""
        repaired = self.repaired(docs, catalog)
        repaired.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            counts = {"input_rows": docs.count(), "repaired_rows": repaired.count()}
            cleaned = self.boilerplate_cleaned(repaired)
            rendered = self.rendered(cleaned)
            out = self.gated(rendered)
            counts["rendered_rows"] = rendered.count()
            counts["curated_rows"] = out.count()
            # force the curated frame to materialize before unpersisting
            # the boundary it depends on
            return out.localCheckpoint(eager=True), counts
        finally:
            repaired.unpersist()
