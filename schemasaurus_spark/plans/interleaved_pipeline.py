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

__all__ = ["InterleavedPipeline", "ResumableCuration"]


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


class ResumableCuration:
    """Unit-granular checkpoint/resume for the interleaved pipeline —
    the north-rule resumability contract (``runstate.py``'s manifest
    machinery) applied to curation.

    The pipeline splits into exactly two phases by data dependence:

    * **phase 1 — the global boilerplate profile** (the only cross-unit
      aggregate): computed ONCE over the repaired full input and
      persisted under ``out_dir/profile``; a restart reuses the
      artifact.  Correct resume requires an immutable input snapshot —
      the same contract ResumableValidation enforces — so the profile
      artifact records the unit listing it was built from and a changed
      listing raises ``LineageDriftError`` (``on_drift="reset"`` drops
      the profile AND every unit manifest: the profile is global, so
      any input change invalidates all curation output).
    * **phase 2 — repair + removal + gate + render**, all row-local:
      processed unit-at-a-time with ``RunState`` manifests; a killed
      run resumes at the first incomplete unit, each unit's curated
      rows land under ``curated/unit=<id>`` (rewrite-idempotent).
    """

    def __init__(self, pipeline: InterleavedPipeline | None = None,
                 files_per_unit: int = 4):
        self.pipe = pipeline or InterleavedPipeline()
        self.files_per_unit = files_per_unit

    def run(
        self,
        spark,
        input_path: str,
        out_dir: str,
        catalog: DataFrame | None = None,
        fail_after_units: int | None = None,
        on_drift: str = "error",
    ) -> dict:
        import json
        import os
        import shutil

        from schemasaurus_spark.operators.span_boilerplate import (
            span_boilerplate_profile,
        )
        from schemasaurus_spark.runstate import (
            LineageDriftError,
            RunState,
            list_units,
        )

        units = list_units(spark, input_path, self.files_per_unit)
        listing = sorted(u["unit_id"] for u in units)
        profile_dir = os.path.join(out_dir, "profile")
        listing_file = os.path.join(out_dir, "profile_listing.json")
        state = RunState(os.path.join(out_dir, "manifests"))

        if os.path.isfile(listing_file):
            prior = json.loads(open(listing_file).read())
            if prior != listing:
                if on_drift == "reset":
                    shutil.rmtree(profile_dir, ignore_errors=True)
                    os.remove(listing_file)
                    shutil.rmtree(
                        os.path.join(out_dir, "manifests"), ignore_errors=True
                    )
                    shutil.rmtree(
                        os.path.join(out_dir, "curated"), ignore_errors=True
                    )
                    state = RunState(os.path.join(out_dir, "manifests"))
                else:
                    raise LineageDriftError(
                        "input listing changed since the boilerplate profile "
                        "was frozen; the profile is a GLOBAL aggregate, so "
                        "resume requires an immutable input snapshot — rerun "
                        "with on_drift='reset' to recurate from scratch"
                    )

        if not os.path.isfile(listing_file):
            docs = spark.read.parquet(input_path)
            prof = span_boilerplate_profile(
                self.pipe.repaired(docs, catalog),
                min_docs=self.pipe.min_docs_boilerplate,
                spans_col=self.pipe.spans_col,
                id_col=self.pipe.id_col,
            )
            prof.write.mode("overwrite").parquet(profile_dir)
            os.makedirs(out_dir, exist_ok=True)
            with open(listing_file, "w") as fh:
                fh.write(json.dumps(listing))

        prof = spark.read.parquet(profile_dir)
        done = state.completed()
        pending = [u for u in units if u["unit_id"] not in done]
        processed = 0
        for unit in pending:
            if fail_after_units is not None and processed >= fail_after_units:
                raise RuntimeError(f"injected failure after {processed} units")
            docs = spark.read.parquet(*unit["files"])
            curated = self.pipe.gated(
                self.pipe.rendered(
                    remove_boilerplate_spans(
                        self.pipe.repaired(docs, catalog),
                        prof,
                        spans_col=self.pipe.spans_col,
                        id_col=self.pipe.id_col,
                    ).drop("n_boilerplate_removed")
                )
            )
            udir = os.path.join(out_dir, "curated", f"unit={unit['unit_id']}")
            curated.write.mode("overwrite").parquet(udir)
            n = spark.read.parquet(udir).count()
            state.mark_done(unit, {"curated_rows": n})
            processed += 1
        all_done = state.completed()
        return {
            "n_units": len(units),
            "n_skipped": len(units) - len(pending),
            "n_processed": processed,
            "curated_rows": sum(
                m["metrics"]["curated_rows"] for m in all_done.values()
            ),
        }
