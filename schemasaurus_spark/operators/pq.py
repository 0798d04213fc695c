"""Product quantization (PQ) for embedding columns: compressed codes +
asymmetric-distance (ADC) approximate top-k.

The reference engine has no vector operators at all (its scope is the
JSON-Schema walk — see SURVEY.md §2E); this module extends the
training-data mandate's similarity-search family with the published
memory-compression tier (Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011 — the formulation is the public
paper, not any library's code).  It completes the engine's storage
ladder for a 10^12-vector corpus:

    float64 array (dim·8 bytes)  — exact  (similarity.brute_force_topk)
    int8 + scale  (dim+8 bytes)  — ~exact (quant.int8_topk)
    PQ codes      (m bytes)      — approx (this module: 64-dim → 8 bytes)

and composes with the coarse quantizer (``similarity.build_ivf_index``)
into IVFADC — scan only the probed lists, score them from codes — which
is the standard shape for corpora whose raw vectors cannot be held at
all.

Design (all decisions mirror the IVF precedent so the DuckDB oracle can
rebuild the identical index):

* **Codebooks** split the ``dim`` dimensions into ``m`` contiguous
  subspaces of ``dim/m`` each; subspace ``mi`` gets ``ks`` codewords.
  Training is the deterministic md5-ordered sample used by
  ``build_ivf_index`` — the ``ks`` corpus vectors with the smallest
  ``md5(cast(id as string))``, SLICED per subspace (shared-sample init =
  per-subspace k-means at 0 Lloyd iterations; zero float math in
  selection, so any engine reproduces the exact codebook).  Optional
  per-subspace Lloyd refinement (``kmeans_iters``) is pytest-covered,
  like IVF's — its float averaging is not bit-portable across engines.
* **Encoding** is a ZERO-SHUFFLE map pass: the codebook rides as
  broadcast DATA on a one-row cross join (never as py4j plan literals —
  see similarity._with_centroid_array for the measured reason), and each
  vector's ``m`` codes are an in-row ``transform`` + ``array_max`` fold.
  Nearest codeword by squared L2, computed as the equivalent
  ``argmax(dot(x_mi, c) - |c|²/2)`` so the per-codeword constant folds
  once driver-side; ties break to the smallest code id (struct max on
  (score, -code)).
* **ADC top-k**: each probe builds its ``m × ks`` look-up table of
  subspace dot products ONCE (in-row, probe-side), probes broadcast into
  a cross join against the corpus CODES (the vectors themselves are
  never touched after encoding — that is the point), and each
  candidate's approximate dot product is an ``m``-term fold of LUT
  lookups.  Per-probe cost: ``ks·dim`` multiplications for the LUT +
  ``m`` ADDS per candidate, vs brute force's ``dim`` multiplications per
  candidate.
* Ranking ties break on neighbor id; the score is rounded to 6 decimals
  in the OUTPUT only (house round-6 discipline — raw doubles decide,
  rounding absorbs cross-engine ulps of macroscopically distinct sums).

Scale shape at 10^12 vectors: encode is one scan (map-only, code output
is m bytes/row); the codes table is ~m/(8·dim) of the raw corpus (64-dim
float64 → 1/64th), so a full-corpus ADC scan moves two orders of
magnitude less data than brute force, and the IVFADC composition
(``ivfpq_topk``) scans only ``n_probe/n_list`` of THAT.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from schemasaurus_spark.operators.similarity import (
    IvfIndex,
    _norm,
    assign_ivf_lists,
)

PQ_DEFAULT_M = 8
PQ_DEFAULT_KS = 16

_CB_COL = "_pq_cb"
# one row, one array: [{mi, cws: [{code, c, cchalf}]}] in subspace order
_CB_SCHEMA = (
    f"{_CB_COL} array<struct<mi:int,"
    "cws:array<struct<code:int,c:array<double>,cchalf:double>>>>"
)


class PqCodebook:
    """Driver-side product-quantization codebooks.

    ``books[mi][code]`` is the ``dim/m``-dim codeword vector of subspace
    ``mi``.  Small by design (m·ks·(dim/m) = ks·dim doubles — identical
    to holding ks corpus vectors); executors see it as one broadcast row.
    """

    def __init__(self, books: list[list[list[float]]], dim: int):
        if not books or not books[0]:
            raise ValueError("PqCodebook: books must be non-empty")
        self.books = books
        self.dim = dim
        self.m = len(books)
        self.ks = len(books[0])
        if dim % self.m != 0:
            raise ValueError(f"PqCodebook: dim {dim} not divisible by m {self.m}")
        self.sub = dim // self.m


def build_pq_codebook(
    corpus: DataFrame,
    dim: int,
    m: int = PQ_DEFAULT_M,
    ks: int = PQ_DEFAULT_KS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 0,
) -> PqCodebook:
    """Train the ``m`` per-subspace codebooks (eager — returns driver-side
    codewords).

    Base selection is the IVF discipline: the ``ks`` corpus vectors with
    the smallest ``md5(cast(id as string))``, zero-norm vectors excluded,
    sliced into the ``m`` subspaces (shared-sample init).  ``kmeans_iters``
    > 0 runs per-subspace Lloyd refinement: encode (map pass) + per
    (subspace, code) element-wise mean — one combine-heavy shuffle per
    iteration over n·m thin rows; refined codewords round to 9 decimals
    so the codebook is stable against float summation order."""
    if dim % m != 0:
        raise ValueError(f"build_pq_codebook: dim {dim} not divisible by m {m}")
    sub = dim // m
    base = corpus.select(F.col(id_col), F.col(vec_col)).where(
        _norm(F.col(vec_col)) > 0
    )
    seed_rows = (
        base.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(ks)
        .select(vec_col)
        .collect()
    )
    if not seed_rows:
        raise ValueError("build_pq_codebook: corpus has no non-zero vectors")
    books = [
        [
            [float(v) for v in r[0][mi * sub : (mi + 1) * sub]]
            for r in seed_rows
        ]
        for mi in range(m)
    ]
    cb = PqCodebook(books, dim)
    for _ in range(kmeans_iters):
        enc = encode_pq(base, cb, id_col=id_col, vec_col=vec_col)
        means = (
            enc.select(
                F.posexplode(F.col("pq_codes")).alias("mi", "code"),
                F.col(vec_col).alias("v"),
            )
            .select(
                "mi",
                "code",
                F.posexplode(
                    F.slice(F.col("v"), F.col("mi") * sub + 1, sub)
                ).alias("i", "x"),
            )
            .groupBy("mi", "code", "i")
            .agg(F.avg("x").alias("mval"))
            .groupBy("mi", "code")
            .agg(F.array_sort(F.collect_list(F.struct("i", "mval"))).alias("ims"))
            .select("mi", "code", F.col("ims.mval").alias("c"))
            .collect()
        )
        # codes emptied by reassignment keep their previous codeword
        refined = [list(b) for b in cb.books]
        for r in means:
            refined[r["mi"]][r["code"]] = [round(float(v), 9) for v in r["c"]]
        cb = PqCodebook(refined, dim)
    return cb


def _with_codebook_array(df: DataFrame, cb: PqCodebook) -> DataFrame:
    """Attach the full codebook to every row as ONE broadcast array column
    (broadcast DATA, not plan literals — similarity._with_centroid_array
    documents the measured py4j cost of the literal alternative)."""
    rows = [
        [
            (
                mi,
                [
                    (code, cw, sum(x * x for x in cw) / 2.0)
                    for code, cw in enumerate(cb.books[mi])
                ],
            )
            for mi in range(cb.m)
        ]
    ]
    one = df.sparkSession.createDataFrame([(rows[0],)], schema=_CB_SCHEMA)
    return df.join(broadcast(one))


def _codes_expr(vec, cb_col, sub: int):
    """array<int> of length m: per subspace, the argmax of
    ``dot(x_mi, c) - |c|²/2`` (= argmin squared L2), ties to the smallest
    code id via struct max on (score, -code)."""

    def best_code(book):
        x = F.slice(vec, book["mi"] * sub + 1, sub)
        scored = F.transform(
            book["cws"],
            lambda w: F.struct(
                (
                    F.aggregate(
                        F.zip_with(x, w["c"], lambda a, b: a * b),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    )
                    - w["cchalf"]
                ).alias("score"),
                (-w["code"]).alias("neg_code"),
            ),
        )
        return -F.array_max(scored)["neg_code"]

    return F.transform(cb_col, best_code)


def encode_pq(
    df: DataFrame,
    cb: PqCodebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``pq_codes: array<int>`` (length m) — the compressed
    representation.  Zero-shuffle map pass; the input columns are kept so
    callers can drop the raw vector once the codes are persisted."""
    return _with_codebook_array(df, cb).withColumn(
        "pq_codes", _codes_expr(F.col(vec_col), F.col(_CB_COL), cb.sub)
    ).drop(_CB_COL)


def _lut_expr(vec, cb_col, sub: int):
    """array<array<double>>: lut[mi][code] = dot(q_mi, codeword)."""
    return F.transform(
        cb_col,
        lambda book: F.transform(
            book["cws"],
            lambda w: F.aggregate(
                F.zip_with(
                    F.slice(vec, book["mi"] * sub + 1, sub),
                    w["c"],
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        ),
    )


def _adc_score(lut_col, codes_col, m: int):
    """m-term left fold of LUT lookups (mi ascending — the oracle unrolls
    the identical parenthesization)."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, mi: acc
        + F.element_at(
            F.element_at(lut_col, mi + 1), F.element_at(codes_col, mi + 1) + 1
        ),
    )


def pq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    cb: PqCodebook,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """ADC approximate dot-product top-k: (probe_id, neighbor_id, rank,
    adc_score).  Pass a pre-encoded ``codes`` frame (id_col + pq_codes —
    e.g. the persisted output of ``encode_pq``) to skip re-encoding; that
    is the production path, where the raw corpus vectors are never read
    at query time."""
    if codes is None:
        codes = encode_pq(
            corpus.where(_norm(F.col(vec_col)) > 0), cb, id_col, vec_col
        )
    enc = codes.select(F.col(id_col).alias("neighbor_id"), "pq_codes")
    p = _with_codebook_array(
        probes.where(_norm(F.col(vec_col)) > 0), cb
    ).select(
        F.col(id_col).alias("probe_id"),
        _lut_expr(F.col(vec_col), F.col(_CB_COL), cb.sub).alias("_lut"),
    )
    scored = (
        enc.join(broadcast(p))
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            _adc_score(F.col("_lut"), F.col("pq_codes"), cb.m).alias("score"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "probe_id",
            "neighbor_id",
            "rank",
            F.round("score", 6).alias("adc_score"),
        )
    )


def ivfpq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    index: IvfIndex,
    cb: PqCodebook,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC composition: coarse quantizer prunes to ``n_probe`` lists,
    PQ codes score the survivors — expected ``n_probe·n/n_list``
    candidates at ``m`` adds each, the standard billion-scale ANN shape.
    Residual-free variant (codes quantize the raw vectors, not the
    list residuals) so the codes table is shared verbatim with
    ``pq_topk``; pytest covers recall vs brute force."""
    assigned = assign_ivf_lists(
        corpus.where(_norm(F.col(vec_col)) > 0), index, id_col, vec_col
    )
    enc = encode_pq(assigned, cb, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "list_id", "pq_codes"
    )
    from schemasaurus_spark.operators.similarity import (
        _scored_centroids,
        _with_centroid_array,
        _CENTS_COL,
    )

    p = _with_centroid_array(
        probes.where(_norm(F.col(vec_col)) > 0), index
    ).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("_pv"),
        F.slice(
            F.sort_array(
                _scored_centroids(F.col(vec_col), F.col(_CENTS_COL)), asc=False
            ),
            1,
            n_probe,
        ).alias("_near"),
    )
    p = _with_codebook_array(p, cb).select(
        "probe_id",
        _lut_expr(F.col("_pv"), F.col(_CB_COL), cb.sub).alias("_lut"),
        F.explode(
            F.transform(F.col("_near"), lambda s: -s["neg_list_id"])
        ).alias("list_id"),
    )
    scored = (
        enc.join(broadcast(p), on="list_id")
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            _adc_score(F.col("_lut"), F.col("pq_codes"), cb.m).alias("score"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "probe_id",
            "neighbor_id",
            "rank",
            F.round("score", 6).alias("adc_score"),
        )
    )
