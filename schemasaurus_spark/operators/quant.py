"""Int8 embedding quantization: 4x storage/bandwidth reduction for the
embedding store, with a quantized top-k whose arithmetic is EXACT
integers — the standard serving trick (FAISS SQ8 / product-quantization
lite) re-expressed as engine-portable columns.

Scheme: symmetric per-vector scaling.  ``m = max(|v_i|)``;
``q_i = floor(v_i / m * 127 + 0.5)`` (round-half-up written as a floor
so every engine computes the identical IEEE expression — bare round()
differs across engines in tie handling).  q ∈ [-127, 127] fits a
TINYINT; a zero vector quantizes to all zeros.

Why cosine survives quantization exactly as written: cosine is
scale-invariant, so the per-vector scale CANCELS —
``cos(deq(qa), deq(qb)) = dot(qa, qb) / (|qa| * |qb|)`` over plain
integers.  The quantized dot is an exact int64 fold (no float
accumulation order to disagree about); only the final
``/ (sqrt * sqrt)`` is float, and it is a single correctly-rounded IEEE
expression any engine reproduces bit-for-bit.  Quantization error
(float -> 8 bits) moves SIMILARITIES by O(1/127) — the documented
trade; rankings on real embeddings are near-identical (recall
pytest-pinned on clustered synthetic vectors).

Scale shape: quantization is a pure scan-stage projection (JVM
``transform``/``aggregate`` higher-order functions, no UDF, no
shuffle); ``int8_topk`` mirrors brute_force_topk's broadcast-probe
shape with the corpus scanned once — but every corpus byte moved is a
quarter of the float32 path, which is the point at 10^12 vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

__all__ = ["quantize_embeddings", "int8_topk"]


def _qexpr(vec_col: str):
    m = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
    q = F.transform(
        F.col(vec_col),
        lambda x: F.when(
            m > 0,
            F.floor(x.cast("double") / m * F.lit(127.0) + F.lit(0.5)).cast("tinyint"),
        ).otherwise(F.lit(0).cast("tinyint")),
    )
    return q, m


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """``(id, qvec array<tinyint>, scale double)``: symmetric int8
    quantization; ``scale`` is the per-vector max-abs (dequantize with
    ``q * scale / 127``).  NULL vectors are dropped (nothing to
    quantize)."""
    q, m = _qexpr(vec_col)
    return df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col), q.alias("qvec"), m.alias("scale")
    )


def _qdot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _qnorm(a):
    return F.sqrt(_qdot(a, a).cast("double"))


def int8_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantized cosine top-k, same contract as
    ``similarity.brute_force_topk`` (probe_id, neighbor_id, rank,
    similarity): both sides int8-quantized, dot products exact int64,
    one float division per pair.  The per-vector scales cancel out of
    cosine, so no dequantization happens at query time."""
    qc = quantize_embeddings(corpus, vec_col, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("qvec").alias("_qv"),
        _qnorm(F.col("qvec")).alias("_qn"),
    )
    qp = quantize_embeddings(probes, vec_col, id_col).select(
        F.col(id_col).alias("probe_id"),
        F.col("qvec").alias("_pv"),
        _qnorm(F.col("qvec")).alias("_pn"),
    )
    scored = qc.join(broadcast(qp), F.col("probe_id") != F.col("neighbor_id")).select(
        "probe_id",
        "neighbor_id",
        F.when(
            (F.col("_qn") > 0) & (F.col("_pn") > 0),
            _qdot(F.col("_pv"), F.col("_qv")).cast("double")
            / (F.col("_pn") * F.col("_qn")),
        ).alias("similarity"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("similarity").desc_nulls_last(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "probe_id", "neighbor_id", "rank", F.round("similarity", 6).alias("similarity")
        )
    )
