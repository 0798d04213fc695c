"""Similarity search over an embedding column (array<float>):

* brute-force cosine top-k — the exactness baseline: broadcast the probe
  set, one pass over the corpus, per-partition top-k via window rank (AQE
  keeps the shuffle tiny because only k rows per probe survive);
* LSH-bucketed ANN — the scale path: deterministic random-hyperplane sign
  bits bucket the corpus; probes only compare within matching buckets
  (multi-probe over all bit-flip neighbors at radius 1 for recall).

Dot products run JVM-side via ``zip_with`` + ``aggregate`` higher-order
functions — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (probe_id, neighbor_id, rank, similarity).

    Probes (small) are broadcast; the corpus is scanned once.  Ties break on
    neighbor id so ranks are deterministic across engines."""
    # norms are precomputed per row (one pass each side) so the per-pair work
    # inside the join is a single dot product, not dot + two norm folds
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        _norm(F.col(vec_col)).alias("probe_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("vec_norm"),
    )
    scored = c.join(broadcast(p), F.col("probe_id") != F.col("neighbor_id")).select(
        "probe_id",
        "neighbor_id",
        (_dot(F.col("probe_vec"), F.col("vec")) / (F.col("probe_norm") * F.col("vec_norm"))).alias("similarity"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", F.round("similarity", 6).alias("similarity"))
    )


def _hyperplane(dim: int, plane: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from integer hashing
    (splitmix64) — identical on every executor with no RNG state."""
    out = []
    for d in range(dim):
        z = (seed * 0x9E3779B97F4A7C15 + plane * 0xBF58476D1CE4E5B9 + d * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        z = z ^ (z >> 31)
        out.append((z / 2**64) * 2.0 - 1.0)
    return out


def lsh_bucket(vec, dim: int, n_planes: int = 8, seed: int = 42):
    """Sign-bit bucket id from n random hyperplanes (JVM-side dot products
    against literal plane arrays)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p, seed)])
        bit = (_dot(vec, plane) > 0).cast("int")
        bucket = bucket * 2 + bit
    return bucket


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate cosine top-k: compare only within matching (or 1-bit-
    neighboring, when multiprobe) hyperplane buckets.  At 100TB the corpus
    is bucketed once (cheap projection) and the join hits ~n/2^planes of it
    per probe instead of all of it."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("vec_norm"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        _norm(F.col(vec_col)).alias("probe_norm"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("pbucket"),
    )
    if multiprobe:
        # probe its own bucket + every 1-bit flip (radius-1 multi-probe)
        buckets = F.array(
            F.col("pbucket"),
            *[
                F.col("pbucket").bitwiseXOR(F.lit(1 << b))
                for b in range(n_planes)
            ],
        )
        p = p.select(
            "probe_id", "probe_vec", "probe_norm", F.explode(buckets).alias("bucket")
        )
    else:
        p = p.withColumnRenamed("pbucket", "bucket")
    scored = c.join(broadcast(p), on="bucket").where(
        F.col("probe_id") != F.col("neighbor_id")
    ).select(
        "probe_id",
        "neighbor_id",
        (_dot(F.col("probe_vec"), F.col("vec")) / (F.col("probe_norm") * F.col("vec_norm"))).alias("similarity"),
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.groupBy("probe_id", "neighbor_id")
        .agg(F.first("similarity").alias("similarity"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", F.round("similarity", 6).alias("similarity"))
    )


def embedding_near_duplicates(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH self-join (bucket-blocked)."""
    withb = df.select(
        F.col(id_col),
        F.col(vec_col),
        _norm(F.col(vec_col)).alias("_norm"),
        lsh_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    a = withb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"),
        F.col("_norm").alias("norm_a"), "bucket",
    )
    b = withb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"),
        F.col("_norm").alias("norm_b"), "bucket",
    )
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("vec_a"), F.col("vec_b")) / (F.col("norm_a") * F.col("norm_b")), 6
            ).alias("similarity"),
        )
        .where(F.col("similarity") >= threshold)
        .distinct()
    )
