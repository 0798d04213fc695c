"""Deduplication operators for training-data pipelines:

* exact        — hash-groupBy on a normalized fingerprint (one shuffle,
                 map-side combined);
* MinHash+LSH  — shingle → n minhashes → b bands → bucket self-join; only
                 same-bucket pairs are compared, so candidate generation is
                 O(n·b) shuffle rows instead of O(n²) comparisons;
* SimHash      — 64-bit signature via vectorized Arrow-batch numpy (the one
                 place built-ins can't express the per-bit majority vote);
* n-gram Jaccard — exact similarity for LSH candidates (verification step).

All signatures are deterministic (xxhash64-seeded), so results are stable
across runs and parallelism levels.

(No ``from __future__ import annotations`` here: pandas_udf resolves the
type hints at definition time and stringified hints break it.)
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_text(text):
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


# ---------------------------------------------------------------- exact


def exact_duplicate_groups(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """(fingerprint, n_docs, doc_ids) for groups with more than one doc."""
    fp = F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    return (
        df.select(F.col(id_col), fp)
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .where(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one doc (min id) per normalized-text fingerprint."""
    fp = F.md5(normalize_text(F.col(text_col)))
    w = df.withColumn("_fp", fp)
    keep = w.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return w.join(keep, on=["_fp", id_col], how="left_semi").drop("_fp")


# ---------------------------------------------------------------- shingles


def char_shingles_expr(text_col: str, k: int = 5):
    """Character k-shingles of normalized text as an array column —
    JVM-side sequence + substring, no UDF (substring with a Column start
    needs SQL-expr form)."""
    norm = f"lower(trim(regexp_replace({text_col}, '\\\\s+', ' ')))"
    return F.expr(
        f"CASE WHEN length({norm}) < {k} THEN array({norm}) "
        f"ELSE transform(sequence(1, length({norm}) - {k} + 1), i -> substring({norm}, i, {k})) END"
    )


# ---------------------------------------------------------------- minhash


def minhash_signature(shingles, n_hashes: int = 32):
    """Array of n minhash values: min over shingles of xxhash64(seed_j, s).

    NB: the per-seed lambda must stay single-arity — PySpark passes the
    element *index* as a second argument to 2-arity HOF lambdas, which would
    silently shadow a default-arg seed."""

    def min_hash(j: int):
        seed = F.lit(j)
        return F.array_min(F.transform(shingles, lambda s: F.xxhash64(seed, s)))

    return F.array(*[min_hash(j) for j in range(n_hashes)])


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH.

    rows = bands of r = n_hashes/bands minhashes each; docs sharing any
    band hash land in one bucket; pairs generated within buckets only.
    Returns (id_a, id_b) with id_a < id_b, deduplicated across bands.
    """
    assert n_hashes % bands == 0
    r = n_hashes // bands
    # materialize shingles once: the signature references a plain column, so
    # the shingle expression is planned/evaluated once, not duplicated into
    # all n_hashes transform() trees (a 32x codegen/runtime blowup otherwise)
    shingled = df.select(
        F.col(id_col), char_shingles_expr(text_col, shingle_k).alias("_shingles")
    )
    sig = minhash_signature(F.col("_shingles"), n_hashes)
    with_sig = shingled.select(F.col(id_col), sig.alias("_sig"))
    band_rows = with_sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[F.col("_sig")[b * r + i] for i in range(r)]).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.bhash")
    left = band_rows.select(F.col(id_col).alias("id_a"), "band", "bhash")
    right = band_rows.select(F.col(id_col).alias("id_b"), "band", "bhash")
    pairs = (
        left.join(right, on=["band", "bhash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return pairs


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    n_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
) -> DataFrame:
    """LSH candidates verified by exact n-gram Jaccard >= threshold."""
    cands = minhash_lsh_candidates(df, text_col, id_col, n_hashes, bands, shingle_k)
    sh = df.select(
        F.col(id_col),
        F.array_distinct(char_shingles_expr(text_col, shingle_k)).alias("_sh"),
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("_sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("_sh_b"))
    joined = cands.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    union = F.size("_sh_a") + F.size("_sh_b") - inter
    return (
        joined.select(
            "id_a",
            "id_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------- n-gram jaccard (exact, join on shared shingle)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 8,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Exact Jaccard over distinct char shingles for all pairs sharing at
    least one shingle.  Shuffles one row per (doc, shingle) — fine when
    shingles are selective (larger k); LSH is the scale path otherwise."""
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(char_shingles_expr(text_col, shingle_k))).alias("sh"),
    ).withColumn("sh", F.md5("sh"))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "sh")
    b = sh.select(F.col(id_col).alias("id_b"), "sh")
    common = (
        a.join(b, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )


# ---------------------------------------------------------------- simhash


def simhash_64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word tokens via a vectorized Arrow-batch pandas
    UDF (per-bit majority vote isn't expressible with built-ins without 64
    aggregate expressions).  numpy end-to-end inside the batch."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def simhash(texts: pd.Series) -> pd.Series:
        import numpy as np

        shifts = np.arange(64, dtype=np.uint64)
        one = np.uint64(1)
        # per-batch token cache: each distinct token is hashed + bit-expanded
        # once, then every occurrence is a vectorized array add
        bitvec_cache: dict[str, "np.ndarray"] = {}

        def bitvec(tok: str):
            bv = bitvec_cache.get(tok)
            if bv is None:
                h = 0xCBF29CE484222325  # FNV-1a, deterministic across runs
                for ch in tok.encode("utf-8"):
                    h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
                bits = (np.uint64(h) >> shifts) & one
                bv = np.where(bits == one, 1, -1).astype(np.int64)
                bitvec_cache[tok] = bv
            return bv

        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if t is None:
                continue
            toks = str(t).lower().split()
            if not toks:
                continue
            acc = np.zeros(64, dtype=np.int64)
            for tok in toks:
                acc += bitvec(tok)
            # pack sign bits (disjoint shifts -> exact uint64 sum), reinterpret
            # as signed i64 for Spark's LongType
            sig = ((acc > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
            out[i] = np.uint64(sig).view(np.int64)
        return pd.Series(out)

    return df.select(F.col(id_col), simhash(F.col(text_col)).alias("simhash"))


def simhash_near_duplicates(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Pairs within a Hamming radius, blocked by 4x16-bit sub-bands (any pair
    within distance 3 shares at least one exact 16-bit band — pigeonhole)."""
    sigs = simhash_64(df, text_col, id_col)
    bands = sigs.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("bhash"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", "bk.band", "bk.bhash")
    a = bands.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"), "band", "bhash")
    b = bands.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"), "band", "bhash")
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, ["band", "bhash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
