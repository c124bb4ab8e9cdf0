"""Similarity search over embedding columns (array<float>).

* `cosine_topk` — exact brute-force top-k per query vector. Dot products
  are computed JVM-side with zip_with/aggregate as strict left-fold double
  sums — bit-identical to the DuckDB oracle's list_reduce fold (see
  dot_double).
* `lsh_ann_topk` — the scale path: random-hyperplane LSH buckets
  (hyperplanes derived deterministically from md5, no RNG state), probe
  only the query's bucket (+ optional multi-probe), exact re-rank inside
  the bucket. Recall measured against brute force in tests.
* `embedding_neardup_pairs` — near-duplicate detection: pairs of vectors
  with cosine >= threshold among LSH-bucket collisions.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def dot_double(a: Column, b: Column) -> Column:
    """Dot product as a strict LEFT-FOLD double sum.

    Spark's `aggregate` folds left over array order; DuckDB's `list_reduce`
    does the same, and `0.0 + p1 == p1` exactly in IEEE — so both engines
    produce bit-identical dots with plain doubles. (An earlier decimal-sum
    variant was order-independent but the per-product decimal ROUNDING
    boundary differs between engines: float32 products frequently terminate
    exactly on half-ULP decimal boundaries, which diverged at sf0.1.)
    """
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, p: acc + p)


def norm_double(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, p: acc + p,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbours per query by dot product (queries broadcast).

    Returns (query_id, vec_id, dot, rank). Rank ties break on vec_id so the
    result is total-ordered and oracle-reproducible. For unit-normalized
    embeddings dot == cosine; use `dot / (norm_a * norm_b)` otherwise.
    """
    from pyspark.sql import Window

    scored = (
        embeddings.alias("e")
        .crossJoin(F.broadcast(queries.alias("q")))
        .where(F.col(f"q.{query_id_col}") != F.col(f"e.{id_col}"))
        .select(
            F.col(f"q.{query_id_col}").alias("query_id"),
            F.col(f"e.{id_col}").alias("vec_id"),
            dot_double(F.col(f"e.{vec_col}"), F.col("q.qvec")).alias("dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("dot").cast("double").alias("dot"), "rank")
    )


def hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: coefficient (i, j) comes
    from md5(f"plane-{i}-{j}") — no RNG state, identical on every run and
    engine."""
    out = np.empty((n_planes, dim), dtype=np.float64)
    for i in range(n_planes):
        for j in range(dim):
            digest = hashlib.md5(f"plane-{i}-{j}".encode()).hexdigest()
            out[i, j] = (int(digest[:8], 16) / float(0xFFFFFFFF)) * 2.0 - 1.0
    return out


def lsh_bucket_col(vec: Column, planes: np.ndarray) -> Column:
    """Sign-of-projection bucket id (one bit per hyperplane), JVM-side."""
    bits = []
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(w)) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, p: acc + p,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return bucket


def lsh_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket, exact re-rank inside.

    One bucket assignment pass over the corpus (expressions only), then a
    bucket-equi-join instead of the full cross join — the candidate set per
    query shrinks by ~2^n_planes / (n_planes + 1). `multiprobe` also probes
    every Hamming-1 neighbour bucket of the query (near-misses on one
    hyperplane are the dominant recall loss).
    """
    from pyspark.sql import Window

    if dim is None:
        # fallback metadata action; callers should pass dim to keep
        # plan-build free of Spark jobs
        dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes)
    corpus = embeddings.withColumn("bucket", lsh_bucket_col(F.col(vec_col), planes))
    probes = queries.withColumn("bucket", lsh_bucket_col(F.col("qvec"), planes))
    if multiprobe:
        neighbours = F.array(
            F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
        )
        probes = probes.withColumn("bucket", F.explode(neighbours))
    scored = (
        corpus.alias("e")
        .join(F.broadcast(probes.alias("q")), "bucket")
        .where(F.col(f"q.{query_id_col}") != F.col(f"e.{id_col}"))
        .select(
            F.col(f"q.{query_id_col}").alias("query_id"),
            F.col(f"e.{id_col}").alias("vec_id"),
            dot_double(F.col(f"e.{vec_col}"), F.col("q.qvec")).alias("dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("dot").cast("double").alias("dot"), "rank")
    )


def ivf_centroids(dim: int, n_centroids: int) -> np.ndarray:
    """Deterministic pseudo-random coarse-quantizer centroids, same md5
    scheme as hyperplanes() (no RNG state, no training pass — a k-means
    refinement would improve recall but break oracle determinism)."""
    out = np.empty((n_centroids, dim), dtype=np.float64)
    for i in range(n_centroids):
        for j in range(dim):
            digest = hashlib.md5(f"centroid-{i}-{j}".encode()).hexdigest()
            out[i, j] = (int(digest[:8], 16) / float(0xFFFFFFFF)) * 2.0 - 1.0
    return out


def _centroid_dots(vec: Column, centroids: np.ndarray) -> list[Column]:
    return [
        F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(w)) for w in c]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, p: acc + p,
        )
        for c in centroids
    ]


def ivf_assign_col(vec: Column, centroids: np.ndarray) -> Column:
    """Nearest-centroid (max dot) list id, ties to the LOWEST centroid id —
    pure expressions, zero shuffle on the corpus.

    Single-pass argmax fold: each centroid dot is evaluated exactly once
    (the obvious array_position(dots, array_max(dots)) evaluates the whole
    dot array twice). Strict `>` keeps the EARLIEST maximum, which matches
    the oracle's first-match CASE chain including the -0.0 == 0.0 corner."""
    pairs = F.array(
        *[
            F.struct(d.alias("d"), F.lit(i).alias("cid"))
            for i, d in enumerate(_centroid_dots(vec, centroids))
        ]
    )
    init = F.struct(F.lit(float("-inf")).alias("d"), F.lit(-1).alias("cid"))
    best = F.aggregate(pairs, init, lambda acc, x: F.when(x["d"] > acc["d"], x).otherwise(acc))
    return best["cid"].cast("int")


def ivf_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    n_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
) -> DataFrame:
    """IVF-style ANN: corpus vectors are assigned to their nearest coarse
    centroid (one expression pass, no shuffle); each query probes its
    `n_probes` nearest centroid lists and re-ranks exactly inside them.

    The inverted-list equi-join replaces the cross join — candidates per
    query shrink ~n_centroids/n_probes-fold. Complements the hyperplane-LSH
    variant: IVF partitions by region (good when vectors cluster), LSH by
    direction."""
    from pyspark.sql import Window

    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    cents = ivf_centroids(dim, n_centroids)
    corpus = embeddings.withColumn("cid", ivf_assign_col(F.col(vec_col), cents))
    # query probe lists: top-n_probes centroids by dot desc, centroid-id asc
    qdots = F.array(
        *[
            F.struct((-d).alias("nd"), F.lit(i).alias("cid"))
            for i, d in enumerate(_centroid_dots(F.col("qvec"), cents))
        ]
    )
    probes = (
        queries.withColumn("_p", F.slice(F.sort_array(qdots), 1, n_probes))
        .withColumn("cid", F.explode(F.transform(F.col("_p"), lambda s: s["cid"])))
        .drop("_p")
    )
    scored = (
        corpus.alias("e")
        .join(F.broadcast(probes.alias("q")), "cid")
        .where(F.col(f"q.{query_id_col}") != F.col(f"e.{id_col}"))
        .select(
            F.col(f"q.{query_id_col}").alias("query_id"),
            F.col(f"e.{id_col}").alias("vec_id"),
            dot_double(F.col(f"e.{vec_col}"), F.col("q.qvec")).alias("dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.col("dot").cast("double").alias("dot"), "rank")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    cosine_threshold: float = 0.95,
    n_planes: int = 8,
    exact_all_pairs: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate vectors: exact cosine >= threshold among candidate
    pairs. Candidates = same LSH bucket (the scale path); with
    `exact_all_pairs=True` every a<b pair is checked — exhaustive and
    oracle-reproducible (use for correctness gates and small corpora).
    Returns (key_a, key_b, cosine), key_a < key_b."""
    cols = [
        F.col(id_col).alias("key"),
        F.col(vec_col).alias("vec"),
        # left-fold squared norm: oracle-reproducible bit-for-bit
        dot_double(F.col(vec_col), F.col(vec_col)).alias("norm_sq"),
    ]
    if not exact_all_pairs:
        if dim is None:
            dim = len(embeddings.select(vec_col).first()[0])
        planes = hyperplanes(dim, n_planes)
        cols.append(lsh_bucket_col(F.col(vec_col), planes).alias("bucket"))
    bucketed = embeddings.select(*cols)
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cond = F.col("a.key") < F.col("b.key")
    if not exact_all_pairs:
        cond = cond & (F.col("a.bucket") == F.col("b.bucket"))
    cosine = (
        dot_double(F.col("a.vec"), F.col("b.vec"))
        / F.sqrt(F.col("a.norm_sq") * F.col("b.norm_sq"))
    )
    return (
        a.join(b, cond)
        .withColumn("cosine", cosine)
        .where(F.col("cosine") >= cosine_threshold)
        .select(F.col("a.key").alias("key_a"), F.col("b.key").alias("key_b"), "cosine")
    )


def queries_from_embeddings(embeddings: DataFrame, n: int = 5, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """First n vectors (by id) as the query set."""
    return (
        embeddings.where(F.col(id_col) < n)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    )
