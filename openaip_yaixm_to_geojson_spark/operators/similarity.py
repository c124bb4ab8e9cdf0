"""Similarity search over embedding columns (array<float>).

* `cosine_topk` — exact brute-force top-k per query vector. Dot products
  are computed JVM-side with zip_with/aggregate; the accumulation is an
  exact DECIMAL sum so the result is order-independent and reproducible
  bit-for-bit on the DuckDB oracle (float += is not associative; decimal
  is).
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

# scale 14 so decimal ADDITION keeps the scale intact (Spark's decimal add
# grows precision; at scale 15 it would clamp to (38,14) and silently round)
DOT_DECIMAL = "decimal(30,14)"


def dot_decimal(a: Column, b: Column) -> Column:
    """Exact decimal dot product of two float arrays (order-independent;
    each double product rounds once to 14 dp, the sum is exact)."""
    products = F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(DOT_DECIMAL))
    return F.aggregate(
        products,
        F.lit(0).cast(DOT_DECIMAL),
        lambda acc, p: (acc + p).cast(DOT_DECIMAL),
    )


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
            dot_decimal(F.col(f"e.{vec_col}"), F.col("q.qvec")).alias("dot"),
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
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket, exact re-rank inside.

    One bucket assignment pass over the corpus (expressions only), then a
    bucket-equi-join instead of the full cross join — the candidate set per
    query shrinks by ~2^n_planes / (n_planes + 1). `multiprobe` also probes
    every Hamming-1 neighbour bucket of the query (near-misses on one
    hyperplane are the dominant recall loss).
    """
    from pyspark.sql import Window

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
            dot_decimal(F.col(f"e.{vec_col}"), F.col("q.qvec")).alias("dot"),
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
) -> DataFrame:
    """Near-duplicate vectors: exact cosine >= threshold among candidate
    pairs. Candidates = same LSH bucket (the scale path); with
    `exact_all_pairs=True` every a<b pair is checked — exhaustive and
    oracle-reproducible (use for correctness gates and small corpora).
    Returns (key_a, key_b, cosine), key_a < key_b."""
    cols = [
        F.col(id_col).alias("key"),
        F.col(vec_col).alias("vec"),
        # decimal-exact squared norm: order-independent, oracle-reproducible
        dot_decimal(F.col(vec_col), F.col(vec_col)).cast("double").alias("norm_sq"),
    ]
    if not exact_all_pairs:
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
        dot_decimal(F.col("a.vec"), F.col("b.vec")).cast("double")
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
