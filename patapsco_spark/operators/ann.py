"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (one scan, JVM-side
arithmetic via higher-order functions — no Python in the hot path). The
scale path is LSH bucketing (random-hyperplane signs) that prunes candidates
before the exact re-rank, the standard recipe for billion-vector corpora.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine similarity to one query vector.

    The whole computation is Catalyst higher-order functions on the array
    column (whole-stage codegen); top-k is a global sort limited to k —
    Spark's TakeOrderedAndProject, no full sort materialized.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    vec = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    scored = embeddings.select(
        F.col(id_col),
        (_dot(vec, q) / (_norm(vec) * F.lit(qn))).alias("cosine"))
    return (scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)
            .select(id_col, F.round("cosine", 6).alias("cosine")))


def cosine_topk_many(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     qid_col: str = "qid", qvec_col: str = "qvec") -> DataFrame:
    """Exact top-k for a batch of query vectors: broadcast the (small) query
    side, score per pair, per-query window top-k."""
    pairs = embeddings.crossJoin(F.broadcast(queries))
    vec = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    qvec = F.transform(F.col(qvec_col), lambda v: v.cast("double"))
    scored = pairs.select(
        F.col(qid_col), F.col(id_col),
        (_dot(vec, qvec) / (_norm(vec) * _norm(qvec))).alias("cosine"))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select(qid_col, id_col, (F.col("rn") - 1).alias("rank"),
                    F.round("cosine", 6).alias("cosine")))


def lsh_bucket(embeddings: DataFrame, planes: np.ndarray,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: bit_i = sign(v·p_i).

    ``planes`` is (n_bits, dim), generated deterministically by the caller
    (seeded numpy). Vectors likely-similar share buckets; at scale the ANN
    query touches only its bucket (plus neighbors for recall).
    """
    vec = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    bucket = None
    for i, p in enumerate(planes):
        parr = F.array(*[F.lit(float(x)) for x in p])
        bit = (_dot(vec, parr) > 0).cast("long")
        contrib = F.shiftleft(bit, i)
        bucket = contrib if bucket is None else bucket.bitwiseOR(contrib)
    return embeddings.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def lsh_cosine_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                    n_bits: int = 8, seed: int = 42,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket or
    buckets at Hamming distance 1 (cheap recall boost)."""
    dim = len(query_vec)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))
    bucketed = lsh_bucket(embeddings, planes, id_col, vec_col)
    qsig = 0
    qv = np.asarray(query_vec, dtype=np.float64)
    for i, p in enumerate(planes):
        if float(qv @ p) > 0:
            qsig |= 1 << i
    nearby = [qsig] + [qsig ^ (1 << i) for i in range(n_bits)]
    cand = bucketed.where(F.col("bucket").isin(nearby)).drop("bucket")
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
