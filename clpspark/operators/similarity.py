"""Similarity search over embedding columns.

Brute-force cosine top-k as the exact baseline (one scan, JVM-side vector
math via zip_with/aggregate, TakeOrdered for the top-k) and a hyperplane-LSH
bucketed variant as the scale path (prunes the scan to buckets within a
signature hamming radius of the query — at 100 TB the bucket signature is a
partition/cluster key, so pruning happens at the storage layer).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _dot_with_lit(vec, qv: list[float]):
    return F.aggregate(
        F.zip_with(vec, F.array(*[F.lit(float(x)) for x in qv]), lambda a, b: a * b),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k: one scan, no shuffle, TakeOrdered."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))
    v = _as_double(vec_col)
    dot = _dot_with_lit(v, list(q))
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return (
        emb.select(
            F.col(id_col),
            F.round(dot / (nrm * F.lit(qn)), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def lsh_signature_expr(vec, planes: np.ndarray):
    """Bit-string signature of a vector column against fixed hyperplanes."""
    return F.concat(
        *[
            F.when(_dot_with_lit(vec, list(p)) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for p in planes
        ]
    )


def lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    probe_hamming: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k scanning only LSH buckets near the query.

    Buckets whose signature is within ``probe_hamming`` bits of the query's
    signature are scanned (multi-probe). Recall grows with probe_hamming;
    probe_hamming = n_planes degenerates to brute force.
    """
    dim = len(query_vec)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    q = np.asarray(query_vec, dtype=np.float64)
    q_sig = "".join("1" if float(p @ q) >= 0 else "0" for p in planes)

    v = _as_double(vec_col)
    sig = lsh_signature_expr(v, planes)
    # hamming distance between bit-string signatures (tiny, n_planes chars)
    dist = sum(
        F.when(F.substring(sig, i + 1, 1) != q_sig[i], 1).otherwise(0)
        for i in range(n_planes)
    )
    pruned = emb.where(dist <= F.lit(probe_hamming))
    return cosine_topk(pruned, list(q), k, vec_col, id_col)
