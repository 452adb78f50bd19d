"""Similarity search over embedding columns.

Brute-force cosine top-k as the exact baseline and a hyperplane-LSH bucketed
variant as the scale path (prunes the scan to buckets within a signature
hamming radius of the query — at 100 TB the bucket signature becomes a
partition/cluster key so pruning happens at the storage layer).

Vector math runs in Arrow-batched numpy UDFs: one (batch x dim) matrix op per
batch. Spark's array higher-order functions (aggregate/zip_with) evaluate
interpreted per element and are ~100x slower for wide vectors; the top-k
itself stays JVM-side (TakeOrderedAndProject).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mat(v: pd.Series) -> np.ndarray:
    return np.stack([np.asarray(x, dtype=np.float64) for x in v])


def cosine_udf(query_vec: list[float]):
    """pandas UDF: cosine(row_vec, query_vec), rounded to 6 decimals."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    @F.pandas_udf("double")
    def cos(v: pd.Series) -> pd.Series:
        m = _mat(v)
        dots = m @ q
        norms = np.sqrt((m * m).sum(axis=1))
        return pd.Series(np.round(dots / (norms * qn), 6))

    return cos


def dot_udf():
    """pandas UDF: elementwise dot of two array columns."""

    @F.pandas_udf("double")
    def dot(a: pd.Series, b: pd.Series) -> pd.Series:
        ma, mb = _mat(a), _mat(b)
        return pd.Series((ma * mb).sum(axis=1))

    return dot


def norm_udf():
    @F.pandas_udf("double")
    def nrm(v: pd.Series) -> pd.Series:
        m = _mat(v)
        return pd.Series(np.sqrt((m * m).sum(axis=1)))

    return nrm


def lsh_planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def signature_udf(planes: np.ndarray):
    """pandas UDF: hyperplane sign-bit signature as a bit string."""
    pt = planes.T.copy()

    @F.pandas_udf("string")
    def sig(v: pd.Series) -> pd.Series:
        bits = (_mat(v) @ pt) >= 0
        return pd.Series(["".join("1" if b else "0" for b in row) for row in bits])

    return sig


def hamming_to_udf(planes: np.ndarray, query_vec: list[float]):
    """pandas UDF: hamming distance of a row's signature to the query's."""
    pt = planes.T.copy()
    q_bits = (planes @ np.asarray(query_vec, dtype=np.float64)) >= 0

    @F.pandas_udf("int")
    def dist(v: pd.Series) -> pd.Series:
        bits = (_mat(v) @ pt) >= 0
        return pd.Series((bits != q_bits[None, :]).sum(axis=1).astype(np.int32))

    return dist


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k: one scan, no shuffle, TakeOrdered."""
    cos = cosine_udf(query_vec)
    return (
        emb.select(F.col(id_col), cos(F.col(vec_col)).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
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
    are scanned (multi-probe); probe_hamming = n_planes degenerates to brute
    force.
    """
    planes = lsh_planes(len(query_vec), n_planes, seed)
    dist = hamming_to_udf(planes, query_vec)
    pruned = emb.where(dist(F.col(vec_col)) <= F.lit(probe_hamming))
    return cosine_topk(pruned, query_vec, k, vec_col, id_col)
