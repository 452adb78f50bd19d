"""IVF ANN: deterministic quantizer, index layout, probe pruning, recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clpspark.operators.similarity import (
    assign_centroid_udf,
    cosine_topk,
    ivf_centroids,
    ivf_topk,
    kmeans_from_matrix,
    probe_cells,
    read_ivf_centroids,
    write_ivf_index,
)

Q = [1.0 if i % 3 == 0 else (-1.0 if i % 3 == 1 else 0.5) for i in range(64)]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def test_centroids_deterministic_across_parallelism(spark, emb):
    a = ivf_centroids(emb, n_centroids=8)
    b = ivf_centroids(emb.repartition(13), n_centroids=8)
    assert np.array_equal(a, b)


def test_kmeans_reduces_distortion():
    rng = np.random.default_rng(7)
    X = np.concatenate(
        [rng.normal(c, 0.1, size=(50, 8)) for c in (-3.0, 0.0, 3.0)]
    )
    # first-k init assumes a shuffled sample — which ivf_train_sample
    # guarantees via its (md5(id), id) hash order
    X = X[rng.permutation(len(X))]
    C = kmeans_from_matrix(X, 3, n_iter=10)
    d = np.sqrt(((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)).min(1)
    # three well-separated blobs -> every point lands near its own centroid
    assert d.mean() < 0.5


def test_ivf_index_probe_and_equality(spark, emb, tmp_path):
    idx = str(tmp_path / "ivf")
    C = write_ivf_index(emb, idx, n_centroids=16)
    indexed = spark.read.parquet(idx)
    assert np.array_equal(read_ivf_centroids(idx), C)
    # partition layout: every row's stored cell matches a fresh assignment
    fresh = emb.withColumn(
        "want", assign_centroid_udf(C)(F.col("embedding"))
    ).select("vec_id", "want")
    j = indexed.select("vec_id", "centroid").join(fresh, "vec_id")
    assert j.where(F.col("centroid") != F.col("want")).count() == 0
    # probing ALL cells == brute force exactly
    full = ivf_topk(indexed, Q, k=20, nprobe=16, centroids=C)
    brute = cosine_topk(emb, Q, k=20)
    assert [tuple(r) for r in full.collect()] == [
        tuple(r) for r in brute.collect()
    ]
    # nprobe=4 prunes the scan and keeps good recall on the top-k
    approx = {r["vec_id"] for r in ivf_topk(indexed, Q, k=20, nprobe=4,
                                            centroids=C).collect()}
    exact = {r["vec_id"] for r in brute.collect()}
    assert len(approx & exact) >= 10


def test_ivf_on_raw_input_matches_index(spark, emb, tmp_path):
    idx = str(tmp_path / "ivf2")
    C = write_ivf_index(emb, idx, n_centroids=8)
    indexed = spark.read.parquet(idx)
    a = [tuple(r) for r in
         ivf_topk(indexed, Q, k=10, nprobe=3, centroids=C).collect()]
    b = [tuple(r) for r in
         ivf_topk(emb, Q, k=10, nprobe=3, centroids=C).collect()]
    assert a == b


def test_probe_cells_orders_by_distance():
    C = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [7.0, 7.0]])
    assert probe_cells(C, [9.0, 1.0], 2) == [1, 3]
