"""IVF ANN: exhaustive-probe equals brute force; pruned-probe recall;
determinism of the trained quantizer."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sonar_spark.operators.ann import ivf_assign, ivf_search, train_centroids
from sonar_spark.operators.topk import knn_bruteforce

N, DIM, K = 300, 16, 5


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(21)
    # clustered data so IVF pruning is meaningful
    centers = rng.standard_normal((8, DIM)) * 3
    rows = []
    for i in range(N):
        c = centers[i % 8]
        rows.append((i, (c + rng.standard_normal(DIM)).astype(float).tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_exhaustive_probe_equals_bruteforce(spark, emb):
    cents = train_centroids(emb, n_centroids=8, seed=42)
    index = ivf_assign(emb, cents)
    queries = emb.where(F.col("vec_id") < 20)
    got = ivf_search(index, queries, cents, k=K, n_probe=len(cents)).collect()
    want = knn_bruteforce(queries, emb, k=K).collect()
    gm = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in got}
    wm = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in want}
    assert gm == wm


def test_pruned_probe_recall(spark, emb):
    cents = train_centroids(emb, n_centroids=8, seed=42)
    index = ivf_assign(emb, cents)
    queries = emb.where(F.col("vec_id") < 30)
    got = ivf_search(index, queries, cents, k=K, n_probe=2).collect()
    want = knn_bruteforce(queries, emb, k=K).collect()
    gset = {(r["query_id"], r["neighbor_id"]) for r in got}
    wset = {(r["query_id"], r["neighbor_id"]) for r in want}
    recall = len(gset & wset) / len(wset)
    assert recall >= 0.8, recall


def test_centroids_deterministic(spark, emb):
    a = train_centroids(emb, n_centroids=8, seed=42)
    b = train_centroids(emb, n_centroids=8, seed=42)
    np.testing.assert_array_equal(a, b)


def test_assignment_covers_all(spark, emb):
    cents = train_centroids(emb, n_centroids=8, seed=42)
    index = ivf_assign(emb, cents)
    assert index.count() == N
    cids = [r["centroid_id"] for r in index.select("centroid_id").distinct().collect()]
    assert all(0 <= c < 8 for c in cids)


def test_hyperplane_lsh_recall(spark):
    """Random-hyperplane LSH candidates contain every high-cosine
    pair (planted near-identical vectors); disjoint random vectors do
    not flood the candidate set."""
    import numpy as np
    from pyspark.sql import functions as F

    from sonar_spark.operators.ann import hyperplane_lsh_pairs

    rng = np.random.default_rng(71)
    rows = []
    for i in range(60):
        v = rng.standard_normal(32)
        rows.append((i, v.tolist()))
        if i < 10:  # planted near-dup: tiny perturbation
            rows.append((1000 + i, (v + 0.01 * rng.standard_normal(32)).tolist()))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in hyperplane_lsh_pairs(df, n_bits=256, band_bits=16).collect()
    }
    want = {(i, 1000 + i) for i in range(10)}
    assert want <= cand, want - cand
    # candidate set stays sparse: nowhere near all-pairs (70*69/2=2415)
    assert len(cand) < 500, len(cand)
