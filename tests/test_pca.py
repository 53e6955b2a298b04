"""PCA (functions/pca.py): planted-spike convergence, partitioning
invariance of the exact Gram partials, and fit sanity on the real
embeddings table.

The cross-engine value contract (Spark fit+projection == the unrolled
DuckDB CTE replay, bit-for-bit) is certified by the pca_project
oracle in tools/check_oracle.py; these tests cover what the oracle
can't: that the power iteration actually CONVERGES to the true
component when the spectrum has a gap (the testdata table is
near-isotropic by construction, so convergence there is planted via
the dim ramp — here we plant a spike instead and compare against
numpy.linalg.eigh ground truth).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sonar_spark.functions.pca import (
    PCA_DIM,
    _micro_np,
    _power,
    gram_partials,
    pca_fit,
    pca_project,
    pca_weights,
)


def _make_spiked(n: int, seed: int, s1: float = 0.8, s2: float = 0.5):
    """Rows whose WEIGHTED image Xw = X * ramp has two planted
    orthogonal spike directions over small isotropic noise."""
    rng = np.random.RandomState(seed)
    u1 = rng.randn(PCA_DIM)
    u1 /= np.linalg.norm(u1)
    u2 = rng.randn(PCA_DIM)
    u2 -= u1 * (u1 @ u2)
    u2 /= np.linalg.norm(u2)
    Z = rng.randn(n, PCA_DIM) * 0.03
    Xw = Z + np.outer(rng.randn(n) * s1, u1) + np.outer(
        rng.randn(n) * s2, u2
    )
    # keep |weighted components| <= 1 so micro sums stay exact
    Xw = np.clip(Xw, -0.999, 0.999)
    X = Xw / np.array(pca_weights())
    return X, u1, u2


def _np_cov(Xw: np.ndarray) -> np.ndarray:
    n = float(Xw.shape[0])
    S = np.zeros((PCA_DIM, PCA_DIM))
    for i in range(PCA_DIM):
        S[i] = _micro_np(Xw * Xw[:, i : i + 1]).sum(axis=0)
    sm = _micro_np(Xw).sum(axis=0).astype(float)
    return ((S / 1e9) - np.outer(sm / 1e9, sm / 1e9) / n) / n


def test_power_iteration_recovers_planted_spike():
    X, u1, u2 = _make_spiked(400, seed=11)
    C = _np_cov(X * np.array(pca_weights()))
    evs, V = np.linalg.eigh(C)
    w1, ev1 = _power(C.tolist())
    assert abs(ev1 - evs[-1]) < 1e-6 * max(1.0, evs[-1])
    assert abs(float(np.dot(w1, V[:, -1]))) > 0.9999
    # the planted direction IS the top eigenvector here
    assert abs(float(np.dot(w1, u1))) > 0.999
    C2 = C - ev1 * np.outer(w1, w1)
    w2, ev2 = _power(C2.tolist())
    assert ev1 > ev2 > 0
    assert abs(float(np.dot(w2, u2))) > 0.99
    assert abs(float(np.dot(w1, w2))) < 1e-3


def test_gram_partials_partitioning_invariant(spark):
    X, _, _ = _make_spiked(300, seed=7)
    rows = [(i, [float(v) for v in X[i]]) for i in range(X.shape[0])]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    a = {
        (r.i, r.j): r.s
        for r in gram_partials(df.repartition(1)).collect()
    }
    b = {
        (r.i, r.j): r.s
        for r in gram_partials(df.repartition(7)).collect()
    }
    assert a == b  # exact integer micro-units: order/partition free


def test_pca_fit_matches_eigh_on_spiked_spark_table(spark):
    X, u1, _ = _make_spiked(400, seed=23)
    rows = [(i, [float(v) for v in X[i]]) for i in range(X.shape[0])]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    w1, w2, ev1, ev2 = pca_fit(df)
    C = _np_cov(X * np.array(pca_weights()))
    evs, V = np.linalg.eigh(C)
    assert abs(ev1 - evs[-1]) < 1e-6
    assert abs(float(np.dot(w1, V[:, -1]))) > 0.9999
    # noise shifts the true top eigenvector slightly off the planted
    # direction — looser bound against u1 itself
    assert abs(float(np.dot(w1, u1))) > 0.99
    assert ev1 > ev2 > 0
    nrm1 = math.sqrt(sum(t * t for t in w1))
    assert abs(nrm1 - 1.0) < 1e-6


def test_pca_project_real_table(spark, sf_dir):
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            "vec_id",
            F.transform(
                "embedding", lambda x: x.cast("double")
            ).alias("embedding"),
        )
    )
    out = pca_project(emb)
    pdf = out.toPandas()
    assert len(pdf) == emb.count()
    assert set(pdf.columns) == {
        "vec_id", "pc1", "pc2", "ev1", "ev2", "top_dim",
    }
    ev1, ev2 = pdf.ev1.iloc[0], pdf.ev2.iloc[0]
    assert ev1 > ev2 > 0
    # the planted ramp makes dim 63 dominate the top loading
    assert pdf.top_dim.iloc[0] == 63
    # projection variance onto pc1 should be ~ev1 (Rayleigh):
    # loose bound only — scores are 6dp-rounded
    var1 = float(np.var(pdf.pc1.to_numpy()))
    assert abs(var1 - ev1) / ev1 < 0.05
