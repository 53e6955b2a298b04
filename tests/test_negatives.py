"""global_dense_index == row_number under any partitioning; the
negative-pairs skip-self bijection is self-free, exact-k, and
exactly uniform over the other docs in expectation."""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from sonar_spark.operators.negatives import (
    global_dense_index,
    negative_pairs,
)


def test_dense_index_equals_row_number(spark):
    # non-contiguous, shuffled ids across several partitions
    ids = [3, 7, 1, 100, 42, 999, 0, 55, 18, 2, 404, 77]
    df = spark.createDataFrame(
        [(i,) for i in ids], "doc_id long"
    ).repartition(5)
    got = {
        r["doc_id"]: r["gidx"]
        for r in global_dense_index(df, buckets=4).collect()
    }
    want = {d: g for g, d in enumerate(sorted(ids))}
    assert got == want
    # partition invariance
    got2 = {
        r["doc_id"]: r["gidx"]
        for r in global_dense_index(df.repartition(1), buckets=4).collect()
    }
    assert got2 == want


def test_negative_pairs_properties(spark):
    n, k = 40, 4
    docs = spark.createDataFrame(
        [(i * 3,) for i in range(n)], "doc_id long"
    )
    rows = negative_pairs(docs, k=k, salt="t").collect()
    assert len(rows) == n * k
    by_anchor: dict = {}
    for r in rows:
        assert r["neg_doc_id"] != r["doc_id"]  # self-free
        by_anchor.setdefault(r["doc_id"], set()).add(r["j"])
    assert all(js == set(range(k)) for js in by_anchor.values())
    # exact replay of the draw
    order = sorted(i * 3 for i in range(n))
    gidx = {d: g for g, d in enumerate(order)}
    for r in rows:
        h = int(
            hashlib.md5(f"t:{r['doc_id']}:{r['j']}".encode()).hexdigest()[
                :15
            ],
            16,
        )
        rr = h % (n - 1)
        ng = rr + 1 if rr >= gidx[r["doc_id"]] else rr
        assert r["neg_gidx"] == ng
        assert gidx[r["neg_doc_id"]] == ng


def test_negative_pairs_uniformity():
    # pure-python law check over many salts: each other index hit
    # ~uniformly (chi-square-ish loose bound)
    n, trials = 10, 2000
    hits = np.zeros(n)
    g = 4  # fixed anchor index
    for s in range(trials):
        h = int(hashlib.md5(f"s{s}".encode()).hexdigest()[:15], 16)
        r = h % (n - 1)
        hits[r + 1 if r >= g else r] += 1
    assert hits[g] == 0
    p = trials / (n - 1)
    assert np.all(np.abs(hits[np.arange(n) != g] - p) < 5 * np.sqrt(p))
