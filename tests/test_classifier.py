"""Quality classifier (functions/classifier.py): learning behavior
on separable synthetic data, real-table generalization, and the
fast-sigmoid surrogate's decision properties.  Cross-engine
bit-equality of the whole fit is certified by the
quality_classifier oracle (all 3 SFs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sonar_spark.functions.classifier import (
    quality_classifier,
    quality_features,
    train_quality_lr,
)


def test_learns_separable_synthetic(spark):
    # docs where the teacher label is driven by alpha ratio: "clean"
    # docs are alphabetic words, "dirty" docs are digit-ridden
    rows = []
    for i in range(120):
        if i % 2 == 0:
            text = "the quick brown fox jumps over a lazy dog today. "
            rows.append((i, (text * 3).strip()))
        else:
            rows.append((i, " ".join("x123456789" for _ in range(20))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = quality_classifier(docs).collect()
    acc = sum(r.correct for r in out) / len(out)
    assert acc == 1.0  # separable -> GD nails it
    # both classes live
    assert {r.pred for r in out} == {0, 1}


def test_real_table_generalizes(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = quality_classifier(docs).collect()
    hold = [r for r in out if r.split == "holdout"]
    train = [r for r in out if r.split == "train"]
    assert len(hold) > 0 and len(train) > 0
    acc_h = sum(r.correct for r in hold) / len(hold)
    assert acc_h > 0.85  # measured ~0.94-0.96 across SFs
    # both label classes present (the 0.73 bar actually splits)
    assert {r.label for r in out} == {0, 1}
    # prob is monotone with pred: every pred=1 prob >= 0.5 > pred=0
    assert all(
        (r.prob >= 0.5) == (r.pred == 1) for r in out
    )


def test_weights_deterministic_and_partition_free(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    f1 = quality_features(docs.repartition(1))
    f7 = quality_features(docs.repartition(7))
    assert train_quality_lr(f1) == train_quality_lr(f7)
