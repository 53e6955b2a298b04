"""Kernelization certificate for the r6 repetition_profile Arrow
kernel: bit-identical to the retained Catalyst expression form on the
real corpus and on boundary-engineered synthetic docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _sorted(df):
    cols = sorted(df.columns)
    return [tuple(r) for r in df.select(cols).orderBy(cols).collect()]


@pytest.mark.parametrize("src", ["synthetic", "testdata"])
def test_repetition_profile_kernel_bit_equal(spark, sf_dir, src):
    from sonar_spark.functions.text import (
        repetition_profile,
        repetition_profile_expr,
    )

    if src == "synthetic":
        rows = [
            (0, "a"),                      # single token, m clamps to 1
            (1, "a a a a a a"),            # fully repeated
            (2, "a b c d e f g h"),        # fully novel
            (3, "a b a b a b a b a b"),    # period-2: dup 3-grams
            (4, "x y"),                    # n < k for both k
            (5, " ".join(["w%d" % (i % 7) for i in range(40)])),
            (6, "t t s s t t s s t"),      # boundary-ish fractions
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
    else:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("words")
    )
    a = _sorted(repetition_profile(words))
    b = _sorted(repetition_profile_expr(words))
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra == rb, (ra, rb)
