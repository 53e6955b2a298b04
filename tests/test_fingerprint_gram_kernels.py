"""Swap certificates for the r6 gram-hash kernel plans: the hashed
substring_spans / ngram_novelty must produce exactly the rows of the
retained string-keyed forms on the real corpus (this also certifies
zero 64-bit gram-hash collisions ON THESE CORPORA — a collision would
perturb a count or a first-seen id and change some row)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _words(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("words")
    )


def _sorted(df):
    cols = sorted(df.columns)
    return [tuple(r) for r in df.select(cols).orderBy(cols).collect()]


@pytest.mark.parametrize("k", [4, 3])
def test_substring_spans_hash_equals_string(spark, sf_dir, k):
    from sonar_spark.operators.fingerprint import (
        substring_spans,
        substring_spans_expr,
    )

    docs = _words(spark, sf_dir)
    a = _sorted(substring_spans(docs, k=k))
    b = _sorted(substring_spans_expr(docs, k=k))
    assert len(a) == len(b) > 0
    assert a == b


def test_ngram_novelty_hash_equals_string(spark, sf_dir):
    from sonar_spark.operators.fingerprint import (
        ngram_novelty,
        ngram_novelty_expr,
    )

    docs = _words(spark, sf_dir)
    a = _sorted(ngram_novelty(docs, k=4))
    b = _sorted(ngram_novelty_expr(docs, k=4))
    assert len(a) == len(b) > 0
    assert a == b
