"""Swap certificate for the r6 DSIR gram-bucket kernel: per-doc
bucket counts from the Arrow kernel must equal the grouped expression
gram stream exactly (hashlib.md5 == F.md5 bit-for-bit), and the full
dsir_scores output over the kernel path must match a replay over the
expression stream's counts."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        (
            F.regexp_extract("source", r"src(\d+)", 1).cast("int") <= 3
        ).alias("is_target"),
        F.split(F.trim(F.col("text")), r"\s+").alias("words"),
    )


def test_gram_bucket_counts_equal_expression_stream(spark, sf_dir):
    from sonar_spark.functions.dsir import (
        _gram_bucket_counts,
        _gram_stream_expr,
    )

    docs = _docs(spark, sf_dir)
    kw = dict(
        id_col="doc_id", target_col="is_target", words_col="words",
        n_buckets=1024,
    )
    a = sorted(
        map(tuple, _gram_bucket_counts(docs, **kw).collect())
    )
    b = sorted(
        map(
            tuple,
            _gram_stream_expr(docs, **kw)
            .groupBy("doc_id", "is_target", "__b")
            .agg(F.count("*").cast("long").alias("__c"))
            .collect(),
        )
    )
    assert len(a) == len(b) > 0
    assert a == b
