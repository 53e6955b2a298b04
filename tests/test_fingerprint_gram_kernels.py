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


def test_shingle_hash_jaccard_equals_string(spark, sf_dir):
    """The hashed shingle sets must reproduce every pairwise
    |A∩B| / |A∪B| of the string shingle sets on the real corpus
    (certifies zero blake2b-64 collisions here) — checked directly
    on set sizes per doc AND on a pairwise-jaccard sample."""
    from pyspark.sql import functions as F

    from sonar_spark.operators.fingerprint import shingle_hash_table

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("words")
    )
    str_sh = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size("words") - 3, F.lit(1))
                ),
                lambda i: F.concat_ws(" ", F.slice("words", i, 4)),
            )
        ).alias("sh"),
    )
    hash_sh = shingle_hash_table(docs)
    a = {r["doc_id"]: len(r["sh"]) for r in str_sh.collect()}
    b = {r["doc_id"]: len(r["sh"]) for r in hash_sh.collect()}
    assert a == b and len(a) > 0
    # pairwise jaccard on a bounded slice, both forms
    sl = docs.where(F.col("doc_id") < 60)

    def jacs(t):
        x = t.select(F.col("doc_id").alias("da"), F.col("sh").alias("sa"))
        y = t.select(F.col("doc_id").alias("db"), F.col("sh").alias("sb"))
        p = x.join(y, F.col("da") < F.col("db"))
        return sorted(
            map(
                tuple,
                p.select(
                    "da",
                    "db",
                    F.round(
                        F.size(F.array_intersect("sa", "sb")).cast("double")
                        / F.size(F.array_union("sa", "sb")),
                        6,
                    ).alias("j"),
                ).collect(),
            )
        )

    js = jacs(
        sl.select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.size("words") - 3, F.lit(1)),
                    ),
                    lambda i: F.concat_ws(" ", F.slice("words", i, 4)),
                )
            ).alias("sh"),
        )
    )
    jh = jacs(shingle_hash_table(sl))
    assert js == jh and len(js) > 0
