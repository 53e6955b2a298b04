"""Kernelization certificates for the r6 projection kernels: the
numpy/Arrow forms of jl_project and int8_quantize_report must be
bit-identical to the retained Catalyst expression forms (the
content_detect kernel-swap protocol), including rows engineered onto
rounding boundaries."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _vec_table(spark, n=300, dim=64, seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        v = rng.normal(0.0, 1.0, dim)
        if i % 17 == 0:
            v = np.full(dim, float(rng.normal()))  # zero-range vector
        if i % 23 == 0:
            # quantize components onto 1/255 grid -> code rounds sit
            # exactly on .5 boundaries without the 1e-12 nudge
            v = np.round(v * 255) / 255.0
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _sorted(df):
    cols = sorted(df.columns)
    return [tuple(r) for r in df.select(cols).orderBy(cols).collect()]


@pytest.mark.parametrize("src", ["random", "testdata"])
def test_int8_kernel_bit_equal(spark, sf_dir, src):
    from sonar_spark.functions.projection import (
        int8_quantize_report,
        int8_quantize_report_expr,
    )

    if src == "random":
        emb = _vec_table(spark)
    else:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "embedding"
            ),
        )
    a = _sorted(int8_quantize_report(emb))
    b = _sorted(int8_quantize_report_expr(emb))
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra == rb, (ra, rb)


@pytest.mark.parametrize("src", ["random", "testdata"])
def test_jl_project_kernel_bit_equal(spark, sf_dir, src):
    from sonar_spark.functions.projection import (
        jl_project,
        jl_project_expr,
    )

    if src == "random":
        emb = _vec_table(spark, n=200)
    else:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "embedding"
            ),
        )
    a = _sorted(jl_project(emb))
    b = _sorted(jl_project_expr(emb))
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra == rb, (ra, rb)
