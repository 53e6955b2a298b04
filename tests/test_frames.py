"""Frame expansion: count formula, window contents, token equality."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sonar_spark import datagen, kernels, oracle
from sonar_spark.config import FrameConfig
from sonar_spark.operators.frames import expand_frames, token_equality_check


@given(
    n=st.integers(min_value=0, max_value=500),
    w=st.integers(min_value=1, max_value=64),
    h=st.integers(min_value=1, max_value=64),
)
def test_frame_count_formula(n, w, h):
    got = kernels.n_frames(n, w, h)
    want = len(oracle.frame_slices(list(range(n)), w, h))
    assert got == want


@given(
    n=st.integers(min_value=0, max_value=300),
    w=st.integers(min_value=1, max_value=48),
    h=st.integers(min_value=1, max_value=48),
)
@settings(max_examples=50)
def test_frame_view_matches_slices(n, w, h):
    x = np.arange(n, dtype=np.float64)
    view = kernels.frame_view(x, w, h)
    want = oracle.frame_slices(x, w, h)
    assert view.shape[0] == len(want)
    if want:
        np.testing.assert_array_equal(view, np.asarray(want))


def test_expand_frames_matches_oracle(spark):
    cfg = FrameConfig(window=64, hop=16)
    df = datagen.token_table(spark, n_docs=8)
    rows = {r["doc_id"]: r for r in df.collect()}
    got = expand_frames(df, cfg).collect()
    # group by doc
    by_doc: dict[str, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, src in rows.items():
        want = oracle.frame_slices(src["tokens"], cfg.window, cfg.hop)
        have = sorted(by_doc.get(doc_id, []), key=lambda r: r["frame_idx"])
        assert len(have) == len(want), doc_id
        for fr, w in zip(have, want):
            assert fr["frame_ts"] == fr["frame_idx"] * cfg.hop
            assert [float(t) for t in fr["window"]] == w


def test_token_equality_invariant(spark):
    df = datagen.token_table(spark, n_docs=12)
    # identity pipeline preserves tokens byte-for-byte
    assert token_equality_check(df, df.select("doc_id", "tokens")) == 0
    # corrupting one row is detected
    from pyspark.sql import functions as F

    corrupted = df.withColumn(
        "tokens",
        F.when(F.col("doc_id") == "doc00000003", F.slice("tokens", 1, 5)).otherwise(
            F.col("tokens")
        ),
    )
    assert token_equality_check(df, corrupted) == 1


def test_edge_docs_present(spark):
    """Docs 0/1/2 hit the frame-count boundaries (FIXTURES.md #1)."""
    cfg = FrameConfig(window=64, hop=16)
    df = datagen.token_table(spark, n_docs=4)
    nf = {
        r["doc_id"]: r["n"]
        for r in expand_frames(df, cfg)
        .groupBy("doc_id")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert "doc00000000" not in nf  # n_tok=32 < W
    assert nf["doc00000001"] == 1  # n_tok == W
    assert nf["doc00000002"] == 1  # n_tok == W+H-1
