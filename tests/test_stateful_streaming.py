"""Stateful streaming featurizer: chunked arrival across micro-batches
must reproduce the batch featurizer's frames exactly (carry-over
buffer semantics of the reference STFTStreamer)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sonar_spark import datagen
from sonar_spark.config import FrameConfig
from sonar_spark.operators.features import frame_features_arrow
from sonar_spark.streaming.stateful import stream_frame_features

CFG = FrameConfig(window=64, hop=16)


def test_stream_equals_batch(spark, tmp_path):
    # 6 docs split into 3 chunk files -> 3 micro-batches
    rng = np.random.default_rng(23)
    docs = {f"d{i}": rng.integers(0, 5000, size=200 + 30 * i).tolist()
            for i in range(6)}
    src = tmp_path / "chunks"
    src.mkdir()
    n_chunks = 3
    for ci in range(n_chunks):
        rows = []
        for d, toks in docs.items():
            per = len(toks) // n_chunks
            lo = ci * per
            hi = (ci + 1) * per if ci < n_chunks - 1 else len(toks)
            rows.append((d, ci, toks[lo:hi]))
        spark.createDataFrame(
            rows, "doc_id string, chunk_idx long, tokens array<long>"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"c{ci}"))

    stream = (
        spark.readStream.schema("doc_id string, chunk_idx long, tokens array<long>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "c*"))
    )
    out = stream_frame_features(stream, CFG)
    q = (
        out.writeStream.format("memory")
        .queryName("stft_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["doc_id"], r["frame_idx"]): (r["rms_energy"], r["mean"], r["std"])
        for r in spark.table("stft_stream").collect()
    }

    batch_in = spark.createDataFrame(
        [(d, t, len(t), "web") for d, t in docs.items()],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    want = {
        (r["doc_id"], r["frame_idx"]): (r["rms_energy"], r["mean"], r["std"])
        for r in frame_features_arrow(batch_in, CFG).collect()
    }
    assert set(got) == set(want)
    assert len(got) > 50
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-12)


def test_stream_pitch_track_equals_batch(spark, tmp_path):
    """Streaming pitch post-processor across micro-batches ==
    the batch pitch_track operator (ProcessAudioStream's persistent
    detector state reproduced in GroupState)."""
    from sonar_spark.operators.temporal import pitch_track
    from sonar_spark.streaming.stateful import stream_pitch_track

    rng = np.random.default_rng(41)
    # per-doc frame detections: lattice pitches (32/tau) with
    # confidences straddling the 0.5 gate, long enough to cross the
    # 20-deep history cap
    docs = {}
    for i in range(5):
        n = 24 + 3 * i
        taus = rng.integers(2, 12, size=n)
        confs = np.round(rng.uniform(0.3, 0.95, size=n), 6)
        docs[f"d{i}"] = [
            (float(round(32.0 / float(t), 6)), float(c))
            for t, c in zip(taus, confs)
        ]
    src = tmp_path / "det"
    src.mkdir()
    n_chunks = 3
    for ci in range(n_chunks):
        rows = []
        for d, det in docs.items():
            per = len(det) // n_chunks
            lo = ci * per
            hi = (ci + 1) * per if ci < n_chunks - 1 else len(det)
            rows += [
                (d, f, p, c) for f, (p, c) in enumerate(det) if lo <= f < hi
            ]
        spark.createDataFrame(
            rows,
            "doc_id string, frame_idx long, pitch double,"
            " confidence double",
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"c{ci}"))

    stream = (
        spark.readStream.schema(
            "doc_id string, frame_idx long, pitch double,"
            " confidence double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "c*"))
    )
    out = stream_pitch_track(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("pitch_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "pckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["doc_id"], r["frame_idx"]): (
            r["pitch_corrected"], r["pitch"], r["f0_multiple"],
            r["salience"], r["stability"],
        )
        for r in spark.table("pitch_stream").collect()
    }

    batch_in = spark.createDataFrame(
        [
            (int(d[1:]), f, p, c)
            for d, det in docs.items()
            for f, (p, c) in enumerate(det)
        ],
        "doc_id long, frame_idx long, pitch double, confidence double",
    )
    want = {
        (f"d{r['doc_id']}", r["frame_idx"]): (
            r["pitch_corrected"], r["pitch"], r["f0_multiple"],
            r["salience"], r["stability"],
        )
        for r in pitch_track(batch_in).collect()
    }
    assert set(got) == set(want)
    assert len(got) == sum(len(v) for v in docs.values())
    for k in want:
        assert got[k] == want[k], k  # bit-identical, same kernel
