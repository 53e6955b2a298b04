"""Stateful streaming frame featurizer — the STFTStreamer analog
(reference fingerprint/analyzers/spectral.go:313-374: consume chunks,
hold a carry-over buffer, emit complete frames, advance by hop).

Tokens for one doc arrive in ordered chunks across micro-batches;
per-doc GroupState holds (tail tokens not yet fully framed, next
frame index). Each micro-batch concatenates carry-over + new chunks,
emits every COMPLETE frame's features, and keeps the remainder:
exactly the reference's buffer semantics — incomplete frames are
never emitted, and the emitted stream is identical to running the
batch featurizer over the concatenated tokens (tested).

Assumes in-order chunk arrival per doc (chunks are sorted by
chunk_idx WITHIN a micro-batch; across micro-batches arrival order is
trusted) — the same assumption the reference makes (SURVEY §2.16:
no late-data handling in STFTStreamer). Out-of-order tolerance would
add a chunk_idx watermark + reorder buffer in state.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .. import kernels
from ..config import FrameConfig

OUT_SCHEMA = (
    "doc_id string, frame_idx long, rms_energy double, mean double, "
    "std double"
)
STATE_SCHEMA = "tail array<long>, next_frame long"


def stream_frame_features(
    chunks: DataFrame,
    frame_cfg: FrameConfig = FrameConfig(),
) -> DataFrame:
    """chunks: streaming df (doc_id string, chunk_idx long,
    tokens array<int> or array<long>) -> per-frame features as frames
    complete. Frame i covers token positions [i*hop, i*hop + window)
    of the doc's concatenated stream ((n-W)/H+1 formula, emitted
    incrementally)."""
    W, H = frame_cfg.window, frame_cfg.hop

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        if state.exists:
            tail, next_frame = state.get
            buf = np.asarray(tail, dtype=np.int64)
        else:
            buf, next_frame = np.empty(0, dtype=np.int64), 0
        parts = [buf]
        for pdf in pdfs:
            for _, row in pdf.sort_values("chunk_idx").iterrows():
                parts.append(np.asarray(row["tokens"], dtype=np.int64))
        x = np.concatenate(parts)
        nf = kernels.n_frames(len(x), W, H)
        if nf > 0:
            feats, _ = kernels.frame_features_flat(
                x.astype(np.float64),
                np.array([len(x)]),
                W,
                H,
                keys=("rms_energy", "mean", "std"),
            )
            out = pd.DataFrame(
                {
                    "doc_id": doc_id,
                    "frame_idx": next_frame + np.arange(nf, dtype=np.int64),
                    "rms_energy": feats["rms_energy"],
                    "mean": feats["mean"],
                    "std": feats["std"],
                }
            )
            # advance by hop: frames emitted start at 0..nf-1; the next
            # frame starts at position nf*H of the current buffer
            x = x[nf * H :]
            next_frame += nf
            state.update((x.tolist(), next_frame))
            yield out
        else:
            state.update((x.tolist(), next_frame))

    return (
        chunks.groupBy("doc_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


PITCH_OUT_SCHEMA = (
    "doc_id string, frame_idx long, pitch_corrected double, "
    "pitch double, f0_multiple double, salience double, "
    "stability double"
)
PITCH_STATE_SCHEMA = "hist array<double>, prev double"


def stream_pitch_track(detections: DataFrame) -> DataFrame:
    """Stateful streaming pitch post-processor — the literal
    ProcessAudioStream analog (pitch_detection.go:1016-1029: one
    PitchDetector instance accumulates pitchHistory/previousPitch
    across frames of a stream).  Per-doc GroupState holds exactly
    that pair (history list + previous smoothed pitch); frames
    arriving across micro-batches are tracked identically to the
    batch operator `operators.temporal.pitch_track` (tested
    equivalence).

    detections: streaming df (doc_id string, frame_idx long,
    pitch double, confidence double), in-order arrival per doc
    (frames sorted within a micro-batch; cross-batch order trusted —
    the same assumption as stream_frame_features)."""
    from ..operators.temporal import PitchTracker

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        tr = PitchTracker()
        if state.exists:
            hist, prev = state.get
            tr.hist = list(hist)
            tr.prev_smoothed = prev
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("frame_idx")
            for f, p, c in zip(
                pdf["frame_idx"], pdf["pitch"], pdf["confidence"]
            ):
                pc, sm, f0m, sal, st = tr.step(float(p), float(c))
                rows.append((doc_id, int(f), pc, sm, f0m, sal, st))
        state.update((list(tr.hist), tr.prev_smoothed))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "pitch_corrected", "pitch",
                    "f0_multiple", "salience", "stability",
                ],
            )

    return detections.groupBy("doc_id").applyInPandasWithState(
        fn,
        outputStructType=PITCH_OUT_SCHEMA,
        stateStructType=PITCH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
