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


BACKFILL_OUT_SCHEMA = (
    "user_id long, grid_ts long, ffill_value double, "
    "ffill_age_s long, n_obs long"
)
BACKFILL_STATE_SCHEMA = (
    "last_t long, last_v double, last_eid long, "
    "next_g long, cell_obs long"
)


def stream_backfill(events: DataFrame, step: int = 21600) -> DataFrame:
    """Streaming CAUSAL grid backfill — the ffill half of
    operators/backfill.backfill_grid as an incremental stateful
    operator (the look-ahead bfill half is inherently offline and
    stays batch-only).

    Per-entity GroupState holds exactly (latest obs (t, v, eid),
    the next grid instant to emit, the running cell count) — O(1)
    state per entity, NOT an accumulate-then-replay buffer.  A grid
    row (grid_ts, ffill, age, n_obs) is emitted as soon as an
    observation past it proves it final; input chunks must arrive
    time-ordered (the harness splits by event-time range), so every
    emitted fill is causally valid — zero temporal leakage by
    construction, streaming edition.

    End-of-stream: rows with event_id < 0 are per-entity sentinels
    (injected by the bounded-replay harness into the LAST chunk);
    they flush the trailing grid instants up to the step-aligned
    ceiling of the entity's last observation — production would use
    an event-time timeout instead, same flush code path.

    Tie rules match the batch operator: an observation AT the grid
    instant is included in its fill; among duplicate timestamps the
    highest event_id wins.
    """

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.exists:
            last_t, last_v, last_eid, next_g, cell_obs = state.get
        else:
            last_t, last_v, last_eid, next_g, cell_obs = (
                None, None, None, None, 0,
            )
        out_rows = []
        flush = False
        last_seen_t = last_t

        def emit_grid(g):
            if last_t is None:
                out_rows.append((user_id, g, None, None, cell_obs))
            else:
                out_rows.append(
                    (user_id, g, last_v, g - last_t, cell_obs)
                )

        rows = []
        for pdf in pdfs:
            for t, v, eid in zip(
                pdf["t"].to_numpy(),
                pdf["v"].to_numpy(),
                pdf["eid"].to_numpy(),
            ):
                rows.append((int(t), float(v), int(eid)))
        rows.sort(key=lambda r: (r[0], r[2]))
        for t, v, eid in rows:
            if eid < 0:
                flush = True
                continue
            if next_g is None:
                next_g = (t // step) * step
            while next_g < t:
                emit_grid(next_g)
                next_g += step
                cell_obs = 0
            if last_t is None or (t, eid) >= (last_t, last_eid):
                last_t, last_v, last_eid = t, v, eid
            last_seen_t = t if last_seen_t is None else max(last_seen_t, t)
            cell_obs += 1
        if flush and last_seen_t is not None and next_g is not None:
            g_up = (
                last_seen_t
                if last_seen_t % step == 0
                else last_seen_t - last_seen_t % step + step
            )
            while next_g <= g_up:
                emit_grid(next_g)
                next_g += step
                cell_obs = 0
            state.remove()
        else:
            state.update(
                (last_t, last_v, last_eid, next_g, cell_obs)
            )
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "user_id", "grid_ts", "ffill_value",
                    "ffill_age_s", "n_obs",
                ],
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=BACKFILL_OUT_SCHEMA,
        stateStructType=BACKFILL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ASOF_OUT_SCHEMA = (
    "event_id long, user_id long, ts_sec long, "
    "matched_ref_ts long, ref_version long, ref_value double"
)
ASOF_STATE_SCHEMA = "ref_ts long, ref_ver long, ref_val double"


def stream_asof(tagged: DataFrame) -> DataFrame:
    """Streaming point-in-time join — the as-of core as an
    incremental stateful operator: a tagged union stream
    (user_id long, t long, side int [0 = reference, 1 = query],
    eid long, v double) arrives in TIME-ORDERED micro-batches;
    per-entity GroupState holds exactly the LATEST reference row
    (ts, version, value) — O(1) state, the running-last window of
    the batch union strategy (operators/asof._asof_union) turned
    into a state machine.

    Each query row emits immediately with the current state: the
    match is causally final the moment the row arrives (reference
    rows at the same timestamp sort FIRST, so equal-ts matches are
    inclusive, and among equal-ts references the highest eid wins —
    the batch tie rules exactly).  Zero temporal leakage by
    construction: state can only contain references with
    ref_ts <= the query's ts.
    """

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.exists:
            ref_ts, ref_ver, ref_val = state.get
        else:
            ref_ts, ref_ver, ref_val = None, None, None
        rows = []
        for pdf in pdfs:
            for t, side, eid, v in zip(
                pdf["t"].to_numpy(),
                pdf["side"].to_numpy(),
                pdf["eid"].to_numpy(),
                pdf["v"].to_numpy(),
            ):
                rows.append((int(t), int(side), int(eid), float(v)))
        rows.sort(key=lambda r: (r[0], r[1], r[2]))
        out = []
        for t, side, eid, v in rows:
            if side == 0:
                ref_ts, ref_ver, ref_val = t, eid, v
            else:
                out.append(
                    (eid, user_id, t, ref_ts, ref_ver, ref_val)
                )
        state.update((ref_ts, ref_ver, ref_val))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "event_id", "user_id", "ts_sec",
                    "matched_ref_ts", "ref_version", "ref_value",
                ],
            )

    return tagged.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=ASOF_OUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
