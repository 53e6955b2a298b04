"""Multimodal columns: image/audio/video as opaque binary payloads
with typed metadata, processed by Arrow-batched UDFs.

The decode step itself needs codec libraries that are not in this
environment — it is STUBBED two ways (explicitly marked):
- decode="fake": deterministic byte-derived decode (payload bytes
  interpreted as the raw sample/pixel stream) so the Spark-side
  plumbing — schema, partitioning, UDF signature, Arrow batch shape,
  downstream featurization — is real and testable end-to-end;
- decode="real": raises NotImplementedError naming the library that
  a production image (PIL / libsndfile / ffmpeg, the reference's
  transcode/decoder.go:146-174 role) would provide.

Decoded audio streams feed the SAME frame/hop feature kernel as
token sequences (kernels.frame_features_flat) — one engine, two
modalities.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import kernels
from ..config import FrameConfig

MEDIA_SCHEMA = (
    "media_id string, kind string, width int, height int, sample_rate int, "
    "n_bytes int, sha256 string, payload binary"
)


def media_payload(i: int) -> np.ndarray:
    """Deterministic payload bytes for media row i:
    byte[j] = (197 i + 17 j + (j^2 mod 251)) mod 256 — a pure integer
    formula (NOT an opaque RNG) so the DuckDB oracle can reconstruct
    the byte values and value-verify the whole decode->feature
    pipeline, while the payload still exercises a real binary column
    + checksum path."""
    size = 32 * 24 if i % 2 == 0 else 4000
    j = np.arange(size, dtype=np.int64)
    return ((197 * i + 17 * j + (j * j) % 251) % 256).astype(np.uint8)


def synth_media_table(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table: alternating image/audio
    rows with formula-derived binary payloads + integrity checksum
    (see media_payload — SQL-reconstructible by design)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                payload = media_payload(i)
                if i % 2 == 0:
                    w, h, sr = 32, 24, 0
                    kind = "image"
                else:
                    w, h, sr = 0, 0, 8000
                    kind = "audio"
                raw = payload.tobytes()
                rows.append(
                    (f"m{i:06d}", kind, w, h, sr, len(raw),
                     hashlib.sha256(raw).hexdigest(), raw)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "width", "height", "sample_rate",
                         "n_bytes", "sha256", "payload"],
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_bytes(payload: bytes, kind: str, decode: str) -> np.ndarray:
    if decode == "real":
        lib = "PIL/pillow" if kind == "image" else "libsndfile/ffmpeg"
        raise NotImplementedError(
            f"real {kind} decode requires {lib}, not present in this "
            "environment; use decode='fake' for the deterministic stub"
        )
    # fake decode: payload bytes ARE the sample/pixel stream
    return np.frombuffer(payload, dtype=np.uint8).astype(np.int64)


def media_features(
    media: DataFrame,
    *,
    decode: str = "fake",
    frame_cfg: FrameConfig = FrameConfig(window=256, hop=64),
) -> DataFrame:
    """Decode + feature-extract every media row (Arrow-batched).

    - integrity: sha256(payload) must equal the metadata checksum
      (rows failing are emitted with ok=false and null features);
    - image: 16-bin intensity histogram + mean/std (resize stub:
      features over the raw pixel stream);
    - audio: global rms/mean/std over decoded samples PLUS n_frames
      from the shared frame/hop kernel (frame-sample plumbing).

    Output: media_id, kind, ok, n_values, mean, std, rms, n_frames,
    hist array<double>(16)."""
    W, H = frame_cfg.window, frame_cfg.hop
    out_schema = (
        "media_id string, kind string, ok boolean, n_values int, "
        "mean double, std double, rms double, n_frames long, "
        "hist array<double>"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, sha, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["sha256"], pdf["payload"]
            ):
                raw = bytes(payload)
                if hashlib.sha256(raw).hexdigest() != sha:
                    rows.append((mid, kind, False, 0, None, None, None,
                                 None, None))
                    continue
                x = _decode_bytes(raw, kind, decode)
                mean = float(x.mean())
                std = float(x.std())
                rms = float(np.sqrt((x.astype(np.float64) ** 2).mean()))
                hist = np.bincount(x // 16, minlength=16)[:16] / len(x)
                nf = kernels.n_frames(len(x), W, H) if kind == "audio" else 0
                rows.append(
                    (mid, kind, True, int(len(x)), mean, std, rms, nf,
                     hist.tolist())
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "ok", "n_values", "mean", "std",
                         "rms", "n_frames", "hist"],
            )

    return media.select(
        "media_id", "kind", "sha256", "payload"
    ).mapInPandas(gen, schema=out_schema)


def audio_frame_features(
    media: DataFrame,
    *,
    decode: str = "fake",
    frame_cfg: FrameConfig = FrameConfig(window=256, hop=64),
) -> DataFrame:
    """Audio rows -> per-frame windowed features through the SAME flat
    kernel as token sequences (decoded samples are the token stream).
    Output: media_id, frame_idx, rms_energy, mean, std."""
    W, H = frame_cfg.window, frame_cfg.hop
    schema = (
        "media_id string, frame_idx long, rms_energy double, mean double, "
        "std double"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "audio"]
            if pdf.empty:
                continue
            decoded = [
                _decode_bytes(bytes(p), "audio", decode) for p in pdf["payload"]
            ]
            lens = np.array([len(d) for d in decoded], dtype=np.int64)
            flat = (
                np.concatenate(decoded).astype(np.float64)
                if decoded
                else np.empty(0)
            )
            feats, doc_nf = kernels.frame_features_flat(flat, lens, W, H)
            total = int(doc_nf.sum())
            if total == 0:
                continue
            starts = np.concatenate(([0], np.cumsum(doc_nf)[:-1]))
            fidx = np.arange(total, dtype=np.int64) - np.repeat(starts, doc_nf)
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(pdf["media_id"].to_numpy(), doc_nf),
                    "frame_idx": fidx,
                    "rms_energy": feats["rms_energy"],
                    "mean": feats["mean"],
                    "std": feats["std"],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        gen, schema=schema
    )
