"""Per-frame windowed feature extraction — the backfilled per-window
statistics of the north rule.

Two equivalent implementations, cross-checked in tests:

- frame_features_arrow: mapInPandas over the *token table* directly —
  one Arrow batch in, vectorized numpy (stride-tricks) per doc, frame
  rows out. Zero shuffle, never materializes window arrays. This is
  the 10^12-scale path.
- frame_features_builtin: pure Catalyst expressions (higher-order
  array functions + one window function for flux) over expand_frames
  output. Whole-stage-codegen friendly; slower per value but useful as
  an independent in-Spark implementation and for ad-hoc SQL.

Feature formulas cited in sonar_spark.kernels docstring.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import FeatureConfig, FrameConfig
from .. import kernels
from .frames import expand_frames

SPECTRAL_COLS = [
    "centroid", "rolloff", "bandwidth", "flatness", "flatness_db",
    "slope", "contrast", "power", "log_power",
]

MFCC_COLS = list(kernels._MFCC_KEYS)

# bark band energies are opt-in (enable_bark=False by default), so
# they live outside FEATURE_COLS (the default output contract)
BARK_COLS = list(kernels._BARK_KEYS)

FEATURE_COLS = [
    "rms_energy", "mean", "var", "std", "skew", "kurt", "min", "max",
    "crest", "zcr", "flux", "p25", "p50", "p75", "entropy",
] + SPECTRAL_COLS + MFCC_COLS

ALL_COLS = FEATURE_COLS + BARK_COLS

# Enable* flag -> feature columns (config-driven pruning, the
# reference's FeatureConfig semantics, fingerprint/config/config.go:22-27)
_FLAG_GROUPS = {
    "enable_energy": ["rms_energy", "crest"],
    "enable_moments": ["mean", "var", "std", "skew", "kurt", "min", "max"],
    "enable_percentiles": ["p25", "p50", "p75"],
    "enable_entropy": ["entropy"],
    "enable_zcr": ["zcr"],
    "enable_flux": ["flux"],
    "enable_spectral": SPECTRAL_COLS,
    "enable_mfcc": MFCC_COLS,
    "enable_bark": BARK_COLS,
}


def feature_cols(feat_cfg: FeatureConfig) -> list[str]:
    """Ordered feature subset selected by the Enable* flags."""
    enabled: set[str] = set()
    for flag, cols in _FLAG_GROUPS.items():
        if getattr(feat_cfg, flag, False):
            enabled.update(cols)
    return [c for c in ALL_COLS if c in enabled]


def _arrow_schema(cols: list[str]) -> str:
    return (
        "doc_id string, source string, n_tok int, frame_idx long, "
        "frame_ts long, " + ", ".join(f"{c} double" for c in cols)
    )


def frame_features_arrow(
    df: DataFrame,
    frame_cfg: FrameConfig = FrameConfig(),
    feat_cfg: FeatureConfig = FeatureConfig(),
) -> DataFrame:
    """Token table -> per-frame feature rows, one vectorized pass.

    Narrow (mapInArrow): each doc's frames are produced where the doc
    row lives; no shuffle, no window-array materialization, no
    per-row Python objects — the Arrow ListArray's contiguous values
    buffer feeds the flat kernel directly, and per-doc fan-out of the
    key columns is an Arrow take() (SURVEY §4.3 vectorization
    discipline)."""
    W, H, bins = frame_cfg.window, frame_cfg.hop, feat_cfg.entropy_bins
    cols = feature_cols(feat_cfg)
    keys = tuple(cols)
    if frame_cfg.window_type != "rectangular":
        from ..functions.windows import window_coefficients

        wcoef = window_coefficients(
            frame_cfg.window_type, W,
            beta=frame_cfg.kaiser_beta, alpha=frame_cfg.tukey_alpha,
        )
    else:
        wcoef = None

    def gen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        scratch = kernels._scratch
        for batch in batches:
            tok = batch.column(batch.schema.get_field_index("tokens"))
            lens = pc.list_value_length(tok).to_numpy().astype(np.int64)
            vals = tok.flatten().to_numpy(zero_copy_only=False)
            flat = scratch.get("flat_tok", (len(vals),))
            np.copyto(flat, vals)
            feats, doc_nf = kernels.frame_features_flat(
                flat, lens, W, H, bins, scratch=scratch, keys=keys,
                weights=wcoef,
            )
            total = int(doc_nf.sum())
            if total == 0:
                continue
            take_idx = pa.array(np.repeat(np.arange(len(lens)), doc_nf))
            starts = np.concatenate(([0], np.cumsum(doc_nf)[:-1]))
            frame_idx = np.arange(total, dtype=np.int64) - np.repeat(
                starts, doc_nf
            )
            out = {
                "doc_id": pc.take(
                    batch.column(batch.schema.get_field_index("doc_id")), take_idx
                ),
                "source": pc.take(
                    batch.column(batch.schema.get_field_index("source")), take_idx
                ),
                "n_tok": pc.take(
                    batch.column(batch.schema.get_field_index("n_tok")), take_idx
                ),
                "frame_idx": pa.array(frame_idx),
                "frame_ts": pa.array(frame_idx * H),
            }
            for c in cols:
                out[c] = pa.array(feats[c], type=pa.float64())
            names = list(out)
            yield pa.RecordBatch.from_arrays([out[n] for n in names], names=names)

    out_cols = ["doc_id", "source", "n_tok", "frame_idx", "frame_ts"] + cols
    return (
        df.select("doc_id", "tokens", "n_tok", "source")
        .mapInArrow(gen, schema=_arrow_schema(cols))
        .select(*out_cols)
    )


def _pct_expr(sorted_col, window: int, p: float):
    """R-7 linear-interp percentile of a sorted fixed-length array as a
    pure expression (window length is a plan-time constant)."""
    h = (window - 1) * p
    k = int(np.floor(h))
    frac = h - k
    lo = F.element_at(sorted_col, k + 1).cast("double")
    if frac == 0.0:
        return lo
    hi = F.element_at(sorted_col, k + 2).cast("double")
    return lo + F.lit(frac) * (hi - lo)


def frame_features_builtin(
    df: DataFrame,
    frame_cfg: FrameConfig = FrameConfig(),
    feat_cfg: FeatureConfig = FeatureConfig(),
) -> DataFrame:
    """Catalyst-expression implementation over expand_frames output.

    Computes rms/mean/var/std/skew/kurt/min/max/crest/zcr/p25/p50/p75
    with higher-order functions (JVM-side) and flux with one lag()
    window function (the only shuffle)."""
    W = frame_cfg.window
    frames = expand_frames(df, frame_cfg)
    dbl = F.transform(F.col("window"), lambda x: x.cast("double"))
    frames = frames.withColumn("w", dbl)

    def asum(col):
        return F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x)

    frames = frames.withColumn("mean", asum(F.col("w")) / W)
    c = F.transform(F.col("w"), lambda x: x - F.col("mean"))
    frames = frames.withColumn("cen", c)
    m2 = asum(F.transform(F.col("cen"), lambda x: x * x)) / W
    m3 = asum(F.transform(F.col("cen"), lambda x: x * x * x)) / W
    m4 = asum(F.transform(F.col("cen"), lambda x: x * x * x * x)) / W
    frames = (
        frames.withColumn("var", m2)
        .withColumn("std", F.sqrt(F.col("var")))
        .withColumn(
            "skew",
            F.when(F.col("var") > 0, m3 / F.pow(F.col("var"), 1.5)).otherwise(0.0),
        )
        .withColumn(
            "kurt",
            F.when(F.col("var") > 0, m4 / F.pow(F.col("var"), 2.0) - 3.0).otherwise(
                0.0
            ),
        )
        .withColumn(
            "rms_energy",
            F.sqrt(asum(F.transform(F.col("w"), lambda x: x * x)) / W),
        )
        .withColumn("min", F.array_min("w"))
        .withColumn("max", F.array_max("w"))
        .withColumn(
            "crest",
            F.when(
                F.col("rms_energy") > 0,
                F.array_max(F.transform(F.col("w"), F.abs)) / F.col("rms_energy"),
            ).otherwise(0.0),
        )
    )
    # ZCR: sign changes of centered values (oracle semantics:
    # (a>0)!=(b>0) or (a<0)!=(b<0))
    sgn_a = F.slice(F.col("cen"), 1, W - 1)
    sgn_b = F.slice(F.col("cen"), 2, W - 1)
    changes = F.zip_with(
        sgn_a,
        sgn_b,
        lambda a, b: (
            ((a > 0) != (b > 0)) | ((a < 0) != (b < 0))
        ).cast("double"),
    )
    frames = frames.withColumn("zcr", asum(changes) / (W - 1))
    srt = F.array_sort("w")
    frames = (
        frames.withColumn("p25", _pct_expr(srt, W, 0.25))
        .withColumn("p50", _pct_expr(srt, W, 0.50))
        .withColumn("p75", _pct_expr(srt, W, 0.75))
    )
    # flux vs previous frame window (one shuffle: partitionBy doc_id)
    win = Window.partitionBy("doc_id").orderBy("frame_idx")
    prev = F.lag("w").over(win)
    flux = F.when(prev.isNull(), F.lit(0.0)).otherwise(
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("w"), prev, lambda a, b: F.pow(F.greatest(a - b, F.lit(0.0)), 2)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    )
    frames = frames.withColumn("flux", flux)
    # the builtin cross-check covers the time-domain family; the
    # histogram-spectrum features live in the Arrow kernel (their
    # independent implementations are oracle.spectral_golden and the
    # frame_spectral DuckDB oracle)
    keep = ["doc_id", "source", "n_tok", "frame_idx", "frame_ts"] + [
        col for col in FEATURE_COLS
        if col != "entropy"
        and col not in SPECTRAL_COLS
        and col not in MFCC_COLS
    ]
    return frames.select(*keep)


def chroma_doc_stats(
    hpcp: DataFrame,
    *,
    key: str = "doc_id",
    pc_col: str = "pitch_class",
    val_col: str = "hpcp",
) -> DataFrame:
    """Per-doc mean chroma vector as 12 fingerprint columns
    chroma0..chroma11 — the music-extractor composite's chroma
    feature group (extractors/music.go:327-376 per-frame chroma ->
    fingerprint/comparison.go:691-712 calculateMeanChromaVector; the
    compare side takes the cosine of these mean vectors,
    :673-688).  Values are 6-dp rounded (quantized fingerprint
    interface).  One aggregation: mean per (doc, class) then a
    12-way max(when) fold — no pivot shuffle."""
    m = hpcp.groupBy(key, pc_col).agg(
        F.round(F.avg(val_col), 6).alias("__mv")
    )
    return m.groupBy(key).agg(
        *[
            F.max(
                F.when(F.col(pc_col) == i, F.col("__mv"))
            ).alias(f"chroma{i}")
            for i in range(12)
        ]
    )


def doc_stats(features: DataFrame) -> DataFrame:
    """Per-doc (mean,std) summary of each frame feature — the stats
    fingerprint mirroring extractMFCCStatistics (reference
    fingerprint/comparison.go:774-800). Pure groupBy aggregates
    (map-side partial agg; one shuffle on doc_id)."""
    aggs = []
    for c in FEATURE_COLS:
        if c in features.columns:
            aggs.append(F.avg(c).alias(f"{c}_mean"))
            aggs.append(F.stddev_pop(c).alias(f"{c}_std"))
    return features.groupBy("doc_id", "source").agg(
        F.count("*").alias("n_frames"), *aggs
    )
