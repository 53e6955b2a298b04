"""Pairwise temporal alignment: normalized cross-correlation with
FFT auto-switch, peak/quality metrics, confidence scoring, and the
hybrid corr->DTW two-phase (SURVEY §2.6/§3.2; reference
algorithms/stats/alignment.go:60-341, correlation.go:131-449,
dtw.go:55-233).

Plan shape (the reference's hybrid heuristic as orchestration,
alignment.go:308-337): phase 1 runs cheap cross-correlation on every
pair; phase 2 re-runs only low-confidence pairs (conf <= threshold)
through band-constrained DTW and blends. Selective recompute = a
filter + second mapInPandas + union — no custom Catalyst rule.

Input representation: one row per pair with both series materialized
as array<double> (built by build_doc_series + a join). Per-pair
kernels are inherently sequential; each pair is one numpy call inside
an Arrow batch (no per-element Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import kernels
from ..config import AlignmentConfig

_ALIGN_SCHEMA = (
    "pair_id string, lag double, peak double, sharpness double, "
    "sidelobe double, snr double, second_peak double, confidence double, "
    "method string, dtw_dist double, dtw_offset double, offset double, "
    "time_stretch double"
)

_ALIGN_COLS = ["pair_id", "lag", "peak", "sharpness", "sidelobe", "snr",
               "second_peak", "confidence", "method", "dtw_dist",
               "dtw_offset", "offset", "time_stretch"]


def build_doc_series(
    feats: DataFrame,
    signal: str = "rms_energy",
    key: str = "doc_id",
    order: str = "frame_idx",
) -> DataFrame:
    """Per-doc ordered feature series: (key, series array<double>).
    One shuffle (groupBy key); ordering via sort_array over
    (order, value) structs — deterministic under any partitioning."""
    return feats.groupBy(key).agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col(order).alias("o"), F.col(signal).alias("v")))
            ),
            lambda s: s["v"],
        ).alias("series")
    )


def align_pairs(
    pairs: DataFrame,
    cfg: AlignmentConfig = AlignmentConfig(),
    *,
    pair_id: str = "pair_id",
    a: str = "series_a",
    b: str = "series_b",
) -> DataFrame:
    """Align every (series_a, series_b) pair.

    Phase 1: normalized xcorr (FFT above cfg.fft_threshold), peak lag
    + quality metrics + weighted confidence (0.55/0.22/0.12/0.06,
    alignment.go:234-240). Phase 2: rows with confidence <=
    cfg.hybrid_conf_threshold re-scored with Sakoe-Chiba DTW
    (symmetric2); blended confidence 0.6*corr + 0.4*dtw and offset
    from the DTW path mean displacement (alignment.go:308-337,
    530-541). Output one row per pair."""

    def phase1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pid, sa, sb in zip(pdf[pair_id], pdf[a], pdf[b]):
                sa = np.asarray(sa, dtype=np.float64)
                sb = np.asarray(sb, dtype=np.float64)
                lags, corr = kernels.xcorr_normalized(
                    sa, sb, cfg.max_lag, cfg.fft_threshold
                )
                m = kernels.xcorr_peak_metrics(lags, corr)
                conf = kernels.xcorr_confidence(
                    m, (cfg.w_peak, cfg.w_sharpness, cfg.w_sidelobe, cfg.w_snr)
                )
                # time-stretch estimate: length ratio only in the
                # xcorr phase (extractors/alignment.go:448-476)
                ratio = len(sb) / len(sa) if len(sa) else 1.0
                rows.append(
                    (pid, m["lag"], m["peak"], m["sharpness"], m["sidelobe"],
                     m["snr"], m["second_peak"], conf, "xcorr", None, None,
                     m["lag"], ratio)
                )
            yield pd.DataFrame(rows, columns=_ALIGN_COLS)

    def phase2(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pid, lag, peak, sharp, side, snr, second, p1conf, sa, sb in zip(
                pdf["pair_id"], pdf["lag"], pdf["peak"], pdf["sharpness"],
                pdf["sidelobe"], pdf["snr"], pdf["second_peak"],
                pdf["confidence"], pdf["series_a"], pdf["series_b"],
            ):
                sa = np.asarray(sa, dtype=np.float64)
                sb = np.asarray(sb, dtype=np.float64)
                d = kernels.dtw_align(sa, sb, cfg.dtw_band)
                conf = 0.6 * p1conf + 0.4 * d["confidence"]
                off = 0.6 * lag + 0.4 * d["offset"]
                ratio = len(sb) / len(sa) if len(sa) else 1.0
                # 0.7 length-ratio + 0.3 DTW path slope blend
                # (extractors/alignment.go:448-476)
                stretch = 0.7 * ratio + 0.3 * d["slope"]
                rows.append(
                    (pid, lag, peak, sharp, side, snr, second, conf,
                     "hybrid", d["dist"], d["offset"], off, stretch)
                )
            yield pd.DataFrame(rows, columns=_ALIGN_COLS)

    inp = pairs.select(
        F.col(pair_id).alias("pair_id"),
        F.col(a).alias("series_a"),
        F.col(b).alias("series_b"),
    )
    p1 = inp.mapInPandas(phase1, schema=_ALIGN_SCHEMA)
    return _hybrid_phase2(inp, p1, phase2, cfg)


def _hybrid_phase2(inp, p1, phase2, cfg):
    # selective recompute: join the low-confidence subset back to its
    # input series, run DTW, union with the confident subset
    low = p1.where(F.col("confidence") <= cfg.hybrid_conf_threshold)
    high = p1.where(F.col("confidence") > cfg.hybrid_conf_threshold)
    low_inp = low.join(inp, "pair_id")
    p2 = low_inp.mapInPandas(phase2, schema=_ALIGN_SCHEMA)
    return high.unionByName(p2)


def consistency_trials(
    pairs: DataFrame,
    cfg: AlignmentConfig = AlignmentConfig(),
    *,
    n_trials: int = 3,
    perturb: float = 0.01,
) -> DataFrame:
    """Alignment consistency check (reference stats/alignment.go:
    710-801): re-align each pair n_trials times with a deterministic
    sin-based ~1% perturbation of series_b (:737-749), then aggregate
    offset statistics. Embarrassingly parallel: rows replicated with a
    trial_id column, one align_pairs pass, one groupBy.

    Output: pair_id, n_trials, offset_mean, offset_std, offset_range,
    consistency (1 - range/max_lag, clamped to [0,1])."""
    t = pairs.withColumn(
        "__trial", F.explode(F.sequence(F.lit(0), F.lit(n_trials - 1)))
    )
    perturbed = t.withColumn(
        "series_b",
        F.zip_with(
            "series_b",
            F.sequence(F.lit(0), F.size("series_b") - 1),
            lambda v, i: v
            * (
                1.0
                + perturb
                * F.sin(F.col("__trial") * F.lit(7.0) + i.cast("double"))
            ),
        ),
    ).withColumn(
        "pair_id", F.concat(F.col("pair_id"), F.lit("#"), F.col("__trial"))
    )
    aligned = align_pairs(perturbed, cfg)
    base = F.split(F.col("pair_id"), "#").getItem(0)
    agg = aligned.groupBy(base.alias("pair_id")).agg(
        F.count("*").alias("n_trials"),
        F.avg("offset").alias("offset_mean"),
        F.coalesce(F.stddev_pop("offset"), F.lit(0.0)).alias("offset_std"),
        (F.max("offset") - F.min("offset")).alias("offset_range"),
    )
    return agg.withColumn(
        "consistency",
        F.greatest(
            F.lit(0.0),
            F.lit(1.0) - F.col("offset_range") / F.lit(float(cfg.max_lag)),
        ),
    )
