"""Frozen config dataclasses mirroring the reference's config surface.

Defaults follow the reference where a token-domain analog exists:
window 2048 / hop 512 (reference fingerprint/fingerprint.go:72-73) is
scaled to W=64 / H=16 for token sequences (same 4:1 overlap ratio);
alignment defaults follow fingerprint/config/config.go:103-117
(maxLag 30s, Sakoe-Chiba band 50, confidence threshold 0.6); the
hybrid DTW-fallback trigger 0.7 follows algorithms/stats/alignment.go:316.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class FrameConfig:
    """Frame/hop sliding-window parameters.

    n_frames = (n - window) // hop + 1 for n >= window else 0 —
    formula of reference fingerprint/analyzers/spectral.go:409.
    """

    window: int = 64
    hop: int = 16
    # synthetic tokens-per-tick clock: frame_ts = frame_idx * hop (long ticks)
    min_tokens: int = 1
    # per-window weighting (Window.Apply, windowing.go:167-186):
    # coefficient type applied to every frame before statistics
    window_type: str = "rectangular"
    kaiser_beta: float = 8.0
    tukey_alpha: float = 0.5


@dataclass(frozen=True)
class FeatureConfig:
    """Which per-frame feature groups to compute (column pruning analog of
    reference fingerprint/config/config.go:22-27 Enable* flags)."""

    enable_energy: bool = True
    enable_moments: bool = True
    enable_percentiles: bool = True
    enable_entropy: bool = True
    enable_zcr: bool = True
    enable_flux: bool = True
    # frequency-domain analog family over the per-frame histogram
    # (centroid/rolloff/bandwidth/flatness/slope/contrast/power)
    enable_spectral: bool = True
    # MFCC analog: mel filterbank -> log -> DCT-II -> liftering over
    # the histogram-as-spectrum (mfcc.go defaults scaled to 16 bins)
    enable_mfcc: bool = True
    # bark-band energies (Traunmueller scale, bark_scale.go) — opt-in
    enable_bark: bool = False
    # music-extractor composite route (extractors/music.go:178-243):
    # adds the per-doc mean-chroma fingerprint columns chroma0..11
    # (calculateMeanChromaVector, comparison.go:691-712) next to the
    # speech stats so compare_topk scores the chroma group
    enable_chroma: bool = False
    entropy_bins: int = 16  # fixed-width histogram bins (Scott-rule analog)


@dataclass(frozen=True)
class AsofConfig:
    """As-of (point-in-time backward) join parameters.

    bucket_width=None (adaptive) sizes buckets from the data so the
    expected rows per (entity, bucket) shard ~ target_rows_per_bucket:
    cogroup-applyInPandas costs milliseconds PER GROUP regardless of
    size, so buckets must be as wide as possible while still splitting
    oversized single-entity timelines across tasks."""

    direction: str = "backward"  # latest right row with ref_ts <= ts
    bucket_width: int | None = 1 << 14  # range-bucket width in ts ticks
    target_rows_per_bucket: int = 65536  # adaptive sizing target
    salt: int = 1  # left-side salt factor for hot entities (right replicated)
    allow_exact_match: bool = True


@dataclass(frozen=True)
class MinHashConfig:
    """MinHash over k-token shingles (compact-hash role sketched at
    reference fingerprint/comparison.go:74,91-106)."""

    k_shingle: int = 4
    num_hashes: int = 64
    bands: int = 16  # LSH bands; rows per band = num_hashes // bands
    seed: int = 42


@dataclass(frozen=True)
class AlignmentConfig:
    """Cross-correlation / DTW alignment (reference
    algorithms/stats/alignment.go, config/config.go:103-117)."""

    max_lag: int = 128  # frames; clamped to min(len)-1 in-kernel
    fft_threshold: int = 1000  # xcorr method switch (stats/correlation.go:140-142)
    dtw_band: int = 50  # Sakoe-Chiba band (stats/dtw.go:115-119)
    hybrid_conf_threshold: float = 0.7  # DTW fallback trigger (alignment.go:316)
    # corr-confidence weights (stats/alignment.go:234-240)
    w_peak: float = 0.55
    w_sharpness: float = 0.22
    w_sidelobe: float = 0.12
    w_snr: float = 0.06


@dataclass(frozen=True)
class ComparisonConfig:
    """Weighted similarity + top-k (reference fingerprint/comparison.go)."""

    similarity_threshold: float = 0.6
    max_candidates: int = 50
    # match-class thresholds (comparison.go:1040-1052)
    thresholds: tuple[float, ...] = (0.95, 0.85, 0.75, 0.6)
    # per-content weight tables (comparison.go:1055-1104), token-domain
    # groups; "mfcc" participates when fingerprints carry the MFCC
    # stats (the reference's speech path weights MFCC highest)
    weights: dict = field(
        default_factory=lambda: {
            "web": {"energy": 0.2, "moments": 0.2, "minhash": 0.3, "mfcc": 0.3},
            "books": {"energy": 0.1, "moments": 0.2, "minhash": 0.4, "mfcc": 0.3},
            "code": {"energy": 0.3, "moments": 0.2, "minhash": 0.3, "mfcc": 0.2},
            "news": {"energy": 0.2, "moments": 0.3, "minhash": 0.2, "mfcc": 0.3},
        }
    )
