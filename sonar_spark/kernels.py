"""Vectorized numpy kernels shared by the pandas/Arrow UDF operators.

These are the hot-path implementations (stride-tricks, batched FFT).
The independent, obviously-correct loop implementations used as golden
oracles live in sonar_spark.oracle — deliberately a separate code path.

Formula provenance (reference, cited file:line):
- frame count (n - W) // H + 1 .... fingerprint/analyzers/spectral.go:409
- RMS energy sqrt(sum(x^2)/W) ..... algorithms/temporal/energy.go:46
- spectral flux sqrt(sum(max(0,d)^2)) algorithms/spectral/spectral_flux.go:17-37
- ZCR sign-change ratio ........... algorithms/spectral/zero_crossing_rate.go:37-77
- moments/skew/kurt ............... algorithms/stats/moments.go:150-260
- Shannon entropy over histogram .. algorithms/stats/entropy.go:515-526
- normalized xcorr + peak ......... algorithms/stats/correlation.go:373-409,526-544
- corr confidence weights ......... algorithms/stats/alignment.go:234-240
- DTW symmetric2 + band ........... algorithms/stats/dtw.go:55-233
- MinHash (compact-hash role) ..... fingerprint/comparison.go:74,91-106
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- frames


def n_frames(n: int, window: int, hop: int) -> int:
    return (n - window) // hop + 1 if n >= window else 0


def frame_view(x: np.ndarray, window: int, hop: int) -> np.ndarray:
    """(num_frames, window) strided view — no copy."""
    nf = n_frames(len(x), window, hop)
    if nf <= 0:
        return np.empty((0, window), dtype=x.dtype)
    return np.lib.stride_tricks.sliding_window_view(x, window)[::hop][:nf]


def frame_features(
    tokens: np.ndarray,
    window: int,
    hop: int,
    entropy_bins: int = 16,
) -> dict[str, np.ndarray]:
    """All per-frame features in one vectorized pass.

    Returns dict of 1-D arrays of length n_frames. Uses float64
    throughout; percentiles use linear interpolation on (n-1)*p
    (Hyndman-Fan R-7 — matches numpy/Spark percentile()/DuckDB
    quantile_cont for cross-engine comparability; the reference's
    default R-6 variant is available in percentile_r6)."""
    f = frame_view(np.asarray(tokens, dtype=np.float64), window, hop)
    nf = f.shape[0]
    if nf == 0:
        return {
            k: np.empty(0)
            for k in (
                "rms_energy mean var std skew kurt min max crest zcr flux "
                "p25 p50 p75 entropy"
            ).split()
        }
    mean = f.mean(axis=1)
    c = f - mean[:, None]
    m2 = (c**2).mean(axis=1)
    m3 = (c**3).mean(axis=1)
    m4 = (c**4).mean(axis=1)
    std = np.sqrt(m2)
    safe = np.where(m2 > 0, m2, 1.0)
    skew = np.where(m2 > 0, m3 / safe**1.5, 0.0)
    kurt = np.where(m2 > 0, m4 / safe**2 - 3.0, 0.0)
    rms = np.sqrt((f**2).mean(axis=1))
    fmin = f.min(axis=1)
    fmax = f.max(axis=1)
    crest = np.where(rms > 0, np.abs(f).max(axis=1) / np.where(rms > 0, rms, 1.0), 0.0)
    # ZCR on mean-centered values (token analog of signal sign changes)
    signs = np.sign(c)
    zcr = (np.abs(np.diff(signs, axis=1)) > 0).sum(axis=1) / (window - 1)
    # flux vs previous frame's window (positive-diff L2); first frame 0
    d = f[1:] - f[:-1]
    flux = np.zeros(nf)
    flux[1:] = np.sqrt((np.maximum(d, 0.0) ** 2).sum(axis=1))
    q = np.quantile(f, [0.25, 0.5, 0.75], axis=1)  # R-7 linear
    # Shannon entropy over fixed-width histogram per frame
    lo, hi = fmin, np.where(fmax > fmin, fmax, fmin + 1.0)
    scaled = (f - lo[:, None]) / (hi - lo)[:, None]
    bins = np.clip((scaled * entropy_bins).astype(np.int64), 0, entropy_bins - 1)
    counts = np.zeros((nf, entropy_bins))
    rows = np.repeat(np.arange(nf), window)
    np.add.at(counts, (rows, bins.ravel()), 1.0)
    p = counts / window
    with np.errstate(divide="ignore", invalid="ignore"):
        ent = -np.where(p > 0, p * np.log2(p), 0.0).sum(axis=1)
    return {
        "rms_energy": rms,
        "mean": mean,
        "var": m2,
        "std": std,
        "skew": skew,
        "kurt": kurt,
        "min": fmin,
        "max": fmax,
        "crest": crest,
        "zcr": zcr,
        "flux": flux,
        "p25": q[0],
        "p50": q[1],
        "p75": q[2],
        "entropy": ent,
    }


def percentile_r6(x: np.ndarray, p: float) -> float:
    """Reference default percentile (Excel / Hyndman-Fan R-6,
    stats/percentiles.go:235-256): h = (n+1)p, linear interp, clamped."""
    s = np.sort(np.asarray(x, dtype=np.float64))
    n = len(s)
    h = (n + 1) * p
    if h <= 1:
        return float(s[0])
    if h >= n:
        return float(s[-1])
    k = int(np.floor(h))
    return float(s[k - 1] + (h - k) * (s[k] - s[k - 1]))


# ---------------------------------------------------------------- minhash

_MERSENNE = (1 << 61) - 1


def _hash_params(num_hashes: int, seed: int):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    return a, b


def shingle_hashes(tokens: np.ndarray, k: int) -> np.ndarray:
    """Distinct polynomial rolling hashes of k-token shingles (int64)."""
    t = np.asarray(tokens, dtype=np.int64)
    if len(t) < k:
        t = np.pad(t, (0, k - len(t)), constant_values=-1)
    base = np.int64(1_000_003)
    h = np.zeros(len(t) - k + 1, dtype=np.int64)
    # vectorized polynomial hash over a sliding window (wrapping int64 ok)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = h * base + t[j : len(t) - k + 1 + j]
    return np.unique(h)


def minhash_signature(
    tokens: np.ndarray, k: int, num_hashes: int, seed: int
) -> np.ndarray:
    """MinHash signature (int64[num_hashes]) over k-shingle set."""
    sh = shingle_hashes(tokens, k)
    a, b = _hash_params(num_hashes, seed)
    # (num_hashes, n_shingles) — careful with memory: chunk shingles
    pos = (sh % _MERSENNE).astype(np.uint64)
    sig = np.full(num_hashes, np.iinfo(np.int64).max, dtype=np.int64)
    step = 8192
    au = a.astype(np.uint64)
    bu = b.astype(np.uint64)
    for i in range(0, len(pos), step):
        chunk = pos[i : i + step]
        hv = (au[:, None] * chunk[None, :] + bu[:, None]) % np.uint64(_MERSENNE)
        sig = np.minimum(sig, hv.min(axis=1).astype(np.int64))
    return sig


# ---------------------------------------------------------------- xcorr


def _znorm(x: np.ndarray) -> np.ndarray:
    """z-normalize (stats/correlation.go:464-501)."""
    s = x.std()
    return (x - x.mean()) / s if s > 0 else x - x.mean()


def xcorr_normalized(a: np.ndarray, b: np.ndarray, max_lag: int,
                     fft_threshold: int = 1000) -> tuple[np.ndarray, np.ndarray]:
    """Normalized cross-correlation over lags [-L, L] (clamped).

    corr[lag] = mean(za[t] * zb[t+lag]) over the overlap region, with
    z-normalized inputs — the zero-normalized CC of
    stats/correlation.go:373-418. Method auto-switches to FFT above
    fft_threshold samples (stats/correlation.go:140-142).
    Returns (lags, corr)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    L = int(min(max_lag, len(a) - 1, len(b) - 1))
    L = max(L, 0)
    lags = np.arange(-L, L + 1)
    za, zb = _znorm(a), _znorm(b)
    if max(len(a), len(b)) > fft_threshold:
        n = len(za) + len(zb) - 1
        nfft = 1 << int(np.ceil(np.log2(max(n, 1))))
        fa = np.fft.rfft(za, nfft)
        fb = np.fft.rfft(zb, nfft)
        full = np.fft.irfft(fa * np.conj(fb), nfft)
        # full[k] = sum za[t] * zb[t-k] (k>=0); negative k wraps
        corr = np.empty(len(lags))
        for i, lag in enumerate(lags):
            # sum za[t] zb[t+lag] = full[-lag mod nfft]
            s = full[(-lag) % nfft]
            ov = min(len(a), len(b) - lag) - max(0, -lag)
            corr[i] = s / ov if ov > 0 else 0.0
    else:
        corr = np.empty(len(lags))
        for i, lag in enumerate(lags):
            if lag >= 0:
                x, y = za[: len(za) - 0], zb[lag:]
            else:
                x, y = za[-lag:], zb[: len(zb)]
            m = min(len(x), len(y))
            corr[i] = (x[:m] * y[:m]).mean() if m > 0 else 0.0
    return lags, corr


def xcorr_peak_metrics(lags: np.ndarray, corr: np.ndarray) -> dict[str, float]:
    """Peak lag + quality metrics (stats/correlation.go:526-661)."""
    if len(corr) == 0:
        return {"lag": 0.0, "peak": 0.0, "sharpness": 0.0, "sidelobe": 0.0,
                "snr": 0.0, "second_peak": 0.0}
    i = int(np.argmax(np.abs(corr)))
    peak = float(abs(corr[i]))
    # sharpness: |second derivative| at peak
    if 0 < i < len(corr) - 1:
        sharp = float(abs(corr[i - 1] - 2 * corr[i] + corr[i + 1]))
    else:
        sharp = 0.0
    # second peak (exclude +-2 around main)
    mask = np.ones(len(corr), bool)
    mask[max(0, i - 2) : i + 3] = False
    second = float(np.abs(corr[mask]).max()) if mask.any() else 0.0
    sidelobe = peak / second if second > 0 else peak / 1e-9
    noise = float(np.abs(corr[mask]).mean()) if mask.any() else 1e-9
    snr = peak / noise if noise > 0 else 0.0
    return {"lag": float(lags[i]), "peak": peak, "sharpness": sharp,
            "sidelobe": min(sidelobe, 100.0), "snr": min(snr, 100.0),
            "second_peak": second}


def xcorr_confidence(m: dict[str, float], w=(0.55, 0.22, 0.12, 0.06)) -> float:
    """Weighted confidence (stats/alignment.go:183-243 weights
    0.55 peak + 0.22 sharpness + 0.12 sidelobe + 0.06 SNR), squashed
    to [0,1]."""
    conf = (
        w[0] * min(m["peak"], 1.0)
        + w[1] * min(m["sharpness"] * 10.0, 1.0)
        + w[2] * min(m["sidelobe"] / 10.0, 1.0)
        + w[3] * min(m["snr"] / 20.0, 1.0)
    )
    return float(min(max(conf, 0.0), 1.0))


# ---------------------------------------------------------------- DTW


def dtw_align(a: np.ndarray, b: np.ndarray, band: int = 50) -> dict[str, float]:
    """Band-constrained DTW, symmetric2 steps (stats/dtw.go:55-233).

    Returns path-normalized distance, mean path displacement (offset,
    stats/alignment.go:530-541) and an exp-decay confidence
    (stats/alignment.go:420-452 simplified)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    q, r = len(a), len(b)
    if q == 0 or r == 0:
        return {"dist": np.inf, "offset": 0.0, "confidence": 0.0, "path_len": 0.0}
    band = max(band, abs(q - r) + 1)
    INF = np.inf
    D = np.full((q + 1, r + 1), INF)
    D[0, 0] = 0.0
    for i in range(1, q + 1):
        jlo = max(1, i - band)
        jhi = min(r, i + band)
        ai = a[i - 1]
        cost = np.abs(ai - b[jlo - 1 : jhi])
        row_prev = D[i - 1]
        row = D[i]
        for idx, j in enumerate(range(jlo, jhi + 1)):
            c = cost[idx]
            # symmetric2: diagonal counts double
            best = min(row_prev[j] + c, row[j - 1] + c, row_prev[j - 1] + 2 * c)
            row[j] = best
    # backtrack
    i, j = q, r
    disp = []
    steps = 0
    while i > 0 and j > 0:
        disp.append(j - i)
        steps += 1
        choices = (D[i - 1, j - 1], D[i - 1, j], D[i, j - 1])
        k = int(np.argmin(choices))
        if k == 0:
            i, j = i - 1, j - 1
        elif k == 1:
            i -= 1
        else:
            j -= 1
    dist = float(D[q, r] / (q + r))
    offset = float(np.mean(disp)) if disp else 0.0
    conf = float(np.exp(-dist))
    return {"dist": dist, "offset": offset, "confidence": conf,
            "path_len": float(steps)}
