"""Linear predictive coding, order 4, as pure column expressions —
the Levinson-Durbin recursion of speech/lpc.go:83-135 unrolled
(fixed order => fixed-depth recursion => closed-form expressions; no
UDF, no per-sample Python):

- autocorrelation lags R[0..4] = sum x[i] x[i+m] from ONE positional
  self-join with conditional aggregation (raw biased sums, positive
  semidefinite, so the prediction-error energy stays nonnegative);
- k[i] = (R[i] - sum_j a_j R[i-j]) / E, coefficient updates
  a_j -= k a_{i-j}, E *= (1 - k^2) (lpc.go:104-130), with the
  reference's zero-energy guard expressed as CASE (k = 0 and E = 0
  propagate once E hits 0);
- gain = sqrt(E_4) (lpc.go:133).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lpc4(
    vals: DataFrame,
    *,
    key: str = "doc_id",
    pos: str = "pos",
    val: str = "v",
) -> DataFrame:
    """Output per key: r0, k1..k4, a1..a4 (final LPC coefficients),
    gain. Keys with fewer than 8 samples (the reference's order*2
    minimum, lpc.go:45-47) or zero energy are excluded."""
    a = vals.select(key, F.col(pos).alias("__pa"), F.col(val).alias("__va"))
    b = vals.select(
        F.col(key).alias("__kb"),
        F.col(pos).alias("__pb"),
        F.col(val).alias("__vb"),
    )
    j = a.join(
        b,
        (F.col("__kb") == F.col(key))
        & (F.col("__pb") >= F.col("__pa"))
        & (F.col("__pb") <= F.col("__pa") + 4),
    )
    lagm = F.col("__pb") - F.col("__pa")
    rs = j.groupBy(key).agg(
        F.count(F.when(lagm == 0, 1)).alias("__n"),
        *[
            F.sum(
                F.when(lagm == m, F.col("__va") * F.col("__vb")).otherwise(
                    F.lit(0.0)
                )
            ).alias(f"r{m}")
            for m in range(5)
        ],
    )
    d = rs.where((F.col("__n") >= 8) & (F.col("r0") > 0))

    def guarded(prev_e, expr):
        return F.when(prev_e > 0, expr).otherwise(F.lit(0.0))

    r = [F.col(f"r{m}") for m in range(5)]
    e0 = r[0]
    k1 = guarded(e0, r[1] / e0)
    a1_1 = k1
    e1 = guarded(e0, e0 * (1 - k1 * k1))
    k2 = guarded(e1, (r[2] - a1_1 * r[1]) / e1)
    a2_2 = k2
    a2_1 = a1_1 - k2 * a1_1
    e2 = guarded(e1, e1 * (1 - k2 * k2))
    k3 = guarded(e2, (r[3] - a2_1 * r[2] - a2_2 * r[1]) / e2)
    a3_3 = k3
    a3_1 = a2_1 - k3 * a2_2
    a3_2 = a2_2 - k3 * a2_1
    e3 = guarded(e2, e2 * (1 - k3 * k3))
    k4 = guarded(
        e3, (r[4] - a3_1 * r[3] - a3_2 * r[2] - a3_3 * r[1]) / e3
    )
    a4_4 = k4
    a4_1 = a3_1 - k4 * a3_3
    a4_2 = a3_2 - k4 * a3_2
    a4_3 = a3_3 - k4 * a3_1
    e4 = guarded(e3, e3 * (1 - k4 * k4))
    return d.select(
        key,
        F.col("r0").alias("r0"),
        k1.alias("k1"),
        k2.alias("k2"),
        k3.alias("k3"),
        k4.alias("k4"),
        a4_1.alias("a1"),
        a4_2.alias("a2"),
        a4_3.alias("a3"),
        a4_4.alias("a4"),
        F.sqrt(F.greatest(e4, F.lit(0.0))).alias("gain"),
    )


def lpc_envelope(
    coeffs: DataFrame,
    *,
    key: str = "doc_id",
    nfft: int = 16,
) -> DataFrame:
    """LPC spectral envelope |H(e^{j w})| = 1 / |A(e^{j w})| with
    A = 1 + sum_i a_i e^{-j i w} evaluated at the nfft/2+1 DFT
    frequencies (GetSpectralEnvelope, lpc.go:232-265 — the reference's
    PLUS-sign convention reproduced as written). Pure trig
    expressions over the lpc4 coefficient columns."""
    import math

    d = coeffs.withColumn(
        "k_idx", F.explode(F.sequence(F.lit(0), F.lit(nfft // 2)))
    )
    omega = 2.0 * math.pi * F.col("k_idx").cast("double") / float(nfft)
    re = F.lit(1.0)
    im = F.lit(0.0)
    for i in range(1, 5):
        ang = F.lit(float(-i)) * omega
        re = re + F.col(f"a{i}") * F.cos(ang)
        im = im + F.col(f"a{i}") * F.sin(ang)
    mag = F.sqrt(re * re + im * im)
    env = F.when(mag > 0, 1.0 / mag).otherwise(F.lit(0.0))
    return d.select(key, F.col("k_idx"), env.alias("envelope"))
