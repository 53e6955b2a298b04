"""Spectral peak detection + parabolic refinement
(harmonic/spectral_peaks.go:36-156) as pure window/expression
relational ops over a (group..., bin, magnitude) spectrum table:

- local maximum: m[i] > m[i-1] AND m[i] > m[i+1] AND m[i] >=
  min_height (edge bins excluded, as upstream's i in [1, n-2]);
- parabolic interpolation: offset = (y3-y1) / (2(2 y2 - y1 - y3))
  when |denom| > 1e-10; refined frequency (bin+offset)*resolution and
  magnitude y2 + a offset^2 + b offset (:129-145);
- top max_peaks per group by magnitude descending (:90-99).

The reference's greedy min-distance dedup loop (:55-73) is sequential
and order-dependent; with its minimum distance of one bin (the
16-bin-analog default) it is a no-op, which is what this operator
implements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .topk import topk_per_group


def spectral_peaks(
    spec: DataFrame,
    group_cols: list[str],
    *,
    bin_col: str = "bin",
    mag_col: str = "m",
    min_height: float = 0.0,
    max_peaks: int = 3,
    freq_resolution: float = 1.0,
) -> DataFrame:
    """Output: group cols + rank, bin, magnitude, refined_freq,
    refined_mag."""
    w = Window.partitionBy(*group_cols).orderBy(bin_col)
    m = F.col(mag_col)
    d = spec.withColumn("__y1", F.lag(mag_col).over(w)).withColumn(
        "__y3", F.lead(mag_col).over(w)
    )
    cand = d.where(
        (m > F.col("__y1")) & (m > F.col("__y3")) & (m >= min_height)
    )
    denom = 2.0 * (2.0 * m - F.col("__y1") - F.col("__y3"))
    ok = F.abs(denom) > 1e-10
    offset = F.when(ok, (F.col("__y3") - F.col("__y1")) / denom).otherwise(
        F.lit(0.0)
    )
    a = 0.5 * (F.col("__y1") - 2.0 * m + F.col("__y3"))
    b = 0.5 * (F.col("__y3") - F.col("__y1"))
    refined_freq = (F.col(bin_col) + offset) * freq_resolution
    refined_mag = F.when(ok, m + a * offset * offset + b * offset).otherwise(m)
    scored = cand.select(
        *group_cols,
        F.col(bin_col).alias("bin"),
        m.alias("magnitude"),
        refined_freq.alias("refined_freq"),
        refined_mag.alias("refined_mag"),
    )
    return topk_per_group(
        scored,
        group_cols,
        [F.col("magnitude").desc(), F.col("bin").asc()],
        max_peaks,
    )
