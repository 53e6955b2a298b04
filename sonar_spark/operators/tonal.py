"""Key estimation by profile correlation
(tonal/key_estimation.go:286-345 estimateKeyProfile +
:391-404 correlateWithProfile + :405-433 profile tables): Pearson
correlation of the 12-class chroma/HPCP vector against all 24
key-shifted major/minor templates, best key by confidence.

The deep tonal stack is otherwise §2.13-deferred; this operator is
the template-dot-product core SURVEY maps to "template dot-products =
matmul", expressed as one broadcast join against the 288-row constant
template table + two aggregations — no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .topk import topk_per_group

# Krumhansl-Schmuckler empirical profiles (key_estimation.go:405-412)
KRUMHANSL_MAJOR = [
    6.35, 2.23, 3.48, 2.33, 4.38, 4.09, 2.52, 5.19, 2.39, 3.66, 2.29, 2.88,
]
KRUMHANSL_MINOR = [
    6.33, 2.68, 3.52, 5.38, 2.60, 3.53, 2.54, 4.75, 3.98, 2.69, 3.34, 3.17,
]


def key_template_rows() -> list[tuple[int, str, int, float]]:
    """(key, mode, pitch_class, value) for all 24 shifted templates:
    shiftedProfile[i] = profile[(i + key) % 12]
    (correlateWithProfile, key_estimation.go:391-404)."""
    rows = []
    for key in range(12):
        for mode, prof in (("major", KRUMHANSL_MAJOR),
                           ("minor", KRUMHANSL_MINOR)):
            for i in range(12):
                rows.append((key, mode, i, prof[(i + key) % 12]))
    return rows


# Chord quality templates (chord_detection.go:268-375): pattern over
# pitch classes at root 0, matching weight
CHORD_TEMPLATES = {
    "major": ([0, 4, 7], 1.0),
    "minor": ([0, 3, 7], 1.0),
    "diminished": ([0, 3, 6], 0.8),
    "augmented": ([0, 4, 8], 0.7),
    "dominant7": ([0, 4, 7, 10], 0.9),
    "major7": ([0, 4, 7, 11], 0.85),
    "minor7": ([0, 3, 7, 10], 0.85),
    "sus2": ([0, 2, 7], 0.7),
    "sus4": ([0, 5, 7], 0.7),
    "power": ([0, 7], 0.6),
}


def chord_template_rows() -> list[tuple[str, int, int, float, float]]:
    """(quality, root, pitch_class, tv, weight): the root-rotated
    binary patterns (rotatePattern, chord_detection.go:712-718 —
    rotated[(i + root) % 12] = pattern[i], i.e. class (interval +
    root) % 12 is active)."""
    rows = []
    for quality, (intervals, weight) in CHORD_TEMPLATES.items():
        for root in range(12):
            active = {(iv + root) % 12 for iv in intervals}
            for pc in range(12):
                rows.append(
                    (quality, root, pc, 1.0 if pc in active else 0.0,
                     weight)
                )
    return rows


def detect_chords(
    chroma: DataFrame,
    group_cols: list[str],
    *,
    class_col: str = "pitch_class",
    value_col: str = "hpcp",
) -> DataFrame:
    """Chord detection by template matching
    (chord_detection.go:586-733): score(quality, root) = weight *
    dot(chroma, rotated binary pattern), best per group (ties ->
    quality asc, root asc; the reference iterates an unordered map).
    Bass detection / inversions are omitted (no bass-register analog
    on the histogram spectrum); the chroma input is already
    unit-energy (the HPCP normalizer), so normalizeChroma is a no-op.

    Output: group cols + chord_root, chord_quality, score."""
    spark = chroma.sparkSession
    tpl = spark.createDataFrame(
        chord_template_rows(),
        "quality string, root int, pc int, tv double, weight double",
    )
    j = chroma.join(F.broadcast(tpl), F.col(class_col) == F.col("pc"))
    s = j.groupBy(*group_cols, "quality", "root").agg(
        (
            F.sum(F.col(value_col).cast("double") * F.col("tv"))
            * F.max("weight")
        ).alias("score")
    )
    best = topk_per_group(
        s,
        group_cols,
        [F.col("score").desc(), F.col("quality").asc(), F.col("root").asc()],
        1,
    )
    return best.drop("rank").select(
        *group_cols,
        F.col("root").alias("chord_root"),
        F.col("quality").alias("chord_quality"),
        "score",
    )


def estimate_key(
    chroma: DataFrame,
    group_cols: list[str],
    *,
    class_col: str = "pitch_class",
    value_col: str = "hpcp",
) -> DataFrame:
    """chroma: one row per (group..., pitch_class 0..11, value).
    Output: group cols + key (0..11), mode, confidence (the Pearson r
    of the winning template; 0 on zero-variance input, the
    PearsonCorrelationFunc convention). Ties break deterministically
    (confidence desc, mode asc, key asc) — the reference's unstable
    sort leaves ties unspecified."""
    spark = chroma.sparkSession
    tpl = spark.createDataFrame(
        key_template_rows(), "key int, mode string, pc int, tv double"
    )
    j = chroma.join(
        F.broadcast(tpl), F.col(class_col) == F.col("pc")
    )
    x = F.col(value_col).cast("double")
    y = F.col("tv")
    s = j.groupBy(*group_cols, "key", "mode").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    ssa = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    ssb = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    num = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    r = F.when((ssa <= 0) | (ssb <= 0), F.lit(0.0)).otherwise(
        num / F.sqrt(ssa * ssb)
    )
    scored = s.select(*group_cols, "key", "mode", r.alias("confidence"))
    best = topk_per_group(
        scored,
        group_cols,
        [F.col("confidence").desc(), F.col("mode").asc(),
         F.col("key").asc()],
        1,
    )
    return best.drop("rank")
