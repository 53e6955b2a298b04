"""Chroma-space analysis: Tonnetz projection + trajectory
(chroma/tonnetz.go:49-237) and optimal circular-shift similarity
(chroma/chroma_vector.go:189-217).

Tonnetz: each pitch class has a fixed 2-D coordinate — x from the
circle-of-fifths table (tonnetz.go:55-68), y OVERRIDDEN by the
final switch (tonnetz.go:88-97: {C,E,G#} -> 0, {G,B,D#} -> sqrt3/2,
{A#,D,F#} -> -sqrt3/2, {C#,F,A} -> sqrt3; the preceding major-third
loop's value is dead).  A chroma frame projects to the
energy-weighted centroid (ComputeTonnetzCentroid :138-163, (0,0)
when total weight <= 1e-10); the per-frame centroid sequence is the
trajectory (:166-187), and AnalyzeTonnetzMovement (:190-237) reduces
it to distance/velocity/stability statistics.

Centroids are rounded to 6 dp before the trajectory statistics so
the DuckDB oracle agrees bit-for-bit on every downstream comparison
(same quantized-interface convention as the LPC envelope).

All of it is relational: a 12-row broadcast coordinate table, one
groupBy per frame, a lag window over frames, and per-doc aggregates
— the exact shape that scales to a billion frames (the coordinate
join is constant, the windows partition by doc).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SQRT3 = math.sqrt(3.0)

# (pitch_class, x, y) — tonnetz.go:55-68 fifths x; :88-97 y override
TONNETZ_COORDS = [
    (0, 0.0, 0.0),
    (1, -5.0, _SQRT3),
    (2, 2.0, -_SQRT3 / 2.0),
    (3, -3.0, _SQRT3 / 2.0),
    (4, 4.0, 0.0),
    (5, -1.0, _SQRT3),
    (6, 6.0, -_SQRT3 / 2.0),
    (7, 1.0, _SQRT3 / 2.0),
    (8, -4.0, 0.0),
    (9, 3.0, _SQRT3),
    (10, -2.0, -_SQRT3 / 2.0),
    (11, 5.0, _SQRT3 / 2.0),
]


def tonnetz_centroids(
    chroma: DataFrame,
    group_cols: list[str],
    *,
    class_col: str = "pitch_class",
    value_col: str = "hpcp",
) -> DataFrame:
    """Per-group Tonnetz centroid of the 12-class chroma vector
    (ComputeTonnetzCentroid, tonnetz.go:138-163): weighted mean of
    the fixed coordinates, (0, 0) when total weight <= 1e-10.
    Output: group cols + centroid_x, centroid_y (6-dp rounded)."""
    spark = chroma.sparkSession
    coords = spark.createDataFrame(
        TONNETZ_COORDS, "pc int, x double, y double"
    )
    j = chroma.join(F.broadcast(coords), F.col(class_col) == F.col("pc"))
    w = F.col(value_col).cast("double")
    ag = j.groupBy(*group_cols).agg(
        F.sum(F.col("x") * w).alias("__wx"),
        F.sum(F.col("y") * w).alias("__wy"),
        F.sum(w).alias("__tw"),
    )
    cx = F.when(F.col("__tw") > 1e-10, F.col("__wx") / F.col("__tw")).otherwise(
        F.lit(0.0)
    )
    cy = F.when(F.col("__tw") > 1e-10, F.col("__wy") / F.col("__tw")).otherwise(
        F.lit(0.0)
    )
    return ag.select(
        *group_cols,
        F.round(cx, 6).alias("centroid_x"),
        F.round(cy, 6).alias("centroid_y"),
    )


def tonnetz_movement(
    traj: DataFrame,
    *,
    key: str = "doc_id",
    order: str = "frame_idx",
    x_col: str = "centroid_x",
    y_col: str = "centroid_y",
) -> DataFrame:
    """Movement statistics over the per-key centroid trajectory
    (AnalyzeTonnetzMovement, tonnetz.go:190-237): total distance, max
    velocity, mean velocity, velocity variance (two-pass, as
    written), harmonic stability 1/(1+var), and path efficiency
    displacement/total (NULL when total <= 1e-10).  Keys with fewer
    than 2 frames are excluded (the reference returns an empty map).

    Per-step distances are rounded to 6 dp before aggregation
    (quantized interface)."""
    w = Window.partitionBy(key).orderBy(order)
    d = traj.select(
        key,
        order,
        F.col(x_col).alias("__x"),
        F.col(y_col).alias("__y"),
        F.lag(x_col).over(w).alias("__px"),
        F.lag(y_col).over(w).alias("__py"),
        F.first(x_col).over(w).alias("__x0"),
        F.first(y_col).over(w).alias("__y0"),
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(Window.partitionBy(key)).alias("__nf"),
    )
    dx = F.col("__x") - F.col("__px")
    dy = F.col("__y") - F.col("__py")
    steps = d.where(F.col("__px").isNotNull()).select(
        key,
        "__rn",
        "__nf",
        F.round(F.sqrt(dx * dx + dy * dy), 6).alias("__v"),
        F.when(
            F.col("__rn") == F.col("__nf"),
            F.round(
                F.sqrt(
                    (F.col("__x") - F.col("__x0"))
                    * (F.col("__x") - F.col("__x0"))
                    + (F.col("__y") - F.col("__y0"))
                    * (F.col("__y") - F.col("__y0"))
                ),
                6,
            ),
        ).alias("__disp"),
    )
    mean_w = Window.partitionBy(key)
    s2 = steps.withColumn("__mean", F.avg("__v").over(mean_w))
    ag = s2.groupBy(key).agg(
        F.sum("__v").alias("total_distance"),
        F.max("__v").alias("max_velocity"),
        F.max("__mean").alias("mean_velocity"),
        F.avg(
            (F.col("__v") - F.col("__mean"))
            * (F.col("__v") - F.col("__mean"))
        ).alias("velocity_variance"),
        F.max("__disp").alias("__disp"),
    )
    return ag.select(
        key,
        "total_distance",
        "max_velocity",
        "mean_velocity",
        "velocity_variance",
        (1.0 / (1.0 + F.col("velocity_variance"))).alias(
            "harmonic_stability"
        ),
        F.when(
            F.col("total_distance") > 1e-10,
            F.col("__disp") / F.col("total_distance"),
        ).alias("path_efficiency"),
    )


def chroma_shift_optimal(
    left: DataFrame,
    right: DataFrame,
    pair_on: list[str],
    *,
    class_col: str = "pitch_class",
    value_col: str = "chroma",
    size: int = 12,
) -> DataFrame:
    """Optimal circular shift of the left chroma against the right
    (ShiftOptimal, chroma_vector.go:189-205, cosine metric): for each
    shift s, similarity = 1 - CosineDistance(shift(cv1, s), cv2) / 2
    where shift(cv)[i] = cv[(i+s) % size] (:207-217) and
    CosineDistance is 1 - dot/(|a||b|), 1.0 on a zero norm
    (stats CosineDistanceFunc); best = strict-max over ascending
    shifts starting at 0.0, so (0, 0.0) when nothing beats zero.

    left/right: (pair key cols..., class, value) long tables with the
    pair key columns aligned.  Output: pair cols + best_shift +
    best_similarity."""
    lk = [F.col(c).alias(f"__l_{c}") for c in pair_on]
    l = left.select(
        *lk,
        F.col(class_col).alias("__lc"),
        F.col(value_col).cast("double").alias("__lv"),
    ).withColumn("__s", F.explode(F.sequence(F.lit(0), F.lit(size - 1))))
    r = right.select(
        *pair_on,
        F.col(class_col).alias("__rc"),
        F.col(value_col).cast("double").alias("__rv"),
    )
    # shifted cv1[i] = cv1[(i + s) % size]: the left value at class
    # (i + s) % size lands at position i, which must match cv2[i].
    cond = (
        F.col("__rc")
        == F.pmod(F.col("__lc") - F.col("__s") + size, F.lit(size))
    )
    for c in pair_on:
        cond = cond & (F.col(f"__l_{c}") == F.col(c))
    j = l.join(r, cond)
    ag = j.groupBy(*pair_on, "__s").agg(
        F.sum(F.col("__lv") * F.col("__rv")).alias("__dot"),
        F.sum(F.col("__lv") * F.col("__lv")).alias("__na"),
        F.sum(F.col("__rv") * F.col("__rv")).alias("__nb"),
    )
    dist = F.when(
        (F.col("__na") == 0) | (F.col("__nb") == 0), F.lit(1.0)
    ).otherwise(
        1.0 - F.col("__dot") / (F.sqrt("__na") * F.sqrt("__nb"))
    )
    sims = ag.select(
        *pair_on,
        F.col("__s"),
        (1.0 - dist / 2.0).alias("__sim"),
    )
    from .topk import topk_per_group

    best = topk_per_group(
        sims.where(F.col("__sim") > 0),
        pair_on,
        [F.col("__sim").desc(), F.col("__s").asc()],
        1,
    )
    base = sims.select(*pair_on).distinct()
    return base.join(best, pair_on, "left").select(
        *pair_on,
        F.coalesce(F.col("__s"), F.lit(0)).cast("int").alias("best_shift"),
        F.coalesce(F.col("__sim"), F.lit(0.0)).alias("best_similarity"),
    )
