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


def chroma_cross_similarity(
    left: DataFrame,
    right: DataFrame,
    pair_on: list[str],
    *,
    frame_col: str = "frame_idx",
    class_col: str = "pitch_class",
    value_col: str = "chroma",
    binary_threshold: float = 0.4,
    oti_radius: int = 10,
    size: int = 12,
) -> DataFrame:
    """Chroma sequence similarity, matrix-aggregate methods
    (chroma_similarity.go:110-197 direct, :162-194 binary, :361-396
    QMax, :399-445 OTI) between two chroma SEQUENCES per pair:

    - direct: mean of the Q x R cross-similarity matrix (cosine
      similarity = 1 - CosineDistance/2 per frame pair);
    - binary: fraction of entries > BinaryThreshold (0.4);
    - qmax: max over per-diagonal maxima == the global matrix max,
      reproduced as written;
    - oti: for each of 12 circular query transpositions, the total
      similarity over the |i-j| <= radius band divided by Q*R (the
      reference divides by the FULL matrix size even though only the
      band is summed — reproduced as written), best by strict max
      over ascending shifts starting at 0.0.

    Input chroma values should be pre-rounded (quantized interface).
    Output: pair cols + sim_direct, sim_binary, qmax, oti_shift,
    oti_similarity."""
    lk = [F.col(c).alias(f"__l_{c}") for c in pair_on]
    l = left.select(
        *lk,
        F.col(frame_col).alias("__li"),
        F.col(class_col).alias("__lc"),
        F.col(value_col).cast("double").alias("__lv"),
    ).withColumn("__s", F.explode(F.sequence(F.lit(0), F.lit(size - 1))))
    r = right.select(
        *pair_on,
        F.col(frame_col).alias("__rj"),
        F.col(class_col).alias("__rc"),
        F.col(value_col).cast("double").alias("__rv"),
    )
    cond = (
        F.col("__rc")
        == F.pmod(F.col("__lc") - F.col("__s") + size, F.lit(size))
    )
    for c in pair_on:
        cond = cond & (F.col(f"__l_{c}") == F.col(c))
    j = l.join(r, cond)
    cell = j.groupBy(*pair_on, "__s", "__li", "__rj").agg(
        F.sum(F.col("__lv") * F.col("__rv")).alias("__dot"),
        F.sum(F.col("__lv") * F.col("__lv")).alias("__na"),
        F.sum(F.col("__rv") * F.col("__rv")).alias("__nb"),
    )
    dist = F.when(
        (F.col("__na") == 0) | (F.col("__nb") == 0), F.lit(1.0)
    ).otherwise(
        1.0 - F.col("__dot") / (F.sqrt("__na") * F.sqrt("__nb"))
    )
    sims = cell.select(
        *pair_on, "__s", "__li", "__rj", (1.0 - dist / 2.0).alias("__sim")
    )
    base = sims.where(F.col("__s") == 0)
    direct = base.groupBy(*pair_on).agg(
        F.avg("__sim").alias("sim_direct"),
        F.avg((F.col("__sim") > binary_threshold).cast("double")).alias(
            "sim_binary"
        ),
        F.max("__sim").alias("qmax"),
    )
    # OTI: band |i - j| <= radius summed, divided by FULL Q*R
    per_shift = (
        sims.withColumn(
            "__in_band",
            (F.abs(F.col("__li") - F.col("__rj")) <= oti_radius).cast(
                "double"
            ),
        )
        .groupBy(*pair_on, "__s")
        .agg(
            (F.sum(F.col("__sim") * F.col("__in_band")) / F.count("*"))
            .alias("__avg")
        )
    )
    from .topk import topk_per_group

    oti_best = topk_per_group(
        per_shift.where(F.col("__avg") > 0),
        pair_on,
        [F.col("__avg").desc(), F.col("__s").asc()],
        1,
    ).select(
        *pair_on,
        F.col("__s").alias("oti_shift"),
        F.col("__avg").alias("oti_similarity"),
    )
    out = direct.join(oti_best, pair_on, "left")
    return out.select(
        *pair_on,
        "sim_direct",
        "sim_binary",
        "qmax",
        F.coalesce(F.col("oti_shift"), F.lit(0)).cast("int").alias(
            "oti_shift"
        ),
        F.coalesce(F.col("oti_similarity"), F.lit(0.0)).alias(
            "oti_similarity"
        ),
    )


def _dp_kernel(method: str):
    """Per-pair DP ports of chroma_similarity.go — Smith-Waterman
    local alignment (:198-267 + traceback :472-497) and DTW
    (:270-353 + traceback :500-527).  Each pair's matrix is tiny
    (frames x frames); pairs are the parallel unit."""
    import numpy as np

    def cosine_sim(a, b):
        na = float(np.dot(a, a))
        nb = float(np.dot(b, b))
        if na == 0 or nb == 0:
            return 1.0 - 1.0 / 2.0
        import math

        return 1.0 - (1.0 - float(np.dot(a, b)) / (math.sqrt(na) * math.sqrt(nb))) / 2.0

    def cosine_dist(a, b):
        na = float(np.dot(a, a))
        nb = float(np.dot(b, b))
        if na == 0 or nb == 0:
            return 1.0
        import math

        return 1.0 - float(np.dot(a, b)) / (math.sqrt(na) * math.sqrt(nb))

    def sw(qs, rs):
        Q, R = len(qs), len(rs)
        scores = np.zeros((Q + 1, R + 1))
        tb = np.zeros((Q + 1, R + 1), dtype=np.int64)
        max_score, mi, mj = 0.0, 0, 0
        for i in range(1, Q + 1):
            for j in range(1, R + 1):
                sim = cosine_sim(qs[i - 1], rs[j - 1])
                match = scores[i - 1][j - 1] + sim
                delete = scores[i - 1][j] - 0.1
                insert = scores[i][j - 1] - 0.1
                mv = max(0.0, match, delete, insert)
                scores[i][j] = mv
                if mv > max_score:
                    max_score, mi, mj = mv, i, j
                # Go switch order: match, then delete, then insert
                if mv == match:
                    tb[i][j] = 1
                elif mv == delete:
                    tb[i][j] = 2
                elif mv == insert:
                    tb[i][j] = 3
        # traceback (:472-497)
        plen = 0
        i, j = mi, mj
        while i > 0 and j > 0 and scores[i][j] > 0:
            plen += 1
            d = tb[i][j]
            if d == 1:
                i -= 1
                j -= 1
            elif d == 2:
                i -= 1
            elif d == 3:
                j -= 1
            else:
                break
        sim_norm = max_score / plen if plen else float("nan")
        return max_score, plen, sim_norm

    def dtw(qs, rs):
        import math

        Q, R = len(qs), len(rs)
        cost = np.zeros((Q, R))
        for i in range(Q):
            for j in range(R):
                cost[i][j] = cosine_dist(qs[i], rs[j])
        acc = np.zeros((Q, R))
        acc[0][0] = cost[0][0]
        for i in range(1, Q):
            acc[i][0] = acc[i - 1][0] + cost[i][0]
        for j in range(1, R):
            acc[0][j] = acc[0][j - 1] + cost[0][j]
        for i in range(1, Q):
            for j in range(1, R):
                acc[i][j] = cost[i][j] + min(
                    acc[i - 1][j], acc[i][j - 1], acc[i - 1][j - 1]
                )
        # traceback (:500-527): (0,0) is NOT appended
        plen = 0
        i, j = Q - 1, R - 1
        while i > 0 or j > 0:
            plen += 1
            if i == 0:
                j -= 1
            elif j == 0:
                i -= 1
            elif (
                acc[i - 1][j - 1] <= acc[i - 1][j]
                and acc[i - 1][j - 1] <= acc[i][j - 1]
            ):
                i -= 1
                j -= 1
            elif acc[i - 1][j] <= acc[i][j - 1]:
                i -= 1
            else:
                j -= 1
        d = acc[Q - 1][R - 1] / plen if plen else float("nan")
        return float(acc[Q - 1][R - 1]), plen, math.exp(-d)

    return sw if method == "sw" else dtw


def chroma_dp_similarity(
    pairs: DataFrame,
    pair_on: list[str],
    *,
    method: str = "dtw",
    qseq_col: str = "qseq",
    rseq_col: str = "rseq",
) -> DataFrame:
    """Smith-Waterman / DTW chroma sequence similarity
    (chroma_similarity.go:198-353) over per-pair chroma sequences.
    pairs: (pair cols..., qseq array<array<double>>, rseq ...) with
    frames in order and values pre-rounded (quantized interface).

    mapInPandas over pair rows — pairs are the parallel unit; each
    DP matrix is frames^2 (tiny).  Output: pair cols + score (SW max
    score / DTW corner cost), path_len, similarity (SW
    length-normalized max / DTW exp(-distance/path))."""
    kern = _dp_kernel(method)
    key_fields = pairs.select(*pair_on).schema.fields
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in key_fields)
        + ", score double, path_len int, similarity double"
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            scores, plens, sims = [], [], []
            for qs, rs in zip(pdf[qseq_col], pdf[rseq_col]):
                qa = [np.asarray(v, dtype=np.float64) for v in qs]
                ra = [np.asarray(v, dtype=np.float64) for v in rs]
                s, p, sm = kern(qa, ra)
                scores.append(s)
                plens.append(p)
                sims.append(sm)
            out = pdf[[*pair_on]].copy()
            out["score"] = scores
            out["path_len"] = np.asarray(plens, dtype=np.int32)
            out["similarity"] = sims
            yield out

    return pairs.mapInPandas(run, schema=out_schema)
