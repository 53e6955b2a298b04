"""Random projection (Johnson-Lindenstrauss) for embedding columns —
the dimensionality-reduction step ahead of ANN / clustering at scale:
project dim-d vectors onto a seeded Gaussian matrix R (scaled
1/sqrt(k)) so pairwise distances are preserved in expectation, at a
k/d memory and compute discount for everything downstream.

Determinism/oracle contract: R is a PLAN-TIME CONSTANT (seeded draw,
shared with the DuckDB oracle as repr-float VALUES — the semdedup
centroid / IVF-PQ codebook precedent), and every float sum is carried
as 9dp integer micro-units (products and squared differences rounded
at the named quantized boundary, then exact BIGINT sums), so
projections and the distance report are bit-identical in any engine
and under any partitioning/order.

Scale shape: the projection is one posexplode + a broadcast join of
the d*k-row matrix + one (vec, j) aggregate — map-side combined, no
corpus self-join; the verification pair sample is a deterministic
vec_id+1 join, linear in the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JL_SEED = 1984  # Johnson & Lindenstrauss publication year
JL_IN = 64
JL_OUT = 16


def jl_matrix() -> list[tuple[int, int, float]]:
    """(k, j, r) rows of the seeded projection matrix, r ~
    N(0, 1/sqrt(out_dim)) — shared with the oracle as repr floats."""
    import numpy as np

    rng = np.random.RandomState(JL_SEED)
    mat = rng.randn(JL_IN, JL_OUT) / np.sqrt(JL_OUT)
    return [
        (k, j, float(mat[k, j]))
        for k in range(JL_IN)
        for j in range(JL_OUT)
    ]


def jl_matrix_sql_values() -> str:
    return ",\n             ".join(
        f"({k}, {j}, {r!r})" for k, j, r in jl_matrix()
    )


def _micro9(col) -> F.Column:
    return F.round(F.round(col, 9) * 1e9, 0).cast("long")


def jl_project(emb: DataFrame, *, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, j, p) projected coordinates, 6dp (micro-unit sums)."""
    spark = emb.sparkSession
    rdf = spark.createDataFrame(
        jl_matrix(), "k int, j int, r double"
    )
    pos = emb.select(
        id_col, F.posexplode(vec_col).alias("k", "__v")
    )
    return (
        pos.join(F.broadcast(rdf), "k")
        .groupBy(id_col, "j")
        .agg(F.sum(_micro9(F.col("__v") * F.col("r"))).alias("__mu"))
        .select(
            id_col,
            "j",
            F.round(F.col("__mu") / 1e9 + 1e-12, 6).alias("p"),
        )
    )


def jl_distance_report(
    emb: DataFrame, *, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distance-preservation report over the deterministic
    (even id, id+1) pair sample: squared distance before and after
    projection and their ratio (expectation 1 under JL; variance
    ~2/out_dim).  Output: vec_id_a, vec_id_b, d2_orig, d2_proj,
    ratio — all 6dp."""
    # the projection table feeds both pair sides — persist it so the
    # posexplode+join+aggregate runs once (the dsir model precedent)
    proj = jl_project(emb, id_col=id_col, vec_col=vec_col).persist()
    a = emb.select(
        F.col(id_col).alias("vec_id_a"), F.col(vec_col).alias("__va")
    ).where(F.col("vec_id_a") % 2 == 0)
    b = emb.select(
        F.col(id_col).alias("vec_id_b"), F.col(vec_col).alias("__vb")
    )
    pairs = a.join(
        b, F.col("vec_id_b") == F.col("vec_id_a") + 1
    )
    d2o_micro = F.aggregate(
        F.zip_with(
            "__va",
            "__vb",
            lambda x, y: F.round((x - y) * (x - y), 9),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.round(t * 1e9, 0).cast("long"),
    )
    # orig feeds the projected pair frame and the final join, but the
    # pair table is tiny and the fold cheap — recomputing beats a
    # persist barrier here (measured: the persist cost bench +1s)
    orig = pairs.select(
        "vec_id_a",
        "vec_id_b",
        F.round(d2o_micro / 1e9 + 1e-12, 6).alias("d2_orig"),
    )
    pa = proj.select(
        F.col(id_col).alias("vec_id_a"), "j", F.col("p").alias("__pa")
    )
    pb = proj.select(
        F.col(id_col).alias("vec_id_b"), "j", F.col("p").alias("__pb")
    )
    dproj = (
        orig.select("vec_id_a", "vec_id_b")
        .join(pa, "vec_id_a")
        .join(pb, ["vec_id_b", "j"])
        .groupBy("vec_id_a", "vec_id_b")
        .agg(
            F.sum(
                _micro9(
                    (F.col("__pa") - F.col("__pb"))
                    * (F.col("__pa") - F.col("__pb"))
                )
            ).alias("__mu")
        )
        .select(
            "vec_id_a",
            "vec_id_b",
            F.round(F.col("__mu") / 1e9 + 1e-12, 6).alias("d2_proj"),
        )
    )
    return orig.join(dproj, ["vec_id_a", "vec_id_b"]).select(
        "vec_id_a",
        "vec_id_b",
        "d2_orig",
        "d2_proj",
        F.when(F.col("d2_orig") > 0,
               F.round(F.col("d2_proj") / F.col("d2_orig") + 1e-12, 6))
        .otherwise(F.lit(0.0))
        .alias("ratio"),
    )


def int8_quantize_report(
    emb: DataFrame, *, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector int8 affine quantization report — the 8x storage
    compression embedding stores apply before ANN (the scalar cousin
    of the IVF-PQ codebooks): q_i = round((v_i - min) / scale) with
    scale = (max - min) / 255, reconstruction v' = min + q * scale.

    All decision points are deterministic: min/max are exact doubles,
    scale rides one double division, the code round gets the +1e-12
    tie nudge (both engines), codes clamp to [0, 255], and the
    reconstruction error is a 9dp micro-unit sum.  A zero-range
    vector (scale == 0) quantizes to all-zero codes and reconstructs
    exactly.

    Output per vector: vmin/vmax (6dp), code_sum (exact int checksum
    of the 64 codes), rmse (6dp).  One scan, zero shuffles beyond the
    per-vector aggregate (all array expressions).
    """
    v = F.col(vec_col)
    vmin = F.array_min(v)
    vmax = F.array_max(v)
    scale = (vmax - vmin) / F.lit(255.0)
    code = F.transform(
        v,
        lambda x: F.when(
            scale > 0,
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.round((x - vmin) / scale + 1e-12, 0).cast("int"),
                ),
            ),
        ).otherwise(F.lit(0)),
    )
    base = emb.select(
        id_col,
        v.alias("__v"),
        vmin.alias("__mn"),
        scale.alias("__sc"),
        code.alias("__q"),
    )
    err_micro = F.aggregate(
        F.zip_with(
            "__v",
            "__q",
            lambda x, q: F.round(
                (x - (F.col("__mn") + q.cast("double") * F.col("__sc")))
                * (x - (F.col("__mn") + q.cast("double") * F.col("__sc"))),
                9,
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.round(t * 1e9, 0).cast("long"),
    )
    return base.select(
        id_col,
        F.round(F.col("__mn") + 1e-12, 6).alias("vmin"),
        F.round(F.col("__mn") + F.col("__sc") * 255.0 + 1e-12, 6).alias(
            "vmax"
        ),
        F.aggregate(
            "__q", F.lit(0).cast("long"), lambda a, q: a + q
        ).alias("code_sum"),
        F.round(
            F.sqrt(err_micro / 1e9 / F.size("__v")) + 1e-12, 6
        ).alias("rmse"),
    )
