"""Point-in-time / as-of join (backward: each left row matched to the
latest right row with right_ts <= left_ts).

Reference semantics: TruncateToAlignmentPCM keeps, for each point of
the lagging stream, the latest aligned counterpart
(reference fingerprint/extractors/alignment.go:223-297); our join
generalizes that to (entity, ts)-keyed tables with zero temporal
leakage (north_rule).

Spark has no native merge_asof. Two physical strategies:

1. strategy="union" (default): tag both sides, union, one sort-merge
   shuffle on entity, then a running last(payload, ignorenulls=True)
   window over (entity ORDER BY ts, side, version). One shuffle,
   O(1) state per row, stays inside whole-stage-codegen window exec.
   At equal timestamps the right row sorts first => backward joins
   include exact matches; at duplicate right timestamps the highest
   version wins (it sorts last and overwrites the running last()).

2. strategy="bucketed": the SURVEY §4 design for extreme per-entity
   skew (one entity's timeline too big for one task): range-bucket
   both sides on floor(ts / bucket_width), make each right
   (entity, bucket)'s latest row visible to every later left bucket
   (boundary-spill carried via a bucket-granularity running window),
   then cogroup-applyInPandas running pandas.merge_asof per
   (entity, bucket) shard. Buckets of one entity land in different
   tasks => a hot entity is spread across the cluster. An in-kernel
   assert enforces zero temporal leakage.

Both return all left columns plus matched_ref_ts (null = no match)
and the matched right payload columns. Property-tested against the
quadratic brute-force oracle (sonar_spark.oracle.asof_brute_force).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import AsofConfig


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "entity",
    left_ts: str = "ts",
    right_ts: str = "ref_ts",
    version: str | None = "ref_version",
    payload: tuple[str, ...] = ("ref_features",),
    cfg: AsofConfig = AsofConfig(),
    strategy: str = "union",
) -> DataFrame:
    """As-of (backward, inclusive) join of left onto right per key.

    Output: all left columns + matched_ref_ts (long, null if no right
    row precedes) + payload columns from the matched right row.
    """
    if strategy == "union":
        return _asof_union(left, right, key, left_ts, right_ts, version, payload)
    if strategy == "bucketed":
        return _asof_bucketed(
            left, right, key, left_ts, right_ts, version, payload, cfg
        )
    raise ValueError(f"unknown asof strategy {strategy!r}")


def _asof_union(left, right, key, left_ts, right_ts, version, payload):
    lcols = left.columns
    ltypes = dict(left.dtypes)
    carry = list(payload) + ([version] if version else [])
    rtypes = dict(right.select(*carry).dtypes)

    r = right.select(
        F.col(key),
        F.col(right_ts).cast("long").alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.col(right_ts).cast("long").alias("matched_ref_ts"),
        *[F.col(c) for c in carry],
        *[
            F.lit(None).cast(ltypes[c]).alias(c)
            for c in lcols
            if c != key
        ],
    )
    ldf = left.select(
        *lcols,
        F.col(left_ts).cast("long").alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("matched_ref_ts"),
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in carry],
    )
    u = ldf.unionByName(r.select(*ldf.columns))
    # order: ts asc; at equal ts right (0) before left (1) => inclusive
    # backward match; among right rows at equal ts, higher version last
    # => running last() keeps it.
    order = [F.col("__ts").asc(), F.col("__is_left").asc()]
    if version:
        order.append(F.col(version).asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *lcols,
        "__is_left",
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            for c in ["matched_ref_ts", *carry]
        ],
    )
    return filled.where(F.col("__is_left") == 1).drop("__is_left")


def _asof_bucketed(left, right, key, left_ts, right_ts, version, payload, cfg):
    bucket_w = int(cfg.bucket_width)
    carry = list(payload) + ([version] if version else [])
    lcols = left.columns

    lb = left.withColumn("__lts", F.col(left_ts).cast("long")).withColumn(
        "__b", F.floor(F.col("__lts") / bucket_w)
    )
    rb = right.select(
        key, F.col(right_ts).cast("long").alias("__rts"), *carry
    ).withColumn("__b", F.floor(F.col("__rts") / bucket_w))

    # Latest right row per (entity, bucket) via max(struct(ts, version, ...)).
    ver_cols = [F.col(version)] if version else []
    last_per_bucket = (
        rb.groupBy(key, "__b")
        .agg(
            F.max(
                F.struct(F.col("__rts"), *ver_cols, *[F.col(c) for c in payload])
            ).alias("__s")
        )
        .select(
            key,
            "__b",
            F.col("__s.__rts").alias("__rts"),
            *([F.col(f"__s.{version}").alias(version)] if version else []),
            *[F.col(f"__s.{c}").alias(c) for c in payload],
        )
    )

    # For each left (entity, bucket): the carry row = latest right row in any
    # bucket <= b (in-bucket rows are also shipped below, so inclusive is
    # fine — merge_asof picks the max ts anyway). Bucket-granularity
    # union + running-last window over the SMALL per-bucket tables.
    lbk = (
        lb.select(key, "__b")
        .distinct()
        .withColumn("__is_left", F.lit(1))
        .select(
            key,
            "__b",
            "__is_left",
            *[
                F.lit(None).cast(t).alias(c)
                for c, t in rb.select("__rts", *carry).dtypes
            ],
        )
    )
    rbk = last_per_bucket.withColumn("__is_left", F.lit(0)).select(*lbk.columns)
    # Order LEFT bucket rows BEFORE same-bucket right rows (__is_left desc):
    # the running last() then only sees right rows from STRICTLY EARLIER
    # buckets — same-bucket right rows may lie after the left timestamps
    # and must come only from the in-bucket merge, never the carry.
    wb = (
        Window.partitionBy(key)
        .orderBy(F.col("__b").asc(), F.col("__is_left").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry_rows = (
        lbk.unionByName(rbk)
        .select(
            key,
            "__b",
            "__is_left",
            *[
                F.last(c, ignorenulls=True).over(wb).alias(c)
                for c in ["__rts", *carry]
            ],
        )
        .where((F.col("__is_left") == 1) & F.col("__rts").isNotNull())
        .drop("__is_left")
    )

    # Right rows visible to a left (entity, bucket) shard: in-bucket rows +
    # the carry row (the predecessor from earlier buckets).
    rb_vis = rb.unionByName(carry_rows.select(*rb.columns))

    out_schema = ", ".join(
        [f"`{c}` {t}" for c, t in left.dtypes]
        + ["matched_ref_ts bigint"]
        + [f"`{c}` {t}" for c, t in right.select(*carry).dtypes]
    )
    pay = list(carry)
    sort_cols = ["__rts"] + ([version] if version else [])
    int_like = {"tinyint", "smallint", "int", "bigint"}
    carry_int = {c for c, t in right.select(*carry).dtypes if t in int_like}

    def _clean(v):
        # merge_asof fills unmatched rows with float NaN even in
        # object/array columns; normalize to None for Arrow.
        if v is None:
            return None
        try:
            if pd.api.types.is_scalar(v) and pd.isna(v):
                return None
        except (TypeError, ValueError):
            pass
        return v

    def merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        out_cols = [*lcols, "matched_ref_ts", *pay]
        if ldf.empty:
            return pd.DataFrame(columns=out_cols)
        ldf = ldf.sort_values("__lts", kind="mergesort").reset_index(drop=True)
        if rdf.empty:
            res = ldf.copy()
            res["matched_ref_ts"] = pd.array([None] * len(res), dtype="Int64")
            for c in pay:
                res[c] = None
            return res[out_cols]
        rdf = (
            rdf.sort_values(sort_cols, kind="mergesort")
            .drop_duplicates(subset=["__rts"], keep="last")
            .reset_index(drop=True)
        )
        res = pd.merge_asof(
            ldf,
            rdf.drop(columns=["__b"]).rename(columns={"__rts": "matched_ref_ts"}),
            left_on="__lts",
            right_on="matched_ref_ts",
            by=key,
            direction="backward",
            allow_exact_matches=True,
        )
        # zero-temporal-leakage hard assert (north_rule)
        m = res["matched_ref_ts"].dropna()
        if len(m) and (m.values > res.loc[m.index, "__lts"].values).any():
            raise AssertionError("temporal leakage in as-of join")
        res["matched_ref_ts"] = res["matched_ref_ts"].astype("Int64")
        for c in pay:
            if c in carry_int:
                res[c] = pd.Series(res[c]).astype("Int64")
            else:
                res[c] = pd.Series(res[c]).map(_clean)
        return res[out_cols]

    cg = lb.groupBy(key, "__b").cogroup(rb_vis.groupBy(key, "__b"))
    return cg.applyInPandas(lambda ldf, rdf: merge(ldf, rdf), schema=out_schema)
