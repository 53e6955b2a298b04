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
   both sides on floor(ts / bucket_width) (adaptive width sizes the
   hottest entity's timeline to ~target_rows_per_bucket per shard),
   make each right (entity, bucket)'s latest row visible to every
   later left bucket (boundary-spill carried via a bucket-granularity
   running window), optionally salt-split still-hot shards (left rows
   hashed across S salts, right/carry rows replicated per salt), then
   the SAME running-last window as the union strategy but partitioned
   by (entity, bucket, salt) — a hot entity's timeline is split
   across many tasks while everything stays in whole-stage-codegen
   window exec (no Python in the hot path). A JVM assert_true guard
   enforces zero temporal leakage at runtime.

Both return all left columns plus matched_ref_ts (null = no match)
and the matched right payload columns. Property-tested against the
quadratic brute-force oracle (sonar_spark.oracle.asof_brute_force).
"""

from __future__ import annotations

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
    if cfg.bucket_width is None:
        # adaptive: widest buckets that keep the BIGGEST single-entity
        # timeline under ~target rows per shard; buckets exist to split
        # oversized timelines across tasks, nothing else.
        stats = left.agg(
            F.min(F.col(left_ts).cast("long")).alias("lo"),
            F.max(F.col(left_ts).cast("long")).alias("hi"),
        ).collect()[0]
        hot = (
            left.groupBy(key).count().agg(F.max("count")).collect()[0][0] or 1
        )
        if stats["hi"] is None:  # empty left: any width works
            span = 1
        else:
            span = max(int(stats["hi"] - stats["lo"]) + 1, 1)
        n_buckets = max(1, int(hot // cfg.target_rows_per_bucket) + 1)
        bucket_w = max(1, span // n_buckets + 1)
    else:
        bucket_w = int(cfg.bucket_width)
    carry = list(payload) + ([version] if version else [])
    lcols = left.columns
    ltypes = dict(left.dtypes)
    rtypes = dict(right.select(*carry).dtypes)
    lb = left.withColumn("__ts", F.col(left_ts).cast("long")).withColumn(
        "__b", F.floor(F.col("__ts") / bucket_w)
    )
    rb = right.select(
        key, F.col(right_ts).cast("long").alias("__ts"), *carry
    ).withColumn("__b", F.floor(F.col("__ts") / bucket_w))

    # Latest right row per (entity, bucket) via max(struct(ts, version, ...)).
    ver_cols = [F.col(version)] if version else []
    last_per_bucket = (
        rb.groupBy(key, "__b")
        .agg(
            F.max(
                F.struct(F.col("__ts"), *ver_cols, *[F.col(c) for c in payload])
            ).alias("__s")
        )
        .select(
            key,
            "__b",
            F.col("__s.__ts").alias("__ts"),
            *([F.col(f"__s.{version}").alias(version)] if version else []),
            *[F.col(f"__s.{c}").alias(c) for c in payload],
        )
    )

    # Carry row per left (entity, bucket): latest right row from any
    # STRICTLY EARLIER bucket (left bucket rows ordered before
    # same-bucket right rows so the running last() can't see them).
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
                for c, t in rb.select("__ts", *carry).dtypes
            ],
        )
    )
    rbk = last_per_bucket.withColumn("__is_left", F.lit(0)).select(*lbk.columns)
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
                for c in ["__ts", *carry]
            ],
        )
        .where((F.col("__is_left") == 1) & F.col("__ts").isNotNull())
        .drop("__is_left")
    )

    # One tagged union; the running last-right fill is a JVM window
    # over (entity, bucket, salt) — the SAME sort-merge as the union
    # strategy but with the range bucket (and salt) in the partition
    # key, so a hot entity's timeline is split across many tasks.
    # Cross-bucket correctness comes from the carry rows; everything
    # stays in whole-stage codegen (no Python in the hot path).
    r_all = rb.unionByName(carry_rows.select(*rb.columns)).select(
        F.col(key),
        "__b",
        "__ts",
        F.lit(0).alias("__is_left"),
        *[F.col(c) for c in carry],
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols if c != key],
    )
    l_all = lb.select(
        F.col(key),
        "__b",
        "__ts",
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in carry],
        *[F.col(c) for c in lcols if c != key],
    )
    # salted skew splitting: when one (entity, bucket) shard is still
    # too hot (burst of left rows in a narrow ts range), split LEFT
    # rows across S salts and replicate the (small) right/carry rows
    # into every salt so each salt shard sees the full right timeline.
    S = max(int(cfg.salt), 1)
    if S > 1:
        l_all = l_all.withColumn(
            "__salt", F.pmod(F.xxhash64("__ts", lcols[0]), F.lit(S)).cast("int")
        )
        r_all = r_all.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(S - 1)))
        )
    else:
        l_all = l_all.withColumn("__salt", F.lit(0))
        r_all = r_all.withColumn("__salt", F.lit(0))
    u = l_all.unionByName(r_all.select(*l_all.columns))

    # order within a shard: ts asc; at equal ts right (0) before left
    # (1) => inclusive backward match; among right rows at equal ts the
    # higher version sorts last and wins the running last().
    order = [F.col("__ts").asc(), F.col("__is_left").asc()]
    if version:
        order.append(F.col(version).asc_nulls_first())
    w = (
        Window.partitionBy(key, "__b", "__salt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched_src = F.when(F.col("__is_left") == 0, F.col("__ts"))
    filled = u.select(
        *lcols,
        "__is_left",
        "__ts",
        F.last(matched_src, ignorenulls=True).over(w).alias("matched_ref_ts"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carry],
    )
    out = filled.where(F.col("__is_left") == 1)
    # zero-temporal-leakage runtime guard (north_rule): by construction
    # matched_ref_ts <= __ts; assert_true raises if any row violates.
    leak_ok = F.col("matched_ref_ts").isNull() | (
        F.col("matched_ref_ts") <= F.col("__ts")
    )
    guarded = F.when(
        F.assert_true(leak_ok, F.lit("temporal leakage in as-of join")).isNull(),
        F.col("matched_ref_ts"),
    )
    return out.select(
        *lcols,
        guarded.alias("matched_ref_ts"),
        *[F.col(c) for c in carry],
    )


def asof_join_directional(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "entity",
    left_ts: str = "ts",
    right_ts: str = "ref_ts",
    version: str | None = "ref_version",
    payload: tuple[str, ...] = ("ref_features",),
    direction: str = "backward",
) -> DataFrame:
    """As-of join with a direction: "backward" (latest right at or
    before, the default asof_join), or "forward" (earliest right at
    or after — the label-window / next-touchpoint lookup).

    Forward is the backward join on NEGATED timestamps — one sign
    flip reuses the whole tested union plan (same single shuffle,
    same inclusive-at-equal-ts and highest-version-wins tie rules) —
    so the forward output column is matched_fwd_ts.
    """
    if direction == "backward":
        return _asof_union(left, right, key, left_ts, right_ts, version, payload)
    if direction != "forward":
        raise ValueError(f"unknown direction {direction!r}")
    nl = left.withColumn("__nts", -F.col(left_ts).cast("long"))
    nr = right.withColumn("__nts_r", -F.col(right_ts).cast("long")).drop(
        right_ts
    )
    res = _asof_union(
        nl, nr, key, "__nts", "__nts_r", version, payload
    )
    return res.select(
        *[c for c in left.columns],
        (-F.col("matched_ref_ts")).cast("long").alias("matched_fwd_ts"),
        *payload,
        *([version] if version else []),
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "entity",
    left_ts: str = "ts",
    right_ts: str = "ref_ts",
    left_id: str = "event_id",
    version: str | None = "ref_version",
    payload: tuple[str, ...] = ("ref_features",),
) -> DataFrame:
    """Nearest-as-of: both directional passes joined back on the
    unique left id, then a per-row pick by absolute gap; ties
    (equal gap both sides) resolve BACKWARD — the zero-temporal-
    leakage-preferring rule, documented rather than inherited.

    Output: all left columns, both matched timestamps and payloads,
    plus matched_near_ts / near_src ('b'/'f', null when no match on
    either side) / near_gap_s and the picked payload columns
    (<payload>_near).
    """
    b = asof_join_directional(
        left, right, key=key, left_ts=left_ts, right_ts=right_ts,
        version=version, payload=payload, direction="backward",
    )
    fwd_ren = {c: f"{c}_fwd" for c in payload}
    f = asof_join_directional(
        left, right, key=key, left_ts=left_ts, right_ts=right_ts,
        version=version, payload=payload, direction="forward",
    ).select(
        left_id,
        "matched_fwd_ts",
        *[F.col(c).alias(fwd_ren[c]) for c in payload],
    )
    j = b.join(f, left_id)
    bgap = F.col(left_ts).cast("long") - F.col("matched_ref_ts")
    fgap = F.col("matched_fwd_ts") - F.col(left_ts).cast("long")
    take_b = F.col("matched_ref_ts").isNotNull() & (
        F.col("matched_fwd_ts").isNull() | (bgap <= fgap)
    )
    take_f = F.col("matched_fwd_ts").isNotNull() & ~take_b
    return j.select(
        *left.columns,
        "matched_ref_ts",
        *payload,
        "matched_fwd_ts",
        *[fwd_ren[c] for c in payload],
        F.when(take_b, F.col("matched_ref_ts"))
        .when(take_f, F.col("matched_fwd_ts"))
        .cast("long")
        .alias("matched_near_ts"),
        F.when(take_b, F.lit("b")).when(take_f, F.lit("f")).alias("near_src"),
        F.when(take_b, bgap).when(take_f, fgap).cast("long").alias("near_gap_s"),
        *[
            F.when(take_b, F.col(c)).when(take_f, F.col(fwd_ren[c])).alias(
                f"{c}_near"
            )
            for c in payload
        ],
    )


def asof_join_nearest_fused(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "entity",
    left_ts: str = "ts",
    right_ts: str = "ref_ts",
    version: str | None = "ref_version",
    payload: tuple[str, ...] = ("ref_features",),
) -> DataFrame:
    """asof_join_nearest in ONE union pass — the plan you'd want:
    both directions come from two window specs over the SAME
    (key)-partitioned exchange (ascending (ts, side, version) for
    the backward running-last, descending-ts for the forward one —
    the backfill_grid two-pass trick), so the whole nearest join is
    2 scans + 1 data exchange instead of the composed version's 4
    scans + 2 passes + an id re-join.  Tie rules identical to
    asof_join_nearest (equal-ts inclusive both sides, highest
    version wins, nearest ties -> backward); the equivalence is
    pytest-certified against the composed implementation.
    """
    lcols = left.columns
    ltypes = dict(left.dtypes)
    carry = list(payload) + ([version] if version else [])
    rtypes = dict(right.select(*carry).dtypes)

    r = right.select(
        F.col(key),
        F.col(right_ts).cast("long").alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_ts).cast("long").alias("__rts"),
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
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__rts"),
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in carry],
    )
    u = ldf.unionByName(r.select(*ldf.columns))

    ob = [F.col("__ts").asc(), F.col("__side").asc()]
    of = [F.col("__ts").desc(), F.col("__side").asc()]
    if version:
        ob.append(F.col(version).asc_nulls_first())
        of.append(F.col(version).asc_nulls_first())
    wb = (
        Window.partitionBy(key)
        .orderBy(*ob)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy(*of)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd_ren = {c: f"{c}_fwd" for c in payload}
    filled = u.select(
        *lcols,
        "__side",
        "__ts",
        F.last("__rts", ignorenulls=True).over(wb).alias("matched_ref_ts"),
        *[
            F.last(c, ignorenulls=True).over(wb).alias(c)
            for c in payload
        ],
        F.last("__rts", ignorenulls=True).over(wf).alias("matched_fwd_ts"),
        *[
            F.last(c, ignorenulls=True).over(wf).alias(fwd_ren[c])
            for c in payload
        ],
    )
    j = filled.where(F.col("__side") == 1)
    bgap = F.col("__ts") - F.col("matched_ref_ts")
    fgap = F.col("matched_fwd_ts") - F.col("__ts")
    take_b = F.col("matched_ref_ts").isNotNull() & (
        F.col("matched_fwd_ts").isNull() | (bgap <= fgap)
    )
    take_f = F.col("matched_fwd_ts").isNotNull() & ~take_b
    return j.select(
        *lcols,
        "matched_ref_ts",
        *payload,
        "matched_fwd_ts",
        *[fwd_ren[c] for c in payload],
        F.when(take_b, F.col("matched_ref_ts"))
        .when(take_f, F.col("matched_fwd_ts"))
        .cast("long")
        .alias("matched_near_ts"),
        F.when(take_b, F.lit("b")).when(take_f, F.lit("f")).alias("near_src"),
        F.when(take_b, bgap).when(take_f, fgap).cast("long").alias("near_gap_s"),
        *[
            F.when(take_b, F.col(c)).when(take_f, F.col(fwd_ren[c])).alias(
                f"{c}_near"
            )
            for c in payload
        ],
    )


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "entity",
    left_ts: str = "ts",
    right_ts: str = "ref_ts",
    version: str | None = "ref_version",
    payload: tuple[str, ...] = ("ref_features",),
    tolerance: int = 3600,
) -> DataFrame:
    """Backward as-of with a max-staleness tolerance (pandas
    merge_asof's `tolerance`; the feature-TTL rule: a reference
    older than `tolerance` seconds must NOT be used).  Exactly the
    union single-shuffle plan — the tolerance is a post-window
    column rewrite (match columns nulled beyond the window), so the
    physical plan is unchanged and the leakage guarantee is
    inherited.  Output adds within_tol (false when a match existed
    but was too stale; null when no match at all).
    """
    j = _asof_union(left, right, key, left_ts, right_ts, version, payload)
    gap = F.col(left_ts).cast("long") - F.col("matched_ref_ts")
    ok = gap <= tolerance
    carry = list(payload) + ([version] if version else [])
    return j.select(
        *[c for c in left.columns],
        F.when(ok, F.col("matched_ref_ts"))
        .cast("long")
        .alias("matched_ref_ts"),
        *[F.when(ok, F.col(c)).alias(c) for c in carry],
        F.when(F.col("matched_ref_ts").isNotNull(), ok).alias("within_tol"),
    )
