"""As-of join property tests: both strategies vs quadratic brute force;
zero temporal leakage; duplicate-ts tie-break; no-match nulls."""

from __future__ import annotations

import numpy as np
import pytest

from sonar_spark import datagen, oracle
from sonar_spark.config import AsofConfig
from sonar_spark.operators.asof import asof_join


def _left_df(spark, n_entities=6, rows_per_entity=40, max_ts=8192, seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    for e in range(n_entities):
        for ts in rng.integers(0, max_ts, size=rows_per_entity):
            rows.append((f"ent{e:04d}", int(ts), float(rng.random())))
    return spark.createDataFrame(rows, "entity string, ts long, val double")


def _check_vs_bruteforce(left_rows, right_rows, got_rows):
    want = oracle.asof_brute_force(
        [(r["entity"], r["ts"]) for r in left_rows],
        [(r["entity"], r["ref_ts"], r["ref_version"]) for r in right_rows],
    )
    assert len(got_rows) == len(left_rows)
    seen = set()
    for g in got_rows:
        k = (g["entity"], g["ts"], g["val"])
        seen.add((g["entity"], g["ts"]))
        exp = want[(g["entity"], g["ts"])]
        if exp is None:
            assert g["matched_ref_ts"] is None, k
            assert g["ref_features"] is None, k
        else:
            assert g["matched_ref_ts"] == exp[0], (k, g["matched_ref_ts"], exp)
            assert g["ref_version"] == exp[1], (k, g["ref_version"], exp)
            # zero temporal leakage
            assert g["matched_ref_ts"] <= g["ts"]
    assert seen == {(r["entity"], r["ts"]) for r in left_rows}


@pytest.mark.parametrize("strategy", ["union", "bucketed"])
def test_asof_matches_bruteforce(spark, strategy):
    left = _left_df(spark)
    right = datagen.catalog_table(spark, n_entities=6, rows_per_entity=12)
    got = asof_join(
        left,
        right,
        cfg=AsofConfig(bucket_width=1024),
        strategy=strategy,
    ).collect()
    _check_vs_bruteforce(left.collect(), right.collect(), got)


@pytest.mark.parametrize("strategy", ["union", "bucketed"])
def test_asof_duplicate_ts_takes_max_version(spark, strategy):
    left = spark.createDataFrame(
        [("e", 10, 1.0), ("e", 99, 2.0), ("e", 100, 3.0), ("e", 101, 4.0)],
        "entity string, ts long, val double",
    )
    right = spark.createDataFrame(
        [
            ("e", 100, 0, [1.0]),
            ("e", 100, 1, [2.0]),  # duplicate ts: version 1 must win
            ("e", 50, 0, [0.5]),
        ],
        "entity string, ref_ts long, ref_version int, ref_features array<double>",
    )
    got = {
        r["ts"]: r
        for r in asof_join(
            left, right, cfg=AsofConfig(bucket_width=64), strategy=strategy
        ).collect()
    }
    assert got[10]["matched_ref_ts"] is None
    assert got[99]["matched_ref_ts"] == 50
    assert got[100]["matched_ref_ts"] == 100 and got[100]["ref_version"] == 1
    assert list(got[100]["ref_features"]) == [2.0]
    assert got[101]["matched_ref_ts"] == 100 and got[101]["ref_version"] == 1


@pytest.mark.parametrize("strategy", ["union", "bucketed"])
def test_asof_bucket_boundaries(spark, strategy):
    """Predecessor several buckets back; empty middle buckets."""
    left = spark.createDataFrame(
        [("e", t, 0.0) for t in (0, 63, 64, 5000, 9001)],
        "entity string, ts long, val double",
    )
    right = spark.createDataFrame(
        [("e", 63, 0, [1.0]), ("e", 9000, 0, [2.0])],
        "entity string, ref_ts long, ref_version int, ref_features array<double>",
    )
    got = {
        r["ts"]: r["matched_ref_ts"]
        for r in asof_join(
            left, right, cfg=AsofConfig(bucket_width=64), strategy=strategy
        ).collect()
    }
    assert got == {0: None, 63: 63, 64: 63, 5000: 63, 9001: 9000}


def test_asof_bucketed_skew_spread(spark):
    """Hot entity's buckets land in multiple tasks (scale design):
    verify correctness when one entity dominates."""
    rng = np.random.default_rng(11)
    rows = [("hot", int(t), 0.0) for t in rng.integers(0, 1 << 16, size=4000)]
    rows += [("cold", int(t), 0.0) for t in rng.integers(0, 1 << 16, size=10)]
    left = spark.createDataFrame(rows, "entity string, ts long, val double")
    rrows = [("hot", int(t), i, [float(i)]) for i, t in enumerate(range(0, 1 << 16, 997))]
    rrows += [("cold", 5, 0, [9.0])]
    right = spark.createDataFrame(
        rrows, "entity string, ref_ts long, ref_version int, ref_features array<double>"
    )
    got = asof_join(
        left, right, cfg=AsofConfig(bucket_width=4096), strategy="bucketed"
    ).collect()
    want = oracle.asof_brute_force(
        [(e, t) for e, t, _ in rows], [(e, t, v) for e, t, v, _ in rrows]
    )
    assert len(got) == len(rows)
    for g in got:
        exp = want[(g["entity"], g["ts"])]
        if exp is None:
            assert g["matched_ref_ts"] is None
        else:
            assert (g["matched_ref_ts"], g["ref_version"]) == exp


def test_asof_bucketed_salted(spark):
    """cfg.salt > 1 splits left rows across salts with right-side
    replication — results identical to the brute force (north-star
    'salted skew splitting')."""
    left = _left_df(spark, n_entities=4, rows_per_entity=60)
    right = datagen.catalog_table(spark, n_entities=4, rows_per_entity=10)
    got = asof_join(
        left,
        right,
        cfg=AsofConfig(bucket_width=2048, salt=4),
        strategy="bucketed",
    ).collect()
    _check_vs_bruteforce(left.collect(), right.collect(), got)


def test_asof_bucketed_shard_larger_than_arrow_batch(spark):
    """Regression: a shard bigger than spark.sql.execution.arrow.
    maxRecordsPerBatch (10k) spans multiple Arrow batches inside one
    partition — the merge must carry its running last-right state
    across batch boundaries."""
    n = 60_000
    left = (
        spark.range(n)
        .selectExpr(
            "'hot' as entity",
            "cast(id * 7 % 100000 as long) as ts",
            "cast(0.0 as double) as val",
        )
    )
    rts = sorted(int(x) for x in np.random.default_rng(1).integers(0, 100000, 25))
    rrows = [("hot", t, i, [float(i)]) for i, t in enumerate(rts)]
    right = spark.createDataFrame(
        rrows, "entity string, ref_ts long, ref_version int, ref_features array<double>"
    )
    # ONE bucket => one 60k-row shard (forces multi-batch processing)
    got = asof_join(
        left, right, cfg=AsofConfig(bucket_width=1 << 40), strategy="bucketed"
    )
    # spot-check against the union strategy (exact same semantics)
    want = asof_join(left, right, strategy="union")
    g = got.groupBy("matched_ref_ts").count().collect()
    w = want.groupBy("matched_ref_ts").count().collect()
    gm = {r["matched_ref_ts"]: r["count"] for r in g}
    wm = {r["matched_ref_ts"]: r["count"] for r in w}
    assert gm == wm
    assert sum(v for k, v in gm.items() if k is not None) > n // 2


def test_asof_adaptive_empty_left(spark):
    """Adaptive bucket sizing must not crash on an empty left side
    (stats come back NULL); result is simply empty."""
    from sonar_spark.config import AsofConfig
    from sonar_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [], "entity string, ts long, payload double"
    )
    right = spark.createDataFrame(
        [("e1", 5, 1, [1.0])],
        "entity string, ref_ts long, ref_version int, ref_features array<double>",
    )
    out = asof_join(
        left, right, strategy="bucketed",
        cfg=AsofConfig(bucket_width=None),
    )
    assert out.count() == 0
