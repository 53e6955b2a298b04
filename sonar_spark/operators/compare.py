"""Fingerprint comparison + FindBestMatches top-k (SURVEY §2.8;
reference fingerprint/comparison.go:133-263).

Semantics reproduced:
- per-feature-group similarity, each reducing a (mean,std) stats
  vector pair to a cosine (compareSequenceStats, comparison.go:827-842)
  or a minhash-agreement estimate;
- weighted mean over groups by per-content weight table
  (comparison.go:1055-1104; token-domain groups energy/moments/minhash);
- content filter early-exit: differing source => similarity 0 row
  skipped before any math (comparison.go:160-166) — expressed as a
  join predicate so Catalyst pushes it into the join;
- match classification thresholds {.95,.85,.75,.6}
  (comparison.go:1040-1052);
- FindBestMatches: threshold filter + per-query rank, top
  max_candidates (comparison.go:197-263).

Physical: catalog side broadcast when small (local: always); the only
shuffle is the per-query top-k window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import ComparisonConfig
from ..functions.arrays import cosine_similarity
from .topk import topk_per_group

ENERGY_STATS = ["rms_energy_mean", "rms_energy_std", "crest_mean", "crest_std"]
MOMENT_STATS = [
    "mean_mean", "mean_std", "std_mean", "std_std",
    "skew_mean", "skew_std", "kurt_mean", "kurt_std",
]


def _stats_vec(prefix: str, cols: list[str]) -> Column:
    return F.array(*[F.col(f"{prefix}{c}").cast("double") for c in cols])


def match_class(sim: Column, cfg: ComparisonConfig) -> Column:
    """Reference match-class thresholds (comparison.go:1040-1052)."""
    t = cfg.thresholds
    return (
        F.when(sim >= t[0], "excellent")
        .when(sim >= t[1], "good")
        .when(sim >= t[2], "fair")
        .when(sim >= t[3], "poor")
        .otherwise("no_match")
    )


def compare_topk(
    query: DataFrame,
    catalog: DataFrame,
    cfg: ComparisonConfig = ComparisonConfig(),
    *,
    k: int | None = None,
    content_filter: bool = True,
    broadcast_catalog: bool = True,
) -> DataFrame:
    """query/catalog: doc_stats output joined with minhash column
    (doc_id, source, <feature>_mean/_std ..., minhash array<long>).

    Output: query_id, match_id, rank, similarity, match_class,
    sim_energy, sim_moments, sim_minhash."""
    k = k or cfg.max_candidates
    qcols = (
        [F.col("doc_id").alias("query_id"), F.col("source").alias("q_source")]
        + [F.col(c).alias(f"q_{c}") for c in ENERGY_STATS + MOMENT_STATS]
        + [F.col("minhash").alias("q_minhash")]
    )
    ccols = (
        [F.col("doc_id").alias("match_id"), F.col("source").alias("c_source")]
        + [F.col(c).alias(f"c_{c}") for c in ENERGY_STATS + MOMENT_STATS]
        + [F.col("minhash").alias("c_minhash")]
    )
    q = query.select(*qcols)
    c = catalog.select(*ccols)
    if broadcast_catalog:
        c = F.broadcast(c)
    cond = F.col("query_id") != F.col("match_id")
    if content_filter:
        # early-exit analog: pushed into the join, never scored
        cond = cond & (F.col("q_source") == F.col("c_source"))
    j = q.join(c, cond)

    sim_energy = cosine_similarity(
        _stats_vec("q_", ENERGY_STATS), _stats_vec("c_", ENERGY_STATS)
    )
    sim_moments = cosine_similarity(
        _stats_vec("q_", MOMENT_STATS), _stats_vec("c_", MOMENT_STATS)
    )
    sim_minhash = F.aggregate(
        F.zip_with("q_minhash", "c_minhash", lambda x, y: (x == y).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.size("q_minhash")

    # per-content weight table (comparison.go:1055-1104) as a literal
    # map resolved at plan build; weighted mean over present groups
    entries = []
    for src, w in cfg.weights.items():
        entries.append((src, (w["energy"], w["moments"], w["minhash"])))
    w_energy = F.coalesce(
        *[F.when(F.col("q_source") == s, F.lit(w[0])) for s, w in entries],
        F.lit(1 / 3),
    )
    w_moments = F.coalesce(
        *[F.when(F.col("q_source") == s, F.lit(w[1])) for s, w in entries],
        F.lit(1 / 3),
    )
    w_minhash = F.coalesce(
        *[F.when(F.col("q_source") == s, F.lit(w[2])) for s, w in entries],
        F.lit(1 / 3),
    )
    wsum = w_energy + w_moments + w_minhash
    sim = (
        w_energy * sim_energy + w_moments * sim_moments + w_minhash * sim_minhash
    ) / wsum

    # quality metrics (comparison.go:892-1037): noise = dispersion of
    # the per-group similarities; confidence = similarity damped by
    # noise (all groups are always available in this engine, so the
    # availability term is 1)
    mean3 = (sim_energy + sim_moments + sim_minhash) / 3.0
    noise = F.sqrt(
        (
            F.pow(sim_energy - mean3, 2)
            + F.pow(sim_moments - mean3, 2)
            + F.pow(sim_minhash - mean3, 2)
        )
        / 3.0
    )
    confidence = F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), sim * (1.0 - noise))
    )
    scored = j.select(
        "query_id",
        "match_id",
        sim_energy.alias("sim_energy"),
        sim_moments.alias("sim_moments"),
        sim_minhash.alias("sim_minhash"),
        sim.alias("similarity"),
        noise.alias("sim_noise"),
        confidence.alias("confidence"),
    ).where(F.col("similarity") >= cfg.similarity_threshold)
    ranked = topk_per_group(
        scored,
        "query_id",
        [F.col("similarity").desc(), F.col("match_id").asc()],
        k,
    )
    return ranked.withColumn(
        "match_class", match_class(F.col("similarity"), cfg)
    )


def similarity_statistics(results: DataFrame, sim: str = "similarity") -> DataFrame:
    """Summary statistics over comparison results per query
    (GetSimilarityStatistics, comparison.go:1154-1205): mean, min,
    max, median, std."""
    return results.groupBy("query_id").agg(
        F.count("*").alias("n"),
        F.avg(sim).alias("mean_sim"),
        F.min(sim).alias("min_sim"),
        F.max(sim).alias("max_sim"),
        F.percentile(sim, 0.5).alias("median_sim"),
        F.coalesce(F.stddev_pop(sim), F.lit(0.0)).alias("std_sim"),
    )
