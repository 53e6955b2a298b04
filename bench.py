"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec}, "sf": ..., "throughput": {...}}

The flagship featurize+asof pipeline also reports sequences/sec
(BASELINE.json metric) over a deterministic generated token table
(sonar_spark.datagen — same bytes at any parallelism).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from sonar_spark import datagen  # noqa: E402
from sonar_spark.config import FeatureConfig, FrameConfig  # noqa: E402
from sonar_spark.operators.asof import asof_join  # noqa: E402
from sonar_spark.operators.features import frame_features_arrow  # noqa: E402
from sonar_spark.session import get_spark  # noqa: E402

# Flagship corpus size: raised 20k -> 320k in round 5 after an
# amortization study (BENCH/BASELINE.md "flagship N"): at 20k docs
# ~1.3 s of fixed stage/scheduling overhead dominated the ~0.5 s of
# actual work (11k docs/s); at 320k the pipeline reports 62k docs/s
# at 5.2 s wall — the overhead-amortized regime the 10^12-sequence
# north metric describes.  pipeline_docs in the JSON records N, and
# the 20k-docs number is kept in BASELINE.md for cross-round reads.
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "320000"))


def materialize_tokens(spark, n_docs: int, partitions: int = 64) -> str:
    """Write the deterministic input_hint token table to local parquet
    once (the Iceberg-table stand-in); returns the path. Reused across
    runs of the same size so bench times the PIPELINE, not datagen.
    Written as `partitions` files regardless of session parallelism so
    every parallelism level scans split-parallel WITHOUT a repartition
    shuffle (a 100 TB table arrives as thousands of splits)."""
    path = f"/tmp/sonar_bench_tokens_{n_docs}_p{partitions}"
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        toks = datagen.token_table(spark, n_docs=n_docs, partitions=partitions)
        toks.write.mode("overwrite").parquet(path)
    return path


# the round-1 15-feature workload, kept for bench continuity (the
# engine default has since grown the spectral + MFCC families; pass
# feat_cfg=FeatureConfig() for the full 30-feature production set)
CORE15 = FeatureConfig(enable_spectral=False, enable_mfcc=False)


def flagship_pipeline(
    spark, n_docs: int, tokens_path: str | None = None,
    feat_cfg: FeatureConfig = CORE15,
):
    """Featurize + as-of join over the input_hint token table — the
    BASELINE.json throughput pipeline (read -> frame features ->
    as-of join -> aggregate)."""
    if tokens_path is None:
        toks = datagen.token_table(
            spark, n_docs=n_docs,
            partitions=max(2, spark.sparkContext.defaultParallelism),
        )
    else:
        # materialize_tokens wrote 64 files, so the scan itself is
        # split-parallel at every core count — no repartition shuffle
        toks = spark.read.parquet(tokens_path)
    feats = frame_features_arrow(toks, FrameConfig(window=64, hop=16), feat_cfg)
    # project the join payload to what downstream needs — the as-of
    # join shuffles its left side, so column pruning here is the
    # difference between a 3-column and a 20-column shuffle (the final
    # aggregate never reads doc_id, so it does not ride the shuffle);
    # join keys as LONGs, not strings — same entity partition as the
    # 'ent%04d' labels, ~40% fewer shuffle bytes per row
    left = feats.select(
        "rms_energy",
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(64)).alias("entity"),
        F.col("frame_ts").alias("ts"),
    )
    catalog = datagen.catalog_table(
        spark, n_entities=64, rows_per_entity=128
    ).withColumn("entity", F.substring("entity", 4, 8).cast("long"))
    joined = asof_join(left, catalog, strategy="union")
    return joined.select(
        F.count("*").alias("n_frames"),
        F.sum(F.col("matched_ref_ts").isNotNull().cast("long")).alias("n_matched"),
        F.round(F.sum("rms_energy"), 3).alias("sum_rms"),
    )


def _host_context() -> tuple[float, float, float, int, int]:
    """(load1, load5, load15, steal_ticks, total_ticks) snapshot."""
    try:
        load1, load5, load15 = os.getloadavg()
    except OSError:
        load1 = load5 = load15 = -1.0
    steal = tot = 0
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        tot = sum(int(x) for x in parts[1:])
        steal = int(parts[8])
    except (OSError, IndexError, ValueError):
        pass
    return load1, load5, load15, steal, tot


def main() -> None:
    load1, load5, load15, steal0, tot0 = _host_context()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("sonar-spark-bench", cpus=cpus)

    timings: dict[str, float] = {}

    # headline 1: flagship featurize+asof throughput on the
    # pre-materialized token table (datagen excluded from timing;
    # one warm-up run spawns python workers + sizes scratch pools)
    tokens_path = materialize_tokens(spark, N_DOCS)
    flagship_pipeline(spark, N_DOCS, tokens_path).collect()
    t_flag = None
    for _ in range(2):  # best-of-2, same rationale as the queries
        t0 = time.time()
        row = flagship_pipeline(spark, N_DOCS, tokens_path).collect()[0]
        dt = time.time() - t0
        t_flag = dt if t_flag is None or dt < t_flag else t_flag
    timings["featurize_asof"] = round(t_flag, 3)
    n_frames = row["n_frames"]

    # feature-store materialization, timed as its OWN entry: the
    # shared front ends (frame rms, LPC, formants, onsets, voice
    # quality, histogram grid, HPCP) are built once here; every
    # store-backed query below then reads the materialized tables —
    # the at-100x architecture measured honestly (build cost visible,
    # not hidden inside whichever query ran first).  A fresh store is
    # forced so re-runs of bench.py cannot inherit a warm store.
    import shutil

    store_dir = os.environ.get(
        "SONAR_FEATURE_STORE_DIR", "/tmp/sonar_feature_store"
    )
    if os.environ.get("SONAR_FEATURE_STORE", "1").lower() not in ("0", "off"):
        from sonar_spark.plans.feature_tables import build_all

        shutil.rmtree(store_dir, ignore_errors=True)
        t0 = time.time()
        # dependency-ordered waves of CONCURRENT builds (dup_labels is
        # an independent root living in the entry module)
        build_all(
            spark,
            sf_dir,
            E._store(spark, sf_dir),
            extra_roots=(lambda: E._dup_group_labels(spark, sf_dir),),
        )
        timings["feature_store_build"] = round(time.time() - t0, 3)

    # headline 2..n: driver queries on the sf parquet tables
    qs = E.queries()
    for name in (
        "frame_energy",
        "frame_spectral",
        "mfcc_frames",
        "windowed_frames",
        "windowed_stats",
        "sessionize_gap",
        "asof_events",
        "asof_bucketed",
        "topk_orders",
        "embedding_knn",
        "percentiles_lineitem",
        "percentile_methods",
        "entropy_variants",
        "minhash_dedup",
        "compare_topk_lsh",
        "align_pairs",
        "ngram_jaccard",
        "ivf_knn",
        "chroma_pivot",
        "featurize_music",
        "pitch_tracked",
        # LLM-curation composites (r4 verdict #5: flagship pipeline
        # ops deserve tracked sf0.1 numbers like everything else)
        "dedup_groups",
        "curation_filter",
        "winnow_fingerprints",
        "repetition_profile",
        "content_detect",
        "speech_analysis",
        "ivfpq_knn",
        # round-5 token-axis curation additions
        "ngram_lm",
        "substring_dedup",
        "pack_sequences",
        "pii_scrub",
        "bpe_train",
        "tfidf_topk",
        "ngram_novelty",
        "bm25_rank",
        "dsir_select",
        "semdedup",
        "pmi_collocations",
        "vocab_stats",
        "chunk_tokens",
        "mix_weights",
        "source_divergence",
        "chunk_dedup",
        "hll_distinct",
        "cms_heavy_hitters",
        "bloom_decontaminate",
        "random_projection",
        "int8_quantize",
        "split_assign",
        "hll_merge",
        "pca_project",
        "quality_classifier",
        # round-5 session-5 additions: the backfill/as-of direction
        # surface + sampling/sketch primitives
        "backfill_grid",
        "asof_directions",
        "weighted_sample",
        "ddsketch_quantiles",
        "split_leakage_safe",
        "negative_pairs",
        "grid_features",
        "shard_balance",
        "hard_negatives",
        "incremental_dedup",
        "asof_tolerance",
        "epoch_expand",
    ):
        if name not in qs:
            continue
        # best-of-2: the sandbox host carries external load spikes
        # (observed 20-400% per-query swings with an idle local
        # process table); the min of two runs reports steady-state
        best = None
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    # host-context telemetry (r4 verdict #7: cross-round comparisons
    # need the load context recorded next to the numbers — r3->r4
    # showed 1.3-2x across-the-board swings from external host load);
    # loadavg at START (before bench's own 32-core load) + steal %
    # over the bench window.
    _, _, _, steal1, tot1 = _host_context()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / (tot1 - tot0), 2)
        if tot1 > tot0
        else -1.0
    )
    out = {
        "metric": (
            "headline query wall time (featurize+asof pipeline + driver "
            "queries; best-of-2 per query; feature_store_build = one-time "
            f"shared front-end materialization; loadavg_start={load1:.2f}/"
            f"{load5:.2f}/{load15:.2f} steal_window={steal_pct}%)"
        ),
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "throughput": {
            "pipeline_docs": N_DOCS,
            "pipeline_frames": int(n_frames),
            "docs_per_sec": round(N_DOCS / t_flag, 1),
            "frames_per_sec": round(n_frames / t_flag, 1),
            "cpus": cpus,
        },
        "host": {
            "loadavg": [round(load1, 2), round(load5, 2), round(load15, 2)],
            "steal_cum_pct": steal_pct,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
