"""Per-query isolation bench (guide §1.4): times individual declared
queries with the noop sink at $SPARK_GRAFT_SF_DIR, optionally dumping
.explain("formatted") to a plans dir.  Does NOT replace bench.py (the
frozen driver contract) — this is the measurement harness for the
optimization round (OPTIMIZATION_r06.md cites these numbers).

Usage:
  python bench_extra.py [--sf DIR] [--plans DIR/suffix] [--reps N]
                        [--store] [query ...]

With no query names: the full bench.py query list.  --plans writes
plans/<dir>/<query>_<suffix>.txt for each query (e.g. --plans
r06/before).  Feature-store-backed queries need the store built once:
pass --store to (re)build it first (mirrors bench.py's fresh-store
semantics); without it the existing store (or inline derivation) is
used as-is.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from sonar_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "frame_energy", "frame_spectral", "mfcc_frames", "windowed_frames",
    "windowed_stats", "sessionize_gap", "asof_events", "asof_bucketed",
    "topk_orders", "embedding_knn", "percentiles_lineitem",
    "percentile_methods", "entropy_variants", "minhash_dedup",
    "compare_topk_lsh", "align_pairs", "ngram_jaccard", "ivf_knn",
    "chroma_pivot", "featurize_music", "pitch_tracked", "dedup_groups",
    "curation_filter", "winnow_fingerprints", "repetition_profile",
    "content_detect", "speech_analysis", "ivfpq_knn", "ngram_lm",
    "substring_dedup", "pack_sequences", "pii_scrub", "bpe_train",
    "tfidf_topk", "ngram_novelty", "bm25_rank", "dsir_select",
    "semdedup", "pmi_collocations", "vocab_stats", "chunk_tokens",
    "mix_weights", "source_divergence", "chunk_dedup", "hll_distinct",
    "cms_heavy_hitters", "bloom_decontaminate", "random_projection",
    "int8_quantize", "split_assign", "hll_merge", "pca_project",
    "quality_classifier", "backfill_grid", "asof_directions",
    "weighted_sample", "ddsketch_quantiles", "split_leakage_safe",
    "negative_pairs", "grid_features", "shard_balance",
    "hard_negatives", "incremental_dedup", "asof_tolerance",
    "epoch_expand",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None,
                    help="dir/suffix under plans/, e.g. r06/before")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--store", action="store_true",
                    help="rebuild the feature store first (timed)")
    ap.add_argument("--out", default=None, help="write JSON here too")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("sonar-spark-bench-extra", cpus=cpus)
    names = args.queries or DEFAULT_QUERIES

    timings: dict[str, float] = {}
    if args.store:
        import shutil
        store_dir = os.environ.get(
            "SONAR_FEATURE_STORE_DIR", "/tmp/sonar_feature_store")
        from sonar_spark.plans.feature_tables import build_all
        shutil.rmtree(store_dir, ignore_errors=True)
        t0 = time.time()
        build_all(spark, args.sf, E._store(spark, args.sf),
                  extra_roots=(lambda: E._dup_group_labels(spark, args.sf),))
        timings["feature_store_build"] = round(time.time() - t0, 3)
        print(f"feature_store_build  {timings['feature_store_build']:8.3f}s",
              flush=True)

    plans_dir = None
    if args.plans:
        sub, _, suffix = args.plans.partition("/")
        plans_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "plans", sub)
        os.makedirs(plans_dir, exist_ok=True)

    qs = E.queries()
    for name in names:
        if name not in qs:
            print(f"{name}: not in queries()", flush=True)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if plans_dir is not None:
            df = qs[name](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(txt)
        best, samples = None, []
        for _ in range(args.reps):
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode(
                "overwrite").save()
            dt = time.time() - t0
            samples.append(round(dt, 3))
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        print(f"{name:24s} {best:8.3f}s  samples={samples}", flush=True)
        spark.sparkContext.setJobDescription(None)

    total = round(sum(timings.values()), 3)
    out = {"sf": args.sf, "cpus": cpus, "total": total,
           "queries": timings}
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
