"""Feature-store scale stress: build cost and store-warm composite
query cost at 1x vs Mx corpus size (default 8x) — the does-this-hold-
at-100x evidence for the materialized-feature-table architecture.

The Mx corpus is M doc_id-offset copies of the sf documents table
written once to /tmp (deterministic).  Measures:
- store build wall at 1x vs Mx (expect ~linear in docs: every builder
  is one scan + per-doc work, no cross-doc joins),
- speech_analysis warm wall at 1x vs Mx (expect sub-linear wall on
  32 cores until they saturate: per-doc work is embarrassingly
  parallel; the per-query cost that does NOT scale with the corpus —
  job/stage fixed overhead — shows as the 1x floor).

Usage: python tools/bench_store_scale.py [sf_dir] [multiplier]
Writes BENCH/store_scale.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def make_corpus(spark: SparkSession, sf_dir: str, m: int) -> str:
    """Mx documents table: doc_id offset by 100000*k per copy."""
    out = f"/tmp/sonar_store_scale_{os.path.basename(sf_dir.rstrip('/'))}_x{m}"
    if not os.path.exists(os.path.join(out, "documents.parquet", "_SUCCESS")):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        parts = [
            docs.withColumn(
                "doc_id", (F.col("doc_id") + 100000 * k).cast(docs.schema["doc_id"].dataType)
            )
            for k in range(m)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet")
        )
    return out


def run_at(spark: SparkSession, sf_dir: str, label: str) -> dict:
    import __spark_entry__ as E

    shutil.rmtree("/tmp/sonar_feature_store", ignore_errors=True)
    n_docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).count()
    t0 = time.time()
    for h in (
        E._doc_frame_rms,
        E._lpc_coeffs,
        E._formants_df,
        E._onsets_df,
        E._voice_quality_df,
    ):
        h(spark, sf_dir)
    build = time.time() - t0
    qs = E.queries()
    fn = qs["speech_analysis"]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(3):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(round(time.time() - t0, 3))
    return {
        "label": label,
        "n_docs": int(n_docs),
        "store_build_sec": round(build, 2),
        "speech_analysis_warm_sec": min(runs),
        "speech_analysis_runs": runs,
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    m = int(args[0]) if args else 8

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("store-scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    big_dir = make_corpus(spark, sf_dir, m)
    one = run_at(spark, sf_dir, "1x")
    big = run_at(spark, big_dir, f"{m}x")
    shutil.rmtree("/tmp/sonar_feature_store", ignore_errors=True)
    out = {
        "metric": "feature-store build + composite warm cost, 1x vs Mx corpus",
        "loadavg": list(os.getloadavg()),
        "runs": [one, big],
        "build_scale_factor": round(
            big["store_build_sec"] / max(one["store_build_sec"], 1e-9), 2
        ),
        "query_scale_factor": round(
            big["speech_analysis_warm_sec"]
            / max(one["speech_analysis_warm_sec"], 1e-9),
            2,
        ),
        "corpus_multiplier": m,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/store_scale.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
