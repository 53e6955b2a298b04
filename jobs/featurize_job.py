"""spark-submit entrypoint (north_rule launch mode):

    spark-submit --py-files sonar_spark.zip jobs/featurize_job.py \
        --input /path/tokens.parquet --output /path/features \
        --window 64 --hop 16 --buckets 16 [--resume]

Reads the input_hint token table, runs the resumable featurize
pipeline (per-bucket lineage markers under <output>/_lineage/), and
prints a one-line JSON summary. Re-running with --resume skips
completed buckets.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--window", type=int, default=64)
    p.add_argument("--hop", type=int, default=16)
    p.add_argument("--buckets", type=int, default=16)
    p.add_argument("--resume", action="store_true",
                   help="skip buckets with existing lineage markers "
                        "(default behavior; flag kept for explicitness)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from sonar_spark.config import FrameConfig
    from sonar_spark.plans.pipeline import FeaturizeJob

    spark = SparkSession.builder.appName("sonar-featurize").getOrCreate()
    tokens = spark.read.parquet(args.input)
    job = FeaturizeJob(
        args.output,
        n_buckets=args.buckets,
        frame_cfg=FrameConfig(window=args.window, hop=args.hop),
    )
    results = job.run(tokens)
    done = [r for r in results if not r.skipped]
    skipped = [r for r in results if r.skipped]
    summary = {
        "buckets_total": args.buckets,
        "buckets_processed": len(done),
        "buckets_skipped": len(skipped),
        "rows_in": sum(r.rows_in for r in done),
        "rows_out": sum(r.rows_out for r in done),
        "wall_sec": round(sum(r.wall_sec for r in done), 3),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
