"""spark-submit entrypoint for the materialized curation pipeline:

    spark-submit --py-files sonar_spark.zip jobs/curation_job.py \
        --input /path/documents.parquet --output /path/curated \
        --buckets 16 --min-quality 0.5 --min-tokens 5 [--resume]

Phase 1 lands the corpus-global near-dup label table write-once under
<output>/labels; phase 2 lands the per-doc decision table bucketed
under <output>/decisions with per-bucket lineage markers; with
--chunks, phase 3 lands the training-ready chunk table under
<output>/chunks (window/stride sliding chunker over kept docs, its
own per-bucket markers).  Re-running skips committed buckets and
never re-runs the dedup shuffle.  Prints a one-line JSON summary.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--buckets", type=int, default=16)
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--jaccard", type=float, default=0.8)
    p.add_argument("--chunks", action="store_true",
                   help="also land the phase-3 chunk table")
    p.add_argument("--chunk-window", type=int, default=32)
    p.add_argument("--chunk-stride", type=int, default=24)
    p.add_argument("--resume", action="store_true",
                   help="skip buckets with existing lineage markers "
                        "(default behavior; flag kept for explicitness)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from sonar_spark.plans.curation import CurationJob, CurationPolicy

    spark = SparkSession.builder.appName("sonar-curation").getOrCreate()
    docs = spark.read.parquet(args.input)
    job = CurationJob(
        args.output,
        n_buckets=args.buckets,
        policy=CurationPolicy(
            min_quality=args.min_quality,
            min_tokens=args.min_tokens,
            jaccard=args.jaccard,
        ),
    )
    results = job.run(docs)
    done = [r for r in results if not r.skipped]
    skipped = [r for r in results if r.skipped]
    kept = sum(m.get("rows_kept", 0) for m in job.metrics())
    summary = {
        "buckets_total": args.buckets,
        "buckets_processed": len(done),
        "buckets_skipped": len(skipped),
        "rows_in": sum(r.rows_in for r in done),
        "rows_out": sum(r.rows_out for r in done),
        "rows_kept_total": kept,
        "wall_sec": round(sum(r.wall_sec for r in done), 3),
    }
    if args.chunks:
        cres = job.run_chunks(
            docs, window=args.chunk_window, stride=args.chunk_stride
        )
        cdone = [r for r in cres if not r.skipped]
        summary.update(
            chunk_buckets_processed=len(cdone),
            chunk_docs=sum(r.rows_in for r in cdone),
            chunk_rows=sum(r.rows_out for r in cdone),
            chunk_wall_sec=round(sum(r.wall_sec for r in cdone), 3),
        )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
