"""spark-submit entrypoint: materialize the shared feature tables
(the FeatureStore production path — on real infra each table is an
Iceberg table the composite queries read instead of re-deriving the
front end per query; measured A/B in BENCH/BASELINE.md "Round 5"):

    spark-submit --py-files sonar_spark.zip jobs/feature_store_job.py \
        --input /path/to/corpus_dir --store /path/to/feature_store \
        [--tables lpc4,formants,voice_quality]

``--input`` is a directory containing documents.parquet (the
pre-tokenized corpus); ``--store`` is the explicit table namespace
(write-once per table: re-running skips tables that already exist —
the resume semantics of plans/pipeline.FeatureStore).  Prints a
one-line JSON summary {table: rows}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local `python jobs/feature_store_job.py` convenience; under
# spark-submit --py-files the package ships on the PYTHONPATH anyway
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--store", required=True)
    p.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset of plans.feature_tables.BUILDERS "
             "(default: all)",
    )
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from sonar_spark.plans.feature_tables import BUILDERS, build_all
    from sonar_spark.plans.pipeline import FeatureStore

    tables = args.tables.split(",") if args.tables else None
    if tables:
        unknown = [t for t in tables if t not in BUILDERS]
        if unknown:
            print(f"unknown tables: {unknown}; known: {list(BUILDERS)}",
                  file=sys.stderr)
            return 2

    spark = SparkSession.builder.appName("sonar-feature-store").getOrCreate()
    store = FeatureStore(spark, args.store)
    counts = build_all(spark, args.input, store, tables)
    print(json.dumps({"store": args.store, "tables": counts}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
