"""Plan audit: count Exchange / parquet-scan nodes in the formatted
plan and take warm wall timings for selected queries() entries.

Usage: python tools/plan_audit.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in args:
        fn = qs[name]
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exch = plan.count("Exchange")
        n_scan = plan.count("Scan parquet") + plan.count("FileScan parquet")
        n_mem = plan.count("InMemoryTableScan") + plan.count("TableCacheQueryStage")
        # warm timing: run once to warm, then time 2 runs
        df.count()
        times = []
        for _ in range(2):
            df2 = fn(spark, sf_dir)
            t0 = time.time()
            df2.count()
            times.append(time.time() - t0)
        print(
            f"{name:24s} exchanges={n_exch:3d} scans={n_scan:3d} "
            f"cached={n_mem:3d} warm={min(times):.2f}s"
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
