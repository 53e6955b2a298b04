"""Timeline stress: wall time vs event-table size for the
(entity, ts) operators — backfill_grid / grid_features (one entity
shuffle + window passes), asof_nearest (the FUSED single-exchange plan), ddsketch build (bucket-bounded agg).

Method: multiply the sf0.1 events table M times.  Two inflation
axes, because the operators bound differently:

- axis "entities" (default): copy k offsets user_id AND event_id —
  M times more entities, same per-entity timeline.  Wall should
  track the scan ~linearly; per-task window state stays constant.
- axis "depth": copy k offsets event_id and SHIFTS ts by k*31 days —
  same 1.5k entities, M times longer timelines (the hot-entity
  regime the asof bucketed strategy exists for).  Grid output grows
  M-fold too (span-linear); the windows stay single-pass.

Usage: python tools/bench_timeline_stress.py [sf_dir] [axis] [M...]
Writes BENCH/timeline_stress_{axis}.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def materialize(spark, sf_dir: str, m: int, axis: str) -> str:
    # cache keyed by sf_dir too — a _SUCCESS-only check would serve
    # a stale corpus when the tool is re-run at another scale
    tag = sf_dir.rstrip("/").replace("/", "_").lstrip("_")
    path = f"/tmp/sonar_timeline_stress_{tag}_{axis}_m{m}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        parts = []
        for k in range(m):
            p = ev.select(
                (F.col("event_id") + k * 10_000_000).alias("event_id"),
                (
                    F.col("ts")
                    + F.expr(f"INTERVAL {k * 31 if axis == 'depth' else 0} DAYS")
                ).alias("ts"),
                (
                    F.col("user_id")
                    + (0 if axis == "depth" else k * 1_000_000)
                ).alias("user_id"),
                "event_type",
                "value",
            )
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    from sonar_spark.functions.ddsketch import ddsketch_table
    from sonar_spark.operators.asof import asof_join_nearest_fused
    from sonar_spark.operators.backfill import backfill_grid, grid_features
    from sonar_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    axis = sys.argv[2] if len(sys.argv) > 2 else "entities"
    mults = [int(a) for a in sys.argv[3:]] or [1, 4, 16]

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    def ops(path):
        ev = spark.read.parquet(path)

        def _asof():
            e = ev.withColumn("ts_sec", F.unix_timestamp("ts"))
            left = e.where(F.col("event_type") == "purchase").select(
                "event_id", "user_id", "ts_sec"
            )
            right = (
                e.where(F.col("event_type") == "click")
                .groupBy("user_id", F.col("ts_sec").alias("ref_ts"))
                .agg(
                    F.max("event_id").alias("ref_version"),
                    F.round(F.max_by("value", "event_id"), 6).alias(
                        "ref_value"
                    ),
                )
            )
            return asof_join_nearest_fused(
                left,
                right,
                key="user_id",
                left_ts="ts_sec",
                right_ts="ref_ts",
                version="ref_version",
                payload=("ref_value",),
            )

        return {
            "backfill_grid": lambda: backfill_grid(ev, step=21600),
            "grid_features": lambda: grid_features(
                backfill_grid(ev, step=21600), window=8
            ),
            "asof_nearest": _asof,
            "ddsketch_build": lambda: ddsketch_table(
                ev.select(
                    "event_type",
                    F.floor(F.col("value") * 100 + 0.5)
                    .cast("long")
                    .alias("v"),
                ),
                ["event_type"],
                "v",
            ),
        }

    rows = []
    for m in mults:
        path = materialize(spark, sf_dir, m, axis)
        n_ev = spark.read.parquet(path).count()
        entry = {"multiplier": m, "axis": axis, "n_events": n_ev}
        for name, fn in ops(path).items():
            best = None
            for _ in range(2):
                t0 = time.time()
                fn().write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            entry[name] = round(best, 3)
        rows.append(entry)
        print(json.dumps(entry), flush=True)

    out = {
        "metric": "timeline_stress_wall_sec_vs_multiplier",
        "sf_dir": sf_dir,
        "rows": rows,
    }
    os.makedirs("BENCH", exist_ok=True)
    fname = f"BENCH/timeline_stress_{axis}.json"
    with open(fname, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
