"""Two-cluster-size scaling evidence (north_rule: throughput scaling
efficiency >= 0.8 going N -> 4N executors; sandbox proxy = local[8]
vs local[32] on byte-identical input, per SURVEY §6).

Runs the flagship featurize+asof pipeline in a fresh subprocess per
parallelism level (clean JVM each time), prints one JSON line and
appends a row to BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [n_docs] [n_low] [n_high]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "@@REPO@@")
from pyspark.sql import functions as F
from sonar_spark.session import get_spark
from sonar_spark.config import FeatureConfig
from bench import flagship_pipeline, materialize_tokens

cpus = int(sys.argv[1]); n_docs = int(sys.argv[2])
spark = get_spark("scaling-%d" % cpus, cpus=cpus)
path = materialize_tokens(spark, n_docs)
# scaling measures the PRODUCTION feature set (all 30 features incl.
# the spectral + MFCC families): that is what a real deployment runs,
# and its higher arithmetic intensity per input byte keeps the job
# kernel-bound rather than DRAM-bound on this shared-bus host
cfg = FeatureConfig()
# full-size warm-up: spawns every python worker and sizes their
# scratch pools; first-touch page faults must not pollute the timing
flagship_pipeline(spark, n_docs, path, feat_cfg=cfg).collect()
best, row = 1e18, None
for _ in range(4):
    t0 = time.time()
    row = flagship_pipeline(spark, n_docs, path, feat_cfg=cfg).collect()[0]
    best = min(best, time.time() - t0)
print(json.dumps({"cpus": cpus, "sec": best,
                  "docs_per_sec": n_docs / best,
                  "n_frames": row["n_frames"],
                  "sum_rms": float(row["sum_rms"])}))
"""


def run(cpus: int, n_docs: int) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", CHILD.replace("@@REPO@@", repo), str(cpus), str(n_docs)],
        capture_output=True, text=True, check=True, cwd=repo,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    lo = run(n_low, n_docs)
    hi = run(n_high, n_docs)
    assert lo["n_frames"] == hi["n_frames"], "results differ across parallelism!"
    # float reduction order differs with partitioning; allclose not equal
    # (SURVEY §7.4 determinism: tolerance-based comparison for global sums)
    rel = abs(lo["sum_rms"] - hi["sum_rms"]) / max(abs(lo["sum_rms"]), 1e-12)
    assert rel < 1e-9, f"results differ across parallelism (rel={rel})"
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (n_high / n_low)
    result = {
        "n_docs": n_docs,
        "low": lo,
        "high": hi,
        "speedup": round(hi["docs_per_sec"] / lo["docs_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump(result, f, indent=2)
    with open("BENCH/scaling_runs.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
