"""CurationJob stress: phase walls + kept-row invariance vs corpus
multiplication.

Multiplying the sf0.1 documents table M times (offset doc_ids, same
text) plants M-sized exact-duplicate components across buckets.  The
claims under test:

- phase 1 (labels: MinHash -> LSH -> verify -> CC) is the only stage
  whose cost tracks the duplicate-pair count (~M^2 per base doc);
- phase 2 (decisions) stays scan-linear — one pass + one join,
  whatever M did to the pair graph;
- rows_kept stays ~= the base corpus's kept count at every M: the
  pipeline collapses the M-fold inflation back to one canonical per
  component (the whole point of dedup in a curation run);
- phase 3 (chunks) tracks the KEPT corpus, not the inflated input —
  chunk rows and wall stay ~flat in M because the chunker only ever
  touches canonical survivors.

Usage: python tools/bench_curation_stress.py [sf_dir] [multipliers..]
Writes BENCH/curation_stress.json and prints one JSON line per M.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from tools.bench_corpus_stress import materialize  # noqa: E402


def main() -> None:
    from sonar_spark.plans.curation import CurationJob
    from sonar_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(a) for a in sys.argv[2:]] or [1, 4, 16]

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for m in mults:
        path = materialize(spark, sf_dir, m)
        docs = spark.read.parquet(path)
        out = f"/tmp/sonar_curation_stress_m{m}"
        shutil.rmtree(out, ignore_errors=True)
        job = CurationJob(out, n_buckets=16)
        t0 = time.time()
        job.ensure_labels(docs)
        t_labels = time.time() - t0
        t0 = time.time()
        job.run(docs)
        t_dec = time.time() - t0
        kept = sum(mm["rows_kept"] for mm in job.metrics())
        t0 = time.time()
        job.run_chunks(docs)
        t_chunks = time.time() - t0
        cm = job.chunk_metrics()
        entry = {
            "multiplier": m,
            "n_docs": docs.count(),
            "labels_sec": round(t_labels, 3),
            "decisions_sec": round(t_dec, 3),
            "rows_kept": kept,
            "chunks_sec": round(t_chunks, 3),
            "chunk_docs": sum(mm["n_docs"] for mm in cm),
            "chunk_rows": sum(mm["n_chunks"] for mm in cm),
            "chunk_tokens": sum(mm["tokens_out"] for mm in cm),
        }
        rows.append(entry)
        print(json.dumps(entry), flush=True)
        shutil.rmtree(out, ignore_errors=True)

    out = {
        "metric": "curation_job_phase_walls_vs_multiplier",
        "sf_dir": sf_dir,
        "rows": rows,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/curation_stress.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
