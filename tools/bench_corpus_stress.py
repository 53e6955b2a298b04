"""Corpus-analytics stress benchmark: wall time vs corpus size for
the vocab-bounded token operators (round-5 additions).

Proves the design claim that pmi_collocations / vocab_stats /
mix_weights reduce the corpus to VOCAB-BOUNDED count tables via
map-side partial aggregation (so wall tracks the scan ~linearly and
the post-aggregation work is constant), and that chunk_tokens is a
pure one-scan zero-shuffle map whose output rows scale linearly.

Method: multiply the sf0.1 documents table M times (doc_ids offset
per copy, text unchanged — the vocab stays 31 terms by construction,
so any superlinear growth would be the operator's fault, not the
data's), write each multiplied corpus to parquet once (many splits —
the scan parallelizes), then time each operator warm (best of 2).

Usage: python tools/bench_corpus_stress.py [sf_dir] [multipliers...]
Writes BENCH/corpus_stress.json and prints one JSON line.
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


def materialize(spark, sf_dir: str, m: int) -> str:
    path = f"/tmp/sonar_corpus_stress_m{m}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        parts = []
        for k in range(m):
            parts.append(
                docs.select(
                    (F.col("doc_id") + k * 1_000_000).alias("doc_id"),
                    "text",
                    "source",
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    from sonar_spark.functions.corpus import (
        pmi_collocations,
        temperature_mix,
        vocab_stats,
    )
    from sonar_spark.functions.sketch import (
        cms_heavy_hitters,
        hll_distinct,
    )
    from sonar_spark.functions.ddsketch import (
        ddsketch_table as _ddsketch_table,
    )
    from sonar_spark.functions.sampling import weighted_sample
    from sonar_spark.operators.packing import chunk_documents
    from sonar_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(a) for a in sys.argv[2:]] or [1, 4, 16]

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    def words_df(path):
        d = spark.read.parquet(path)
        return d.select(
            "doc_id",
            "source",
            F.split(F.trim(F.col("text")), r"\s+").alias("words"),
        )

    ops = {
        "pmi_collocations": lambda d: pmi_collocations(
            d.select("words"), min_count=5, top_n=50
        ),
        "vocab_stats": lambda d: vocab_stats(d.select("source", "words")),
        "mix_weights": lambda d: temperature_mix(
            d.select("source", "words")
        ),
        "chunk_tokens": lambda d: chunk_documents(
            d.select("doc_id", "words"), window=16, stride=12
        ),
        "hll_distinct": lambda d: hll_distinct(
            d.select("source", "words")
        ),
        "cms_heavy_hitters": lambda d: cms_heavy_hitters(
            d.select("words")
        ),
        # round-5 session-5: the DDSketch build is one scan + a
        # BUCKET-BOUNDED groupBy (<= ~8*64 rows per group whatever
        # the corpus size) -> wall must track the scan, flat-ish
        # after fixed overhead
        "ddsketch_build": lambda d: _ddsketch_table(
            d.select(
                "source", F.size("words").cast("long").alias("v")
            ),
            ["source"],
            "v",
        ),
    }

    rows = []
    for m in mults:
        path = materialize(spark, sf_dir, m)
        n_docs = spark.read.parquet(path).count()
        entry = {"multiplier": m, "n_docs": n_docs}
        for name, fn in ops.items():
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(words_df(path)).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            entry[name] = round(best, 3)
        # weighted_sample reads the raw text column (token-slot
        # hashes): one scan -> per-doc max -> fixed k*strata output
        best = None
        for _ in range(2):
            t0 = time.time()
            weighted_sample(
                spark.read.parquet(path), k=5, strata_col="source"
            ).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        entry["weighted_sample"] = round(best, 3)
        rows.append(entry)
        print(json.dumps(entry), flush=True)

    out = {
        "metric": "corpus_stress_wall_sec_vs_multiplier",
        "sf_dir": sf_dir,
        "rows": rows,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/corpus_stress.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
