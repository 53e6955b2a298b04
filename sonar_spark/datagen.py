"""Deterministic synthetic inputs (FIXTURES.md #1/#2): the token table
with the exact input_hint shape (doc_id, tokens array<int32>, n_tok,
source) and the as-of reference catalog (entity, ref_ts, ref_version,
ref_features).

Determinism is per-row (RNG seeded by doc index), so the generated
table is identical under any partitioning / parallelism — required for
the N-vs-4N scaling benchmark to run on byte-identical input.

Generation is distributed: spark.range(n) -> mapInPandas, so the same
code generates 100 docs for unit tests or millions for bench without a
driver-side bottleneck.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

VOCAB = 50_257
SOURCES = ("web", "books", "code", "news")

TOKENS_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"
CATALOG_SCHEMA = (
    "entity string, ref_ts long, ref_version int, ref_features array<double>"
)


def _doc_row(i: int, min_tok: int, max_tok: int, skew_doc: int | None):
    rng = np.random.default_rng(42 + i)
    # log-normal-ish length, clipped; plus forced edge docs (FIXTURES.md #1)
    if i == 0:
        n = 32  # < window W=64
    elif i == 1:
        n = 64  # == W
    elif i == 2:
        n = 64 + 16 - 1  # == W + H - 1 (frame-count boundary)
    elif skew_doc is not None and i == skew_doc:
        n = max_tok  # heavy-hitter doc for skew tests
    else:
        n = int(np.clip(np.exp(rng.normal(5.5, 0.8)), min_tok, max_tok))
    toks = rng.integers(0, VOCAB, size=n, dtype=np.int32)
    return (f"doc{i:08d}", toks, np.int32(n), SOURCES[i % 4])


def token_table(
    spark: SparkSession,
    n_docs: int = 100,
    min_tok: int = 32,
    max_tok: int = 8192,
    skew_doc: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic token table of input_hint shape."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_doc_row(int(i), min_tok, max_tok, skew_doc) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok", "source"])

    base = spark.range(n_docs)
    if partitions:
        base = base.repartition(partitions)
    return base.mapInPandas(gen, schema=TOKENS_SCHEMA)


def catalog_table(
    spark: SparkSession,
    n_entities: int = 16,
    rows_per_entity: int = 32,
    feat_dim: int = 13,
    max_ts: int = 8192,
) -> DataFrame:
    """Reference catalog (as-of right side). Irregular seeded timestamps
    including duplicate ts per entity (tie-break test) and a leading gap
    (no-match -> null test). ref_ts is in token-offset ticks."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for e in pdf["id"]:
                e = int(e)
                rng = np.random.default_rng(1042 + e)
                ts = np.sort(rng.integers(64, max_ts, size=rows_per_entity))
                if rows_per_entity >= 2:
                    ts[1] = ts[0]  # deliberate duplicate timestamp
                for v, t in enumerate(ts):
                    out.append(
                        (
                            f"ent{e:04d}",
                            int(t),
                            v,
                            rng.standard_normal(feat_dim).round(6).tolist(),
                        )
                    )
            yield pd.DataFrame(
                out, columns=["entity", "ref_ts", "ref_version", "ref_features"]
            )

    return spark.range(n_entities).mapInPandas(gen, schema=CATALOG_SCHEMA)


def entity_of(doc_id_col, n_entities: int = 16):
    """Map doc_id -> entity (many-to-one), deterministic; usable from
    Spark SQL via expressions. Matches numpy side entity_of_py."""
    from pyspark.sql import functions as F

    return F.format_string(
        "ent%04d", F.pmod(F.xxhash64(doc_id_col), F.lit(n_entities))
    )


def entity_of_py(doc_id: str, n_entities: int = 16, spark=None) -> str:
    """Driver/test-side equivalent of entity_of (uses Spark to evaluate
    xxhash64 so the mapping is identical)."""
    raise NotImplementedError("use entity_of on a DataFrame column")
