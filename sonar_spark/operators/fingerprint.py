"""MinHash / SimHash fingerprints + LSH near-duplicate detection
(SURVEY §2.7 Jaccard / M4; the compact-hash fingerprint role sketched
at reference fingerprint/comparison.go:74,91-106, estimating the
exact Jaccard of algorithms/stats/distance.go:198-216).

Physical design for 10^12 docs:
- signatures: narrow mapInArrow over the token table (no shuffle);
  one (a*x+b) mod p pass + minimum.reduceat per hash function.
- candidate pairs: explode to (band_idx, band_hash) — ONE shuffle on
  the band key — then within-bucket self-join. Bucket sizes are
  bounded by construction (identical band hash ≈ near-dups), so the
  quadratic blow-up stays local; a size cap guards pathological
  buckets (all-identical corpora).
- verification: signature agreement (mean of equal minhashes) is an
  unbiased Jaccard estimate; exact verification joins the token
  arrays back only for surviving pairs (tiny fraction).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import kernels
from ..config import MinHashConfig

_SIG_SCHEMA = (
    "doc_id string, source string, n_tok int, minhash array<long>, "
    "simhash long, bands array<long>"
)


def exact_dedup(
    df: DataFrame,
    fingerprint_col,
    *,
    keep_order: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Exact deduplication by content fingerprint (hash-groupBy): keep
    the first row per fingerprint by keep_order (deterministic), drop
    the rest. One shuffle on the fingerprint.

    fingerprint_col: a Column expression (e.g.
    functions.text.doc_fingerprint(F.col('text')))."""
    w = Window.partitionBy(fingerprint_col).orderBy(
        *[F.col(c).asc() for c in keep_order]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def minhash_fingerprints(
    df: DataFrame, cfg: MinHashConfig = MinHashConfig()
) -> DataFrame:
    """Token table -> (doc_id, source, n_tok, minhash[num_hashes],
    simhash, bands[bands]) — one narrow Arrow pass."""
    k, nh, nb, seed = cfg.k_shingle, cfg.num_hashes, cfg.bands, cfg.seed
    if nh % nb != 0:
        raise ValueError("num_hashes must be divisible by bands")

    def gen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            tok = batch.column(batch.schema.get_field_index("tokens"))
            lens = pc.list_value_length(tok).to_numpy().astype(np.int64)
            vals = tok.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            sig = kernels.minhash_batch(vals, lens, k, nh, seed)
            sim = kernels.simhash_batch(vals, lens, k)
            bh = kernels.band_hashes(sig, nb)
            n = len(lens)
            sig_arr = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int32) * nh),
                pa.array(sig.ravel()),
            )
            band_arr = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int32) * nb),
                pa.array(bh.ravel()),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("doc_id")),
                    batch.column(batch.schema.get_field_index("source")),
                    batch.column(batch.schema.get_field_index("n_tok")),
                    sig_arr,
                    pa.array(sim),
                    band_arr,
                ],
                names=["doc_id", "source", "n_tok", "minhash", "simhash", "bands"],
            )

    return df.select("doc_id", "tokens", "n_tok", "source").mapInArrow(
        gen, schema=_SIG_SCHEMA
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    cfg: MinHashConfig = MinHashConfig(),
    max_bucket: int = 1000,
) -> DataFrame:
    """Banded-LSH candidate pairs with estimated Jaccard.

    Output: (doc_a, doc_b, est_jaccard) with doc_a < doc_b, distinct.
    est_jaccard = fraction of agreeing minhash components (unbiased
    estimator of shingle-set Jaccard). One shuffle on the band key;
    buckets larger than max_bucket are dropped (logged upstream) —
    at web scale a bucket of identical band-hash >1000 docs means an
    exact-dup cluster better handled by the exact-dedup pass."""
    b = sig_df.select(
        "doc_id", "minhash", F.posexplode("bands").alias("band_idx", "band_hash")
    )
    # cap pathological buckets
    counted = b.withColumn(
        "__n", F.count("*").over(Window.partitionBy("band_idx", "band_hash"))
    ).where(F.col("__n") <= max_bucket)
    left = counted.select(
        F.col("band_idx"),
        F.col("band_hash"),
        F.col("doc_id").alias("doc_a"),
        F.col("minhash").alias("__mh_a"),
    )
    right = counted.select(
        F.col("band_idx"),
        F.col("band_hash"),
        F.col("doc_id").alias("doc_b"),
        F.col("minhash").alias("__mh_b"),
    )
    pairs = (
        left.join(right, ["band_idx", "band_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "__mh_a", "__mh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.aggregate(
        F.zip_with("__mh_a", "__mh_b", lambda x, y: (x == y).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.size("__mh_a")
    return pairs.withColumn("est_jaccard", est).drop("__mh_a", "__mh_b")


def near_duplicates(
    tokens_df: DataFrame,
    cfg: MinHashConfig = MinHashConfig(),
    threshold: float = 0.7,
) -> DataFrame:
    """End-to-end MinHash near-dup pass: signatures -> LSH candidates
    -> threshold on estimated Jaccard. Output (doc_a, doc_b,
    est_jaccard)."""
    sigs = minhash_fingerprints(tokens_df, cfg)
    return lsh_candidate_pairs(sigs, cfg).where(
        F.col("est_jaccard") >= threshold
    )


def simhash_near_duplicates(
    sig_df: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dups: pairs whose 64-bit signatures differ in at
    most max_hamming bits. Candidate generation by exact match on
    4 rotated 16-bit blocks (any pair within hamming 3 of 64 bits
    shares at least one identical 16-bit block by pigeonhole).
    Output (doc_a, doc_b, hamming)."""
    blocks = [
        (F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(0xFFFF)).alias(
            f"b{i}"
        )
        for i in range(4)
    ]
    s = sig_df.select("doc_id", "simhash", *blocks)
    out = None
    for i in range(4):
        l = s.select(
            F.col(f"b{i}").alias("key"),
            F.col("doc_id").alias("doc_a"),
            F.col("simhash").alias("__sa"),
        )
        r = s.select(
            F.col(f"b{i}").alias("key"),
            F.col("doc_id").alias("doc_b"),
            F.col("simhash").alias("__sb"),
        )
        p = l.join(r, "key").where(F.col("doc_a") < F.col("doc_b")).drop("key")
        out = p if out is None else out.unionByName(p)
    ham = F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb")))
    return (
        out.dropDuplicates(["doc_a", "doc_b"])
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .drop("__sa", "__sb")
    )


def connected_components(
    edges: DataFrame,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over a near-dup pair graph — the dedup
    GROUPING step the pair operators stop short of: every doc gets a
    component label (the minimum doc id reachable from it), so a
    curation pipeline can keep one canonical doc per duplicate
    cluster.

    Algorithm: iterative min-label propagation with pointer jumping
    (the hash-to-min family; Rastogi et al., "Finding Connected
    Components in Map-Reduce in Logarithmic Rounds").  Each round
    (a) takes the min label over each node's neighbors and (b)
    jumps labels through their own current label, halving the
    effective component diameter — O(log d) rounds to converge, each
    round two hash joins + one aggregation.  Near-dup LSH graphs are
    dense low-diameter clusters, so 2-3 rounds in practice; the
    driver-side loop is bounded by the convergence check (the same
    bounded-iteration shape as the k-means seeding).

    Input edges are de-duplicated and symmetrized internally.
    Output: (node, component); singleton nodes appear with
    component == node.  Pass ``stats={}`` to receive
    {"rounds": r, "changed": [per-round changed-label counts]} —
    the O(log d) evidence hook (tools/bench_cc_stress.py)."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
    for _ in range(max_iter):
        # (a) min over own label and neighbors' labels
        nbr = sym.join(
            labels.withColumnRenamed("node", "b").withColumnRenamed(
                "comp", "__nc"
            ),
            "b",
        ).select(F.col("a").alias("node"), F.col("__nc").alias("comp"))
        stepped = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # (b) pointer jumping: comp <- label(comp)
        # localCheckpoint truncates the lineage each round — an
        # iterative self-referencing plan otherwise deepens by two
        # joins per round and blows the analyzer stack (and would
        # re-plan the whole history at scale).  The previous label
        # rides along so the convergence count reads only the
        # checkpointed data (no extra join/recompute per round).
        jumped = (
            stepped.alias("l")
            .join(
                stepped.select(
                    F.col("node").alias("comp"),
                    F.col("comp").alias("__cc"),
                ).alias("r"),
                "comp",
                "left",
            )
            .join(labels.withColumnRenamed("comp", "__old"), "node")
            .select(
                "node",
                F.coalesce("__cc", "comp").alias("comp"),
                "__old",
            )
            .localCheckpoint(eager=True)
        )
        changed = jumped.where(F.col("comp") != F.col("__old")).count()
        labels.unpersist()
        labels = jumped.drop("__old")
        if stats is not None:
            stats.setdefault("changed", []).append(int(changed))
            stats["rounds"] = len(stats["changed"])
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("node", "comp")
