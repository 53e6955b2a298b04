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
    *,
    with_est: bool = True,
) -> DataFrame:
    """Banded-LSH candidate pairs with estimated Jaccard.

    Output: (doc_a, doc_b[, est_jaccard]) with doc_a < doc_b,
    distinct.  est_jaccard = fraction of agreeing minhash components
    (unbiased estimator of shingle-set Jaccard). One shuffle on the
    band key; buckets larger than max_bucket are dropped (logged
    upstream) — at web scale a bucket of identical band-hash >1000
    docs means an exact-dup cluster better handled by the exact-dedup
    pass.  with_est=False skips attaching the signature arrays to the
    survivors (r6) — every production caller consumes only the pair
    ids and verifies with exact Jaccard, so the two signature joins
    are pure overhead there."""
    # r6 (guide §2.3 "shuffle keys and metadata instead of
    # payloads"): the band explode used to CARRY the 64-long minhash
    # array — a 32x amplification of a ~512 B payload through the
    # bucket-cap window AND both self-join sides.  Now only
    # (doc_id, band_idx, band_hash) rides the band shuffle; the
    # signatures are attached to the DEDUPED surviving pairs by two
    # joins against the (narrow, per-doc) signature table, which AQE
    # broadcasts when it fits.  est_jaccard arithmetic is unchanged.
    b = sig_df.select(
        "doc_id", F.posexplode("bands").alias("band_idx", "band_hash")
    )
    # cap pathological buckets
    counted = b.withColumn(
        "__n", F.count("*").over(Window.partitionBy("band_idx", "band_hash"))
    ).where(F.col("__n") <= max_bucket)
    left = counted.select(
        F.col("band_idx"),
        F.col("band_hash"),
        F.col("doc_id").alias("doc_a"),
    )
    right = counted.select(
        F.col("band_idx"),
        F.col("band_hash"),
        F.col("doc_id").alias("doc_b"),
    )
    pairs = (
        left.join(right, ["band_idx", "band_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    if not with_est:
        return pairs
    mh = sig_df.select("doc_id", "minhash")
    pairs = pairs.join(
        mh.select(
            F.col("doc_id").alias("doc_a"), F.col("minhash").alias("__mh_a")
        ),
        "doc_a",
    ).join(
        mh.select(
            F.col("doc_id").alias("doc_b"), F.col("minhash").alias("__mh_b")
        ),
        "doc_b",
    )
    est = F.aggregate(
        F.zip_with("__mh_a", "__mh_b", lambda x, y: (x == y).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.size("__mh_a")
    # explicit order: the using-column joins above hoist doc_b first
    return pairs.select(
        "doc_a", "doc_b", est.alias("est_jaccard")
    )


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


def winnow_fingerprints(
    words_df: DataFrame,
    *,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    words_col: str = "words",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD 2003 — the MOSS scheme; the rolling-hash fingerprint
    family next to MinHash/SimHash, reference
    fingerprint/comparison.go:74 compact-hash role).

    Per doc: hash every k-token shingle (md5-prefix — identical in
    Spark and DuckDB, the cross-engine convention), then slide a
    window of ``w`` consecutive hashes and select each window's
    minimum, ties to the RIGHTMOST occurrence (the paper's rule);
    the distinct selected (hash, position) pairs are the doc's
    fingerprints.  Guarantee: any shared token run of length
    >= w + k - 1 between two docs yields at least one shared
    fingerprint; expected density 2/(w+1).

    Physical plan: one shuffle (window partitionBy doc) — shingling
    and hashing are narrow projections, the per-window argmin is a
    running ``min(struct(hash, -pos))`` window frame in whole-stage
    codegen, no UDFs.  Docs shorter than k tokens hash their whole
    text as one shingle; shingle counts shorter than w winnow as a
    single window (clamped frame).

    Returns (id_col, fp long, pos long) — pos is the 1-based shingle
    index the fingerprint was selected at."""
    words = F.col(words_col)
    n_sh = F.greatest(F.size(words) - (k - 1), F.lit(1))
    shingled = words_df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), n_sh),
                lambda i: F.concat_ws(" ", F.slice(words, i, k)),
            )
        ).alias("__p0", "__sh"),
    )
    hashed = shingled.select(
        id_col,
        (F.col("__p0") + 1).alias("pos"),
        F.conv(F.substring(F.md5("__sh"), 1, 8), 16, 10)
        .cast("long")
        .alias("__h"),
    )
    bypos = Window.partitionBy(id_col).orderBy("pos")
    sel = hashed.select(
        id_col,
        "pos",
        F.min(F.struct(F.col("__h"), (-F.col("pos")).alias("__np")))
        .over(bypos.rowsBetween(0, w - 1))
        .alias("__s"),
        F.count("*").over(Window.partitionBy(id_col)).alias("__ns"),
    )
    return (
        sel.where(
            F.col("pos") <= F.greatest(F.col("__ns") - (w - 1), F.lit(1))
        )
        .select(
            id_col,
            F.col("__s.__h").alias("fp"),
            (-F.col("__s.__np")).cast("long").alias("pos"),
        )
        .distinct()
    )


def fingerprint_matches(
    fps: DataFrame,
    *,
    id_col: str = "doc_id",
    max_doc_freq: int = 8,
    min_shared: int = 3,
) -> DataFrame:
    """Cross-doc matches over a winnowing fingerprint table: pairs of
    docs sharing >= min_shared fingerprints, with the shared count
    and the containment-style overlap n_shared / min(|fp_a|, |fp_b|).

    Scale path: fingerprints occurring in more than ``max_doc_freq``
    docs are dropped before pairing (the standard stop-fingerprint
    cap — boilerplate shingles match everything and carry no
    signal), which bounds every join bucket at max_doc_freq rows, so
    candidate pairs are linear in the fingerprint table, never
    quadratic in the corpus.  Per-doc fingerprint counts (the
    overlap denominator) are computed on the UNCAPPED table — a doc
    property, independent of the cap.

    Plan shape: both counts are window aggregates over ONE
    derivation of the fingerprint table (doc-key then fp-key
    shuffle), annotated before the self-join so the denominators
    ride the join rows — no join-back.  The annotated table is
    persisted: a self-join is inherently two consumers, and without
    it Catalyst re-derives the whole upstream fingerprint subtree
    once per branch (at 100x this table is a landed store/Iceberg
    artifact, exactly like the dedup label table, and the persist
    becomes that materialization)."""
    docfp = fps.select(id_col, "fp").distinct()
    ann = (
        docfp.withColumn(
            "__n_fp", F.count("*").over(Window.partitionBy(id_col))
        )
        .withColumn(
            "__df", F.count("*").over(Window.partitionBy("fp"))
        )
        .where(F.col("__df") <= max_doc_freq)
        .select(id_col, "fp", "__n_fp")
        .persist()
    )
    a = ann.select(
        "fp", F.col(id_col).alias("doc_a"), F.col("__n_fp").alias("__na")
    )
    b = ann.select(
        "fp", F.col(id_col).alias("doc_b"), F.col("__n_fp").alias("__nb")
    )
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count("*").alias("n_shared"),
            F.max("__na").alias("__na"),
            F.max("__nb").alias("__nb"),
        )
        .where(F.col("n_shared") >= min_shared)
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(
                F.col("n_shared") / F.least("__na", "__nb"), 6
            ).alias("overlap"),
        )
    )


def _gram_hash_stream(
    docs: DataFrame,
    *,
    k: int,
    id_col: str,
    words_col: str,
    positions: bool,
) -> DataFrame:
    """Arrow kernel emitting the token k-gram stream of every doc
    with >= k tokens as STABLE 64-bit hashes (blake2b-8 of the
    space-joined gram — process-independent, unlike Python's builtin
    hash) instead of gram strings (r6, guide §2.3 'shuffle narrower
    types' + §4.2): the Catalyst form built each gram with an
    interpreted transform/concat_ws lambda and shuffled ~30-byte
    strings; this emits 8-byte keys from vectorized-ish Python and
    cuts both the per-row compute and the shuffle width.

    positions=True -> (id, pos, h) one row per gram instance
    (1-based pos, the substring_spans contract); False -> (id, h, c)
    per-doc gram-hash counts (the ngram_novelty contract — map-side
    dedup before any shuffle).

    Hash-collision safety: downstream consumers group/join on h where
    the expression forms used the gram string; a 64-bit collision
    between two distinct grams in one corpus could change results.
    tests/test_fingerprint_gram_kernels.py certifies output equality
    vs the retained *_expr forms on the real corpora (and the DuckDB
    value oracles replay the string form end-to-end); the birthday
    bound at the ~1e6-distinct-gram scale of these corpora is ~1e-7.
    """
    from collections.abc import Iterator
    from hashlib import blake2b

    import pandas as pd

    id_type = docs.schema[id_col].dataType.simpleString()

    def gen(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        for pdf in pdfs:
            if not len(pdf):
                continue
            if positions:
                ids, poss, hs = [], [], []
                for did, ws in zip(pdf[id_col], pdf[words_col]):
                    n = len(ws)
                    if n < k:
                        continue
                    ws = list(ws)
                    for i in range(n - k + 1):
                        h = int.from_bytes(
                            blake2b(
                                " ".join(ws[i:i + k]).encode(),
                                digest_size=8,
                            ).digest(),
                            "big",
                            signed=True,
                        )
                        ids.append(did)
                        poss.append(i + 1)
                        hs.append(h)
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "pos": np.asarray(poss, dtype=np.int64),
                        "h": np.asarray(hs, dtype=np.int64),
                    }
                )
            else:
                ids, hs, cs = [], [], []
                for did, ws in zip(pdf[id_col], pdf[words_col]):
                    n = len(ws)
                    if n < k:
                        continue
                    ws = list(ws)
                    cnt = Counter(
                        int.from_bytes(
                            blake2b(
                                " ".join(ws[i:i + k]).encode(),
                                digest_size=8,
                            ).digest(),
                            "big",
                            signed=True,
                        )
                        for i in range(n - k + 1)
                    )
                    for h, c in cnt.items():
                        ids.append(did)
                        hs.append(h)
                        cs.append(c)
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "h": np.asarray(hs, dtype=np.int64),
                        "c": np.asarray(cs, dtype=np.int64),
                    }
                )

    schema = (
        f"{id_col} {id_type}, pos long, h long"
        if positions
        else f"{id_col} {id_type}, h long, c long"
    )
    return docs.select(id_col, words_col).mapInPandas(gen, schema=schema)


def shingle_hash_table(
    docs: DataFrame,
    *,
    k: int = 4,
    id_col: str = "doc_id",
    words_col: str = "words",
    out_col: str = "sh",
) -> DataFrame:
    """(id, sh array<long>): each doc's DISTINCT word-k-gram shingles
    as stable blake2b-64 hashes — the r6 drop-in for the Catalyst
    string-shingle arrays at every exact-Jaccard VERIFICATION site
    (guide §2.3/§4.2): |A ∩ B| and |A ∪ B| over the hashed sets equal
    the string-set sizes whenever the hash is collision-free on the
    corpus (certified per-corpus by
    tests/test_fingerprint_gram_kernels.py::test_shingle_hash_jaccard
    _equals_string, plus every consumer's DuckDB value oracle, which
    replays the STRING form end-to-end), while the interpreted
    transform+concat_ws build and the string-array intersect/union
    disappear.  Shingle rule matches _shingles4/sh4: positions
    1..max(n-k+1, 1), short docs yield one clamped shingle,
    duplicates dropped.  NOT for consumers whose VALUES depend on the
    shingle bytes (the Bloom md5 bit table keeps strings)."""
    from collections.abc import Iterator
    from hashlib import blake2b

    import pandas as pd

    id_type = docs.schema[id_col].dataType.simpleString()

    def gen(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if not len(pdf):
                continue
            ids, shs = [], []
            for did, ws in zip(pdf[id_col], pdf[words_col]):
                ws = list(ws)
                m = max(len(ws) - (k - 1), 1)
                seen = dict.fromkeys(
                    int.from_bytes(
                        blake2b(
                            " ".join(ws[i:i + k]).encode(),
                            digest_size=8,
                        ).digest(),
                        "big",
                        signed=True,
                    )
                    for i in range(m)
                )
                ids.append(did)
                shs.append(np.fromiter(seen, dtype=np.int64))
            yield pd.DataFrame({id_col: ids, out_col: shs})

    return docs.select(id_col, words_col).mapInPandas(
        gen, schema=f"{id_col} {id_type}, {out_col} array<long>"
    )


def substring_spans(
    docs: DataFrame,
    *,
    k: int = 4,
    id_col: str = "doc_id",
    words_col: str = "words",
) -> DataFrame:
    """Exact duplicated-substring detection — the span-level dedup
    from Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better"): a token k-gram occurring more than once
    corpus-wide (across docs OR repeated inside one doc) marks its k
    covering tokens as duplicated text; overlapping marked k-grams
    merge into maximal spans.  This is the op document-level dedup
    (exact_dedup / minhash) cannot express: boilerplate shared by
    otherwise-distinct pages.  The scalable formulation replaces the
    paper's suffix array with k-gram counting: one shuffle to count
    k-grams, one per-doc window pass to merge spans — no pairwise
    stage, no suffix structure, so it survives 100 TB (the paper's
    own follow-ups, e.g. RedPajama-v2, ship exactly this relational
    form).

    Per doc: number of maximal duplicated spans, duplicated-token
    count and fraction, and the longest span — the columns a curation
    policy trims or drops on.

    r6 plan: the gram stream comes from the _gram_hash_stream Arrow
    kernel as 8-byte hashes (was: interpreted struct/concat_ws
    lambdas + ~30-byte string shuffle keys), the dup table joins back
    on the hash (AQE broadcasts it), and only (id, pos) rows reach
    the per-doc window.  Output-equality vs the retained string form
    is certified by tests/test_fingerprint_gram_kernels.py.
    """
    words = F.col(words_col)
    base = docs.select(
        id_col, F.size(words).cast("long").alias("n_tokens")
    )
    grams = _gram_hash_stream(
        docs, k=k, id_col=id_col, words_col=words_col, positions=True
    )
    dup = grams.groupBy("h").agg(F.count("*").alias("__tot")).where(
        F.col("__tot") >= 2
    )
    hits = grams.join(dup.select("h"), "h").select(id_col, "pos")
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    flagged = hits.select(
        id_col,
        "pos",
        # a new token run starts iff this gram's coverage [pos, pos+k-1]
        # neither overlaps nor touches the previous one's: pos > prev + k
        F.when(
            F.lag("pos").over(w_doc).isNull()
            | (F.col("pos") > F.lag("pos").over(w_doc) + k),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("__new"),
    )
    spans = flagged.select(
        id_col,
        "pos",
        F.sum("__new").over(w_doc).alias("__span"),
    ).groupBy(id_col, "__span").agg(
        (F.max("pos") + (k - 1) - F.min("pos") + 1).cast("long").alias("__len")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_dup_spans"),
        F.sum("__len").cast("long").alias("dup_tokens"),
        F.max("__len").cast("long").alias("longest_dup_span"),
    )
    out = base.join(per_doc, id_col, "left")
    return out.select(
        id_col,
        "n_tokens",
        F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.coalesce("longest_dup_span", F.lit(0)).cast("long").alias(
            "longest_dup_span"
        ),
        F.round(
            F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"), 6
        ).alias("dup_token_frac"),
    )


def substring_spans_expr(
    docs: DataFrame,
    *,
    k: int = 4,
    id_col: str = "doc_id",
    words_col: str = "words",
) -> DataFrame:
    """The original string-keyed Catalyst form of substring_spans —
    retained as the in-engine oracle for the gram-hash kernel swap
    (tests/test_fingerprint_gram_kernels.py)."""
    words = F.col(words_col)
    base = docs.select(
        id_col, F.size(words).cast("long").alias("n_tokens"), words.alias("__ws")
    )
    grams = base.where(F.col("n_tokens") >= k).select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), (F.col("n_tokens") - (k - 1)).cast("int")),
                lambda i: F.struct(
                    i.alias("pos"), F.concat_ws(" ", F.slice("__ws", i, k)).alias("s")
                ),
            )
        ).alias("g"),
    ).select(id_col, F.col("g.pos").alias("pos"), F.col("g.s").alias("s"))
    dup = grams.groupBy("s").agg(F.count("*").alias("__tot")).where(
        F.col("__tot") >= 2
    )
    hits = grams.join(dup.select("s"), "s")
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    flagged = hits.select(
        id_col,
        "pos",
        F.when(
            F.lag("pos").over(w_doc).isNull()
            | (F.col("pos") > F.lag("pos").over(w_doc) + k),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("__new"),
    )
    spans = flagged.select(
        id_col,
        "pos",
        F.sum("__new").over(w_doc).alias("__span"),
    ).groupBy(id_col, "__span").agg(
        (F.max("pos") + (k - 1) - F.min("pos") + 1).cast("long").alias("__len")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_dup_spans"),
        F.sum("__len").cast("long").alias("dup_tokens"),
        F.max("__len").cast("long").alias("longest_dup_span"),
    )
    out = base.drop("__ws").join(per_doc, id_col, "left")
    return out.select(
        id_col,
        "n_tokens",
        F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.coalesce("longest_dup_span", F.lit(0)).cast("long").alias(
            "longest_dup_span"
        ),
        F.round(
            F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"), 6
        ).alias("dup_token_frac"),
    )


def ngram_novelty(
    docs: DataFrame,
    *,
    k: int = 4,
    id_col: str = "doc_id",
    words_col: str = "words",
) -> DataFrame:
    """Per-document n-gram novelty vs the corpus prefix — a
    contribution/curriculum score: a k-gram POSITION is novel iff no
    document with a smaller id contains that k-gram (ties: the
    introducing doc counts all its own occurrences as novel).  Docs
    made of already-seen k-grams score near 0 — the incremental-value
    signal an ingestion pipeline uses to prioritize or drop late
    near-boilerplate arrivals.

    Shape (r6): per-doc gram-hash COUNTS from the _gram_hash_stream
    Arrow kernel (8-byte keys, deduped per doc before any shuffle —
    was: interpreted concat_ws lambdas exploding every instance as a
    ~30-byte string) -> min(doc_id) per hash (one narrow shuffle) ->
    join back on the hash (the exchange is reused) -> per-doc
    count-weighted aggregate.  No pairwise stage; the first-seen
    table is the only state, which is exactly what an incremental
    ingest keeps anyway.  Docs shorter than k have no grams and
    score novelty 1.0 by convention.  Output-equality vs the
    retained string form: tests/test_fingerprint_gram_kernels.py.
    """
    words = F.col(words_col)
    base = docs.select(
        id_col, F.size(words).cast("long").alias("n_tokens")
    )
    gd = _gram_hash_stream(
        docs, k=k, id_col=id_col, words_col=words_col, positions=False
    )
    first = gd.groupBy("h").agg(F.min(id_col).alias("__first"))
    per_doc = (
        gd.join(first, "h")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("__first") == F.col(id_col), F.col("c"))
                .otherwise(F.lit(0))
            ).cast("long").alias("n_novel"),
        )
    )
    out = base.join(per_doc, id_col, "left")
    return out.select(
        id_col,
        "n_tokens",
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        F.coalesce(
            F.round(F.col("n_novel") / F.col("n_grams"), 6), F.lit(1.0)
        ).alias("novelty_frac"),
    )


def ngram_novelty_expr(
    docs: DataFrame,
    *,
    k: int = 4,
    id_col: str = "doc_id",
    words_col: str = "words",
) -> DataFrame:
    """The original string-keyed Catalyst form of ngram_novelty —
    retained as the in-engine oracle for the gram-hash kernel swap
    (tests/test_fingerprint_gram_kernels.py)."""
    words = F.col(words_col)
    base = docs.select(
        id_col, F.size(words).cast("long").alias("n_tokens"), words.alias("__ws")
    )
    grams = base.where(F.col("n_tokens") >= k).select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), (F.col("n_tokens") - (k - 1)).cast("int")),
                lambda i: F.concat_ws(" ", F.slice("__ws", i, k)),
            )
        ).alias("s"),
    )
    first = grams.groupBy("s").agg(F.min(id_col).alias("__first"))
    per_doc = (
        grams.join(first, "s")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(
                (F.col("__first") == F.col(id_col)).cast("long")
            ).cast("long").alias("n_novel"),
        )
    )
    out = base.drop("__ws").join(per_doc, id_col, "left")
    return out.select(
        id_col,
        "n_tokens",
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        F.coalesce(
            F.round(F.col("n_novel") / F.col("n_grams"), 6), F.lit(1.0)
        ).alias("novelty_frac"),
    )


def incremental_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    *,
    threshold: float = 0.8,
    candidate_pairs: DataFrame | None = None,
) -> DataFrame:
    """Incremental ingest dedup — the operational pattern at corpus
    scale: dedupe an incoming BATCH against the already-indexed
    corpus without ever re-deduping the corpus itself (a daily
    ingest joins against the standing fingerprint/shingle index; the
    corpus side here stands in for that materialized index, the
    FeatureStore dup_labels analog).

    Inputs: word-array tables (doc_id string, words array<string>).
    Per batch doc the output carries the exact-duplicate verdict
    (identical token stream: exact_of = lowest matching corpus doc,
    n_exact), the near-duplicate verdict (any corpus doc with
    4-shingle Jaccard >= threshold: best_match = highest-Jaccard,
    ties -> lowest corpus doc; best_jaccard at 6dp), and
    keep = neither.

    Plan: one md5-fingerprint equi-join for the exact pass; the near
    pass joins the two sides' distinct-shingle inverted indexes on
    the shingle key — candidates are CROSS-SIDE only (batch x
    corpus, never corpus x corpus: the index side is settled) —
    then verifies candidates with exact Jaccard.

    `candidate_pairs` (b_id, c_id) replaces the shingle-index join
    with a caller-supplied candidate set — the banded-MinHash index
    path (minhash_fingerprints band join, recall-1.0-proven at this
    threshold in minhash_dedup): one shuffle on the band key,
    candidate volume bounded by band collisions instead of raw
    shingle collisions (which degenerate on a tiny-vocab corpus).
    Verification is identical either way, so with a recall-1
    candidate source the result is exactly the shingle-path result.
    """
    b = batch.select(
        F.col("doc_id").alias("b_id"),
        F.col("words").alias("b_words"),
        F.md5(F.array_join("words", " ")).alias("b_fp"),
    )
    c = corpus.select(
        F.col("doc_id").alias("c_id"),
        F.col("words").alias("c_words"),
        F.md5(F.array_join("words", " ")).alias("c_fp"),
    )

    exact = (
        b.select("b_id", "b_fp")
        .join(c.select("c_id", "c_fp"), F.col("b_fp") == F.col("c_fp"))
        .groupBy("b_id")
        .agg(
            F.min("c_id").alias("exact_of"),
            F.count("*").cast("long").alias("n_exact"),
        )
    )

    # r6: hashed shingle sets from the Arrow kernel (intersect/union
    # sizes equal the string form — the shingle_hash_table contract);
    # the exact md5 fingerprint above still hashes the full token
    # stream, so exact-dup detection is untouched
    bs = shingle_hash_table(
        batch, id_col="doc_id", words_col="words", out_col="b_sh"
    ).withColumnRenamed("doc_id", "b_id")
    cs = shingle_hash_table(
        corpus, id_col="doc_id", words_col="words", out_col="c_sh"
    ).withColumnRenamed("doc_id", "c_id")
    if candidate_pairs is not None:
        cand = candidate_pairs.select("b_id", "c_id").distinct()
    else:
        binv = bs.select("b_id", F.explode("b_sh").alias("g"))
        cinv = cs.select("c_id", F.explode("c_sh").alias("g"))
        cand = binv.join(cinv, "g").select("b_id", "c_id").distinct()
    jac = F.round(
        F.size(F.array_intersect("b_sh", "c_sh")).cast("double")
        / F.size(F.array_union("b_sh", "c_sh")),
        6,
    )
    verified = (
        cand.join(bs, "b_id")
        .join(cs, "c_id")
        .select("b_id", "c_id", jac.alias("j"))
        .where(F.col("j") >= threshold)
    )
    wbest = Window.partitionBy("b_id").orderBy(
        F.col("j").desc(), F.col("c_id").asc()
    )
    best = (
        verified.withColumn("__rn", F.row_number().over(wbest))
        .where(F.col("__rn") == 1)
        .select(
            "b_id",
            F.col("c_id").alias("best_match"),
            F.col("j").alias("best_jaccard"),
        )
    )
    return (
        b.select(F.col("b_id").alias("doc_id"))
        .join(exact.withColumnRenamed("b_id", "doc_id"), "doc_id", "left")
        .join(best.withColumnRenamed("b_id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            "exact_of",
            F.coalesce("n_exact", F.lit(0).cast("long")).alias("n_exact"),
            "best_match",
            "best_jaccard",
            (
                F.col("exact_of").isNull() & F.col("best_match").isNull()
            ).alias("keep"),
        )
    )
