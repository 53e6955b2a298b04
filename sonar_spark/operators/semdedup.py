"""Semantic deduplication — SemDeDup (Abbas et al. 2023, "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication").
The embedding-space near-duplicate pruning step LAION/DataComp-style
pipelines run after exact/MinHash dedup: cluster the embeddings with
k-means so the quadratic pair search is bounded per cluster, then
inside each cluster drop every member of a tau-similar pair except
the one with the LOWEST cosine similarity to its cluster centroid
(the paper's keep rule — low-centroid-sim items are the least
redundant representatives).

The reference engine has no embedding-space curation surface; this
extends its dedup family (exact / MinHash / SimHash / hyperplane-LSH
near-dup) with the published semantic axis.

Relational shape (the whole point of SemDeDup at 100 TB):

- cluster assignment is a broadcast of K constant centroids onto one
  corpus scan (argmax of K cosine columns — no shuffle);
- the pair search is a self-join ON THE CLUSTER KEY — one shuffle,
  quadratic only within a cluster, never across the corpus.  At web
  scale K grows to ~10^5 (the paper uses 50k on LAION) so cluster
  populations stay bounded; here K=8 over the test corpus.

Cross-engine determinism: the centroids are PLAN-TIME CONSTANTS —
a seeded unit-sphere draw shared between the Spark lit() arrays and
the DuckDB VALUES table as repr floats (the IVF-PQ codebook
precedent: the oracle has no access to data-trained centroids, and
for SemDeDup the k-means quality only shapes the bucketing, not the
keep/drop semantics).  All similarities are rounded to 6dp at the
named quantized boundary before any argmax / threshold / keep-rule
comparison, with (value, id) lexicographic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


SEMDEDUP_K = 8
_DIM = 64
_SEED = 20230322  # SemDeDup arXiv submission date


def semdedup_centroids() -> list[list[float]]:
    """K seeded unit-sphere centroids (deterministic; shared with the
    DuckDB oracle as repr-float literals)."""
    import numpy as np

    rng = np.random.RandomState(_SEED)
    c = rng.randn(SEMDEDUP_K, _DIM)
    c /= np.sqrt((c * c).sum(axis=1, keepdims=True))
    return [[float(v) for v in row] for row in c]


def semdedup_centroids_sql_values() -> str:
    """The same centroids as DuckDB VALUES rows (k, pos, val) —
    1-based pos to match generate_subscripts."""
    rows = []
    for k, row in enumerate(semdedup_centroids()):
        for pos, v in enumerate(row, start=1):
            rows.append(f"({k}, {pos}, {v!r})")
    return ",\n             ".join(rows)


def semdedup(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = 0.95,
) -> DataFrame:
    """SemDeDup keep/drop over ``corpus`` (id, array<double> vector).

    Output per input row: cluster (0..K-1), centroid_sim (6dp),
    n_near (tau-similar same-cluster neighbours), dropped (1 iff a
    tau-similar neighbour with lexicographically smaller
    (centroid_sim, id) exists — i.e. the keep rule retains the
    lowest-centroid-sim member of every similar group).
    """
    cents = semdedup_centroids()

    # Centroid assignment as an Arrow-batched kernel (the interpreted
    # Catalyst cosine fold over K x dim per row was the slow path —
    # same lesson as the pair stage below).  Bit-parity with the fold
    # version: ascending-dim accumulation for every sum, cos =
    # dot / (sqrt(sa) * sqrt(sc)) with the d > 0 -> else 0.0 guard of
    # distance.go:48-70, half-up (away-from-zero) 6dp round, -0.0
    # normalized; argmax iterates k ascending with strict > (the
    # array_max lexicographic (s, -k) tie rule).
    import numpy as np
    import pandas as pd

    cmat = np.asarray(cents, dtype=np.float64)
    n_k, dim = cmat.shape
    cn = np.zeros(n_k)
    for i in range(dim):  # ascending: matches asum(transform) order
        cn += cmat[:, i] * cmat[:, i]
    cn = np.sqrt(cn)

    def _round6(x: np.ndarray) -> np.ndarray:
        return (
            np.where(
                x >= 0.0,
                np.floor(x * 1e6 + 0.5),
                np.ceil(x * 1e6 - 0.5),
            )
            / 1e6
            + 0.0
        )

    def _assign_kernel(pdfs):
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            vb = np.stack(
                [
                    np.asarray(v, dtype=np.float64)
                    for v in pdf[vec_col]
                ]
            )
            n = vb.shape[0]
            na = np.zeros(n)
            dots = np.zeros((n, n_k))
            for i in range(dim):  # ascending fold order
                c = vb[:, i]
                na += c * c
                dots += np.outer(c, cmat[:, i])
            na = np.sqrt(na)
            den = na[:, None] * cn[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                s = np.where(den > 0.0, dots / den, 0.0)
            s6 = _round6(s)
            best_s = s6[:, 0].copy()
            best_k = np.zeros(n, dtype=np.int64)
            for k in range(1, n_k):  # ascending, strict >: ties keep
                upd = s6[:, k] > best_s  # the smaller k
                best_s[upd] = s6[upd, k]
                best_k[upd] = k
            yield pd.DataFrame(
                {
                    "__id": pdf[id_col].to_numpy(),
                    "__v": pdf[vec_col],
                    "cluster": best_k,
                    "centroid_sim": best_s,
                }
            )

    # the assigned table feeds three consumers (both join sides + the
    # final output) — persist the small annotated table (winnow-
    # matches precedent)
    asg = corpus.mapInPandas(
        _assign_kernel,
        schema=(
            "__id long, __v array<double>, cluster long,"
            " centroid_sim double"
        ),
    ).persist()

    # Within-cluster pair search as a per-cluster block kernel.  The
    # expression-join draft computed the interpreted Catalyst cosine
    # fold over every within-cluster pair row (~2.2M pairs x 64 dims
    # at sf0.1 = 9.5 s); the kernel scores each cluster's n x d block
    # with ascending-k accumulation (dots += outer(col_k, col_k), the
    # allpairs_cosine / chroma-DP fixed-order convention, bit-equal to
    # the fold) and applies the half-up 6dp round + tau threshold
    # in-kernel, so only qualifying pairs materialize.  ONE exchange
    # on the cluster key; per-cluster state carries across Arrow
    # batches (clusters can exceed a 10k-row batch — the as-of
    # mapInPandas lesson).
    tau_f = float(tau)

    def _pairs_kernel(pdfs):
        cur_key = None
        ids: list = []
        css: list = []
        vecs: list = []

        def flush():
            n = sum(len(a) for a in ids)
            if n < 2:
                return None
            idv = np.concatenate(ids)
            csv = np.concatenate(css)
            vb = np.stack([v for chunk in vecs for v in chunk])
            d = vb.shape[1]
            nrm = np.zeros(n)
            for k in range(d):  # ascending: matches the fold order
                c = vb[:, k]
                nrm += c * c
            # right-side tiled accumulation (r6): per-element
            # ascending-k order unchanged, but each dots tile stays
            # cache-resident instead of streaming the full n x n
            # accumulator through memory d times (the
            # hard_negatives_allpairs lesson)
            dots = np.empty((n, n))
            tj = max(1, (1 << 17) // n)
            for j0 in range(0, n, tj):
                j1 = min(j0 + tj, n)
                tile = np.zeros((n, j1 - j0))
                for k in range(d):  # ascending fold order
                    tile += np.outer(vb[:, k], vb[j0:j1, k])
                dots[:, j0:j1] = tile
            na = np.sqrt(nrm)
            den = np.outer(na, na)
            with np.errstate(divide="ignore", invalid="ignore"):
                s = np.where(den == 0.0, 0.0, dots / den)
            # half-up 6dp (np.round is half-even — never use it here)
            s6 = _round6(s)
            ia, ib = np.triu_indices(n, k=1)
            keep = s6[ia, ib] >= tau_f
            ia, ib = ia[keep], ib[keep]
            if len(ia) == 0:
                return None
            return pd.DataFrame(
                {
                    "__ida": idv[ia],
                    "__idb": idv[ib],
                    "__csa": csv[ia],
                    "__csb": csv[ib],
                }
            )

        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cl = pdf["cluster"].to_numpy()
            idv = pdf["__id"].to_numpy()
            csv = pdf["centroid_sim"].to_numpy()
            vv = pdf["__v"]
            cut = np.flatnonzero(cl[1:] != cl[:-1]) + 1
            starts = np.concatenate(([0], cut))
            ends = np.concatenate((cut, [len(cl)]))
            for s, e in zip(starts, ends):
                if cl[s] != cur_key:
                    out = flush()
                    if out is not None:
                        yield out
                    cur_key = cl[s]
                    ids, css, vecs = [], [], []
                ids.append(idv[s:e])
                css.append(csv[s:e])
                vecs.append(
                    [
                        np.asarray(v, dtype=np.float64)
                        for v in vv.iloc[s:e]
                    ]
                )
        out = flush()
        if out is not None:
            yield out

    blocks = (
        asg.repartition("cluster")
        .sortWithinPartitions("cluster", "__id")
        .select("cluster", "__id", "__v", "centroid_sim")
    )
    pairs = blocks.mapInPandas(
        _pairs_kernel,
        schema=(
            "__ida long, __idb long, __csa double, __csb double"
        ),
    )
    # per-pair loser = the lexicographically GREATER (centroid_sim,
    # id) — the keep rule retains the lowest-centroid-sim member
    a_loses = (F.col("__csa") > F.col("__csb")) | (
        (F.col("__csa") == F.col("__csb"))
        & (F.col("__ida") > F.col("__idb"))
    )
    sides = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("__ida").alias("__id"),
                    a_loses.cast("long").alias("__lost"),
                ),
                F.struct(
                    F.col("__idb").alias("__id"),
                    (~a_loses).cast("long").alias("__lost"),
                ),
            )
        ).alias("__e")
    ).select(F.col("__e.__id").alias("__id"), F.col("__e.__lost"))
    near = sides.groupBy("__id").agg(
        F.count("*").cast("long").alias("n_near"),
        F.max("__lost").cast("long").alias("dropped"),
    )
    return (
        asg.join(near, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "cluster",
            "centroid_sim",
            F.coalesce("n_near", F.lit(0)).cast("long").alias("n_near"),
            F.coalesce("dropped", F.lit(0)).cast("long").alias("dropped"),
        )
    )
