"""Approximate nearest-neighbor search over embedding columns:
IVF (inverted-file) index — k-means coarse quantizer + bucketed
candidate probing (SURVEY training-data-pipeline surface; the scale
path over the knn_bruteforce baseline in operators.topk; k-means
per reference algorithms/stats/clustering.go:156-330, seeded like its
seed-42 default :117-120).

Physical design at 10^12 rows:
- the coarse quantizer is trained driver-side on a bounded SAMPLE
  (deterministic takeSample analog), then broadcast — centroids are
  tiny (n_centroids x dim floats);
- assignment is a narrow mapInArrow pass (argmax of dot products
  against the broadcast centroid matrix);
- the index table is written bucketed by centroid_id, so a query
  probing n_probe buckets scans only those partitions (partition
  pruning);
- search: queries x probed buckets equi-join on centroid_id then
  in-bucket brute force + per-query top-k.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.arrays import cosine_similarity
from .topk import topk_per_group


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n > 0, n, 1.0)


def _vectors_to_matrix(vec) -> np.ndarray:
    """Arrow list-of-float column -> (n, dim) float64 matrix via the
    contiguous values buffer (zero-copy flatten + reshape) — never
    to_pylist(), which builds a Python object per element."""
    import pyarrow.compute as pc

    n = len(vec)
    if n == 0:
        return np.empty((0, 0))
    lens = pc.list_value_length(vec).to_numpy()
    dim = int(lens[0])
    if not (lens == dim).all():
        raise ValueError("ragged embedding column")
    flat = vec.flatten().to_numpy(zero_copy_only=False).astype(
        np.float64, copy=False
    )
    return flat.reshape(n, dim)


def train_centroids(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_iter: int = 10,
    sample: int = 10000,
    seed: int = 42,
) -> np.ndarray:
    """Spherical k-means on a deterministic sample (orderBy id, limit):
    returns (n_centroids, dim) float64 unit vectors. Lloyd iterations
    with empty-cluster re-seeding; deterministic for a fixed seed
    (clustering.go:117-120 seed-42 precedent)."""
    pdf = (
        emb.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample)
        .toPandas()
    )
    X = _normalize_rows(np.array(pdf[vec_col].tolist(), dtype=np.float64))
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(X))
    C = X[rng.choice(len(X), size=k, replace=False)]
    for _ in range(n_iter):
        sims = X @ C.T
        assign = sims.argmax(axis=1)
        newC = np.zeros_like(C)
        for j in range(k):
            members = X[assign == j]
            if len(members) == 0:
                newC[j] = X[rng.integers(0, len(X))]
            else:
                newC[j] = members.mean(axis=0)
        C = _normalize_rows(newC)
    return C


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (cosine):
    (id, centroid_id, embedding). Narrow mapInArrow pass against the
    broadcast centroid matrix."""
    C = centroids.astype(np.float64)
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(C)

    def gen(batches):
        import pyarrow as pa

        Cl = bc.value
        for batch in batches:
            vec = batch.column(batch.schema.get_field_index(vec_col))
            ids = batch.column(batch.schema.get_field_index(id_col))
            if len(vec) == 0:
                continue
            X = _vectors_to_matrix(vec)
            Xn = _normalize_rows(X)
            assign = (Xn @ Cl.T).argmax(axis=1).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(assign), vec],
                names=[id_col, "centroid_id", vec_col],
            )

    vec_type = dict(emb.dtypes)[vec_col]
    id_type = dict(emb.dtypes)[id_col]
    return emb.select(id_col, vec_col).mapInArrow(
        gen, schema=f"{id_col} {id_type}, centroid_id int, {vec_col} {vec_type}"
    )


def hyperplane_lsh_pairs(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 256,
    band_bits: int = 16,
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) LSH candidate pairs —
    the 100-TB path for embedding-cosine near-dup: sign bits against a
    broadcast seeded Gaussian plane matrix, packed into
    n_bits/band_bits band keys, ONE shuffle on the band key, bucketed
    self-join with a size cap. P(bit agree) = 1 - angle/pi, so with
    r=16 bits x 16 bands a 0.98-cosine pair is missed with
    probability ~1e-14.

    Output: (doc_a, doc_b) distinct candidate pairs (verify with exact
    cosine downstream — candidates only)."""
    from pyspark.sql import Window

    n_bands = n_bits // band_bits

    def gen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc  # noqa: F401

        planes = None
        for batch in batches:
            vec = batch.column(batch.schema.get_field_index(vec_col))
            ids = batch.column(batch.schema.get_field_index(id_col))
            if len(vec) == 0:
                continue
            X = _vectors_to_matrix(vec)
            if planes is None:
                local_rng = np.random.default_rng(seed)
                planes = local_rng.standard_normal((X.shape[1], n_bits))
            bits = (X @ planes) > 0  # (n, n_bits) sign pattern
            # pack each band's bits into an int64 key (fixed order)
            keys = np.zeros((len(X), n_bands), dtype=np.int64)
            for b in range(n_bands):
                for j in range(band_bits):
                    keys[:, b] = (keys[:, b] << 1) | bits[
                        :, b * band_bits + j
                    ].astype(np.int64)
            band_arr = pa.ListArray.from_arrays(
                pa.array(
                    np.arange(len(X) + 1, dtype=np.int32) * n_bands
                ),
                pa.array(keys.ravel()),
            )
            yield pa.RecordBatch.from_arrays(
                [ids, band_arr], names=[id_col, "bands"]
            )

    id_type = dict(emb.dtypes)[id_col]
    sigs = emb.select(id_col, vec_col).mapInArrow(
        gen, schema=f"{id_col} {id_type}, bands array<long>"
    )
    b = sigs.select(
        id_col, F.posexplode("bands").alias("band_idx", "band_hash")
    )
    counted = b.withColumn(
        "__n",
        F.count("*").over(Window.partitionBy("band_idx", "band_hash")),
    ).where(F.col("__n") <= max_bucket)
    left = counted.select(
        "band_idx", "band_hash", F.col(id_col).alias("doc_a")
    )
    right = counted.select(
        "band_idx", "band_hash", F.col(id_col).alias("doc_b")
    )
    return (
        left.join(right, ["band_idx", "band_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def ivf_probes(
    queries: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """Per-query probe list: top n_probe centroids by cosine against
    the broadcast centroid matrix, emitted as (query_id, centroid_id)
    rows — one narrow Arrow pass."""
    C = centroids.astype(np.float64)
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast(C)

    def probes(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        Cl = bc.value
        npb = min(n_probe, len(Cl))
        for batch in batches:
            vec = batch.column(batch.schema.get_field_index(vec_col))
            ids = batch.column(batch.schema.get_field_index(id_col))
            if len(vec) == 0:
                continue
            X = _vectors_to_matrix(vec)
            sims = _normalize_rows(X) @ Cl.T
            top = np.argsort(-sims, axis=1, kind="stable")[:, :npb].astype(
                np.int32
            )
            n = len(X)
            idx = np.repeat(np.arange(n), npb)
            yield pa.RecordBatch.from_arrays(
                [
                    pc.take(ids, pa.array(idx)),
                    pa.array(top.ravel()),
                ],
                names=["query_id", "centroid_id"],
            )

    id_type = dict(queries.dtypes)[id_col]
    return queries.select(id_col, vec_col).mapInArrow(
        probes, schema=f"query_id {id_type}, centroid_id int"
    )


def ivf_search(
    index: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
    probe_df: DataFrame | None = None,
) -> DataFrame:
    """Probe the n_probe nearest centroids per query, brute-force
    within probed buckets, top-k by cosine. With n_probe ==
    n_centroids this is exhaustive and must equal knn_bruteforce.

    Output: query_id, rank, neighbor_id, cosine_sim."""
    if probe_df is None:
        probe_df = ivf_probes(
            queries, centroids, id_col=id_col, vec_col=vec_col,
            n_probe=n_probe,
        )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    cand = (
        probe_df.join(
            index.select(
                "centroid_id",
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("__cv"),
            ),
            "centroid_id",
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .join(F.broadcast(qv), "query_id")
    )
    scored = cand.withColumn(
        "cosine_sim", cosine_similarity(F.col("__qv"), F.col("__cv"))
    ).select("query_id", "neighbor_id", "cosine_sim")
    return topk_per_group(
        scored,
        "query_id",
        [F.col("cosine_sim").desc(), F.col("neighbor_id").asc()],
        k,
    )


def ivf_write(index: DataFrame, path: str) -> None:
    """Persist the IVF index bucketed by centroid: one parquet
    partition directory per centroid_id, so a probing search scans
    only the probed buckets (partition pruning)."""
    index.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def ivf_search_pruned(
    spark,
    index_path: str,
    queries: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """IVF search against the ON-DISK index with partition pruning:
    the union of probed centroid ids becomes an isin() partition
    filter, so only those bucket directories are scanned (the 10^12
    design: a query batch touching p of c buckets reads p/c of the
    index). The tiny driver-side collect of probed ids is adaptive
    planning, same as the as-of bucket sizing."""
    probe_df = ivf_probes(
        queries, centroids, id_col=id_col, vec_col=vec_col, n_probe=n_probe
    )
    probed = sorted(
        r["centroid_id"]
        for r in probe_df.select("centroid_id").distinct().collect()
    )
    index = spark.read.parquet(index_path).where(
        F.col("centroid_id").isin([int(c) for c in probed])
    )
    return ivf_search(
        index, queries, centroids, id_col=id_col, vec_col=vec_col, k=k,
        n_probe=n_probe, probe_df=probe_df,
    )


def allpairs_cosine(
    emb: DataFrame,
    emb_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    directed: bool = False,
) -> DataFrame:
    """All-pairs cosine similarity above a threshold — the exact
    quadratic near-dup BASELINE (the scale path is the LSH variant,
    hyperplane_lsh_pairs).  Block nested-loop shape: each task takes
    its partition of the left side and scores it against the FULL
    right side, which it reads executor-side from the (small) parquet
    file — the build side of a broadcast hash join, built per task
    without shipping pair rows through a join first.  The threshold
    is applied INSIDE the kernel, so only qualifying pairs ever
    materialize (the expression-join form materialized all O(n^2)
    pair rows before filtering).

    Float semantics match the Catalyst fold version bit-for-bit:
    dot and norm accumulate over the dimension axis in ascending
    order (the r2 BLAS-gemm lesson — np.dot's batch-size-dependent
    summation would not be reproducible), s = dot / (na * nb) with
    the zero-denominator -> 0.0 guard of distance.go:48-70.

    Output: (id_a, id_b, s) with id_a < id_b, s >= threshold, s RAW
    (caller rounds at its quantization boundary).  directed=True
    emits LEFT x ALL instead (id_a from the left side only, every
    id_b != id_a) — the anchors-bounded candidate shape
    hard_negatives consumes when the left side is pre-filtered."""
    from collections.abc import Iterator

    import pandas as pd

    def gen(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        right = pd.read_parquet(emb_path, columns=[id_col, vec_col])
        rb = np.stack(
            [np.asarray(v, dtype=np.float64) for v in right[vec_col]]
        )
        rid = right[id_col].to_numpy()
        dim = rb.shape[1]
        nb = np.zeros(len(rid))
        for k in range(dim):  # ascending: matches asum(transform) order
            nb += rb[:, k] * rb[:, k]
        nb = np.sqrt(nb)
        for pdf in pdfs:
            if not len(pdf):
                continue
            la = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            lid = pdf[id_col].to_numpy()
            na = np.zeros(len(lid))
            for k in range(dim):  # ascending over the dim axis
                na += la[:, k] * la[:, k]
            na = np.sqrt(na)
            # right-side TILED accumulation (r6): per-element
            # ascending-k summation order unchanged, but each dots
            # tile stays cache-resident across the dim passes instead
            # of streaming the full accumulator through memory dim
            # times (the hard_negatives_allpairs lesson; bit-identical
            # by construction — one float64 add per (element, k)
            # either way)
            dots = np.empty((len(lid), len(rid)))
            tj = max(1, (1 << 17) // max(1, len(lid)))
            for j0 in range(0, len(rid), tj):
                j1 = min(j0 + tj, len(rid))
                tile = np.zeros((len(lid), j1 - j0))
                for k in range(dim):  # ascending over the dim axis
                    tile += np.outer(la[:, k], rb[j0:j1, k])
                dots[:, j0:j1] = tile
            denom = np.outer(na, nb)
            with np.errstate(divide="ignore", invalid="ignore"):
                s = np.where(denom > 0, dots / denom, 0.0)
            if directed:
                mask = (lid[:, None] != rid[None, :]) & (s >= threshold)
            else:
                mask = (lid[:, None] < rid[None, :]) & (s >= threshold)
            ii, jj = np.nonzero(mask)
            # chunked yields: one low-threshold block can qualify
            # millions of pairs, and a single yielded frame becomes a
            # single Arrow batch — capping rows per yield bounds the
            # executor's direct-buffer usage (guide §4.2 batch-size
            # caveat; observed 300 MB allocations at sf1.0 directed)
            step = 1_000_000
            for lo in range(0, len(ii), step):
                sl = slice(lo, lo + step)
                yield pd.DataFrame(
                    {
                        "id_a": lid[ii[sl]],
                        "id_b": rid[jj[sl]],
                        "s": s[ii[sl], jj[sl]],
                    }
                )

    return emb.select(id_col, vec_col).mapInPandas(
        gen, schema="id_a long, id_b long, s double"
    )


def hard_negatives_allpairs(
    emb: DataFrame,
    emb_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    pos_threshold: float = 0.4,
) -> DataFrame:
    """Hard-negative mining fused INTO the block nested-loop cosine
    kernel (r6, guide §1.2 'fix the distributed algorithm first'):
    each task scores its left block against the full executor-side
    table exactly like allpairs_cosine (bit-identical ascending-order
    float path), and — because every left row sees its COMPLETE
    similarity row — reduces it in place to the hard_negatives
    output: n_excluded = #(s >= pos_threshold), top-k of the
    s < pos_threshold candidates by (s desc, neighbor id asc) on RAW
    doubles, rows only for anchors (n_excluded >= 1).

    The r5 plan materialized the O(n^2) pair table through a mirror
    union and two windows (179 s at sf1.0, 41% of the whole bench);
    the anchors-bounded directed two-pass (the documented corpus-scale
    shape) degenerates on this corpus because ~100% of vectors have a
    positive at 0.4.  Fusing the rank reduction into the kernel emits
    exactly the <= k output rows per anchor — no pair row ever leaves
    the task.  Equivalence to hard_negatives(allpairs_cosine(
    threshold=-1)) is certified by tests/test_negatives.py::
    test_hard_negatives_kernel_equals_windowed.

    Output: query_id, rank (int), neighbor_id, cosine_sim (6dp via
    kernels.spark_round — the operator's F.round boundary), n_excluded
    (long)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..kernels import spark_round

    def gen(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        right = pd.read_parquet(emb_path, columns=[id_col, vec_col])
        rb = np.stack(
            [np.asarray(v, dtype=np.float64) for v in right[vec_col]]
        )
        rid = right[id_col].to_numpy()
        dim = rb.shape[1]
        nb = np.zeros(len(rid))
        for d in range(dim):  # ascending: matches asum(transform) order
            nb += rb[:, d] * rb[:, d]
        nb = np.sqrt(nb)
        for pdf in pdfs:
            if not len(pdf):
                continue
            la = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            lid = pdf[id_col].to_numpy()
            na = np.zeros(len(lid))
            for d in range(dim):  # ascending over the dim axis
                na += la[:, d] * la[:, d]
            na = np.sqrt(na)
            # right-side TILED accumulation: per-element summation
            # order over d is unchanged (still ascending), but each
            # dots tile stays cache-resident across the 64 passes —
            # the untiled form streamed a 100 MB accumulator through
            # memory 64 times per task (measured 17 s at sf1.0;
            # tiled ~2 s)
            dots = np.empty((len(lid), len(rid)))
            tj = max(1, (1 << 17) // max(1, len(lid)))  # ~1 MB tiles
            for j0 in range(0, len(rid), tj):
                j1 = min(j0 + tj, len(rid))
                tile = np.zeros((len(lid), j1 - j0))
                for d in range(dim):  # ascending over the dim axis
                    tile += np.outer(la[:, d], rb[j0:j1, d])
                dots[:, j0:j1] = tile
            denom = np.outer(na, nb)
            with np.errstate(divide="ignore", invalid="ignore"):
                s = np.where(denom > 0, dots / denom, 0.0)
            q_ids, ranks, n_ids, sims, n_excs = [], [], [], [], []
            for i in range(len(lid)):
                row = s[i]
                other = rid != lid[i]
                n_exc = int(((row >= pos_threshold) & other).sum())
                if n_exc == 0:
                    continue
                below = other & (row < pos_threshold)
                cand_s = row[below]
                cand_id = rid[below]
                # top-k with exact (s desc, id asc) raw-double
                # semantics: prune to the rows tied-or-above the
                # k-th largest s with argpartition (O(n)), THEN
                # lexsort only the survivors — a full 20k-row
                # lexsort per anchor dominated the task profile
                if len(cand_s) > k:
                    kth = np.partition(cand_s, len(cand_s) - k)[
                        len(cand_s) - k
                    ]
                    keep = cand_s >= kth
                    cand_s = cand_s[keep]
                    cand_id = cand_id[keep]
                # -s is an exact sign flip; lexsort's last key is
                # primary
                order = np.lexsort((cand_id, -cand_s))[:k]
                m = len(order)
                q_ids.extend([lid[i]] * m)
                ranks.extend(range(1, m + 1))
                n_ids.extend(cand_id[order])
                sims.extend(cand_s[order])
                n_excs.extend([n_exc] * m)
            yield pd.DataFrame(
                {
                    "query_id": np.asarray(q_ids, dtype=np.int64),
                    "rank": np.asarray(ranks, dtype=np.int32),
                    "neighbor_id": np.asarray(n_ids, dtype=np.int64),
                    "cosine_sim": spark_round(
                        np.asarray(sims, dtype=np.float64), 6
                    ),
                    "n_excluded": np.asarray(n_excs, dtype=np.int64),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        gen,
        schema=(
            "query_id long, rank int, neighbor_id long, "
            "cosine_sim double, n_excluded long"
        ),
    )


# ------------------------------------------------------------- IVF-PQ

def pq_train(
    *,
    dim: int = 64,
    n_cells: int = 8,
    n_sub: int = 8,
    n_codes: int = 64,
    n_iter: int = 10,
    seed: int = 7,
    sample: int = 1024,
) -> tuple[np.ndarray, np.ndarray]:
    """Product-quantization codebooks: coarse centroids C
    (n_cells, dim) + per-subspace codebooks B (n_sub, n_codes,
    dim/n_sub), trained with plain Lloyd k-means on a SEEDED SYNTHETIC
    sample — codebooks are trained offline on a representative sample
    in any real deployment; a deterministic synthetic sample makes
    them plan-time constants BOTH engines can embed (the CQT-kernel /
    tonnetz-coordinate precedent), so the quantized search is fully
    value-oracle-able.  Euclidean k-means (PQ quantizes residual
    geometry, not direction).  The sample is drawn uniform on the
    unit sphere — the embeddings table is unit-normalized, and
    codebooks must live in the data's geometry (training on raw
    N(0,1) vectors of norm ~8 put every reconstruction hopelessly
    far from the sphere: measured recall 0)."""
    rng = np.random.default_rng(seed)
    X = rng.normal(0.0, 1.0, size=(sample, dim))
    X = X / np.linalg.norm(X, axis=1, keepdims=True)

    def lloyd(data: np.ndarray, k: int) -> np.ndarray:
        C = data[rng.choice(len(data), size=k, replace=False)].copy()
        for _ in range(n_iter):
            d2 = ((data[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for j in range(k):
                m = data[a == j]
                C[j] = m.mean(axis=0) if len(m) else data[
                    rng.integers(0, len(data))
                ]
        return C

    C = lloyd(X, n_cells)
    sub = dim // n_sub
    # residuals against the assigned coarse centroid
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    R = X - C[d2.argmin(axis=1)]
    B = np.stack(
        [lloyd(R[:, s * sub : (s + 1) * sub], n_codes) for s in range(n_sub)]
    )
    return C, B


def _d2_asc(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise squared distance with ascending-dim accumulation
    (fixed float order — reproducible across batch shapes and
    engines).  a: (n, d), b: (d,) -> (n,)."""
    out = np.zeros(len(a))
    for k in range(a.shape[1]):
        diff = a[:, k] - b[k]
        out += diff * diff
    return out


def _r6pos(x: np.ndarray) -> np.ndarray:
    """Half-up 6-dp for non-negative values (the quantized compare
    boundary shared with the SQL side's round(x, 6))."""
    return np.floor(x * 1e6 + 0.5) / 1e6


def pq_index(
    emb: DataFrame,
    C: np.ndarray,
    B: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector: coarse cell (argmin 6-dp-rounded squared
    distance, ties -> smaller cell) + per-subspace residual codes
    (same rule).  Output (id, cell, codes array<int>) — the 100 TB
    memory story: 64 float64 dims (512 B) become 1 cell byte + 8 code
    bytes."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast((C, B))

    def gen(pdfs):
        import pandas as pd

        Cl, Bl = bc.value
        n_sub = Bl.shape[0]
        sub = Cl.shape[1] // n_sub
        for pdf in pdfs:
            if not len(pdf):
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            cd = np.stack(
                [_r6pos(_d2_asc(X, Cl[j])) for j in range(len(Cl))], axis=1
            )
            cell = cd.argmin(axis=1)  # first minimum = smaller cell
            R = X - Cl[cell]
            codes = np.empty((len(X), n_sub), dtype=np.int32)
            for s in range(n_sub):
                rs = R[:, s * sub : (s + 1) * sub]
                dd = np.stack(
                    [_r6pos(_d2_asc(rs, Bl[s, c])) for c in range(Bl.shape[1])],
                    axis=1,
                )
                codes[:, s] = dd.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cell": cell.astype("int32"),
                    "codes": list(codes),
                }
            )

    id_type = dict(emb.dtypes)[id_col]
    return emb.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} {id_type}, cell int, codes array<int>"
    )


def pq_search(
    index: DataFrame,
    queries: DataFrame,
    C: np.ndarray,
    B: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """Asymmetric-distance (ADC) IVF-PQ search: each query probes its
    n_probe nearest coarse cells (6-dp-rounded distance, ties ->
    smaller cell), candidates are the index rows of the probed cells
    (a broadcast join on cell — the partition-pruning shape), and the
    approximate distance is the ADC sum over subspaces
    sum_s ||q_s - C_cell_s - B_s,code_s||^2, 6-dp-rounded before
    ranking (rank ties -> smaller neighbor id).  The exact vectors
    are never touched after indexing."""
    spark = index.sparkSession
    qpdf = queries.select(id_col, vec_col).toPandas()  # bounded query set
    Q = np.stack([np.asarray(v, dtype=np.float64) for v in qpdf[vec_col]])
    qids = qpdf[id_col].to_numpy()
    n_sub = B.shape[0]
    sub = C.shape[1] // n_sub
    # probe set per query (driver-side planning over tiny matrices)
    probes = []
    for qi, q in zip(qids, Q):
        cd = _r6pos(np.array([
            float(_d2_asc(q[None, :], C[j])[0]) for j in range(len(C))
        ]))
        order = np.lexsort((np.arange(len(C)), cd))
        for cell in order[:n_probe]:
            probes.append((int(qi), int(cell)))
    pr = spark.createDataFrame(probes, f"query_id long, cell int")
    cand = index.join(F.broadcast(pr), "cell")
    bc = spark.sparkContext.broadcast((C, B, {int(i): q for i, q in zip(qids, Q)}))

    def gen(pdfs):
        import pandas as pd

        Cl, Bl, qmap = bc.value
        for pdf in pdfs:
            if not len(pdf):
                continue
            dists = np.zeros(len(pdf))
            cells = pdf["cell"].to_numpy()
            codes = np.stack([np.asarray(c) for c in pdf["codes"]])
            qs = np.stack([qmap[int(q)] for q in pdf["query_id"]])
            for s in range(n_sub):
                qsv = qs[:, s * sub : (s + 1) * sub]
                recon = Cl[cells][:, s * sub : (s + 1) * sub] + Bl[s][codes[:, s]]
                diffsq = np.zeros(len(pdf))
                for d in range(sub):  # ascending dims inside subspace
                    dd = qsv[:, d] - recon[:, d]
                    diffsq += dd * dd
                dists += diffsq  # ascending subspaces
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf[id_col].to_numpy(),
                    "adc_dist": _r6pos(dists),
                }
            )

    from pyspark.sql import Window

    scored = cand.mapInPandas(
        gen, schema="query_id long, neighbor_id long, adc_dist double"
    ).where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "adc_dist")
    )
