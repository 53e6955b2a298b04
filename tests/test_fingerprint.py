"""MinHash/SimHash/LSH: estimator accuracy vs exact Jaccard (oracle),
planted near-duplicates recovered end-to-end, determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sonar_spark import kernels, oracle
from sonar_spark.config import MinHashConfig
from sonar_spark.operators.fingerprint import (
    lsh_candidate_pairs,
    minhash_fingerprints,
    near_duplicates,
    simhash_near_duplicates,
)

CFG = MinHashConfig(k_shingle=4, num_hashes=128, bands=32, seed=42)


def _shingle_set(tokens, k=4):
    t = list(tokens)
    if len(t) < k:
        t = t + [-1] * (k - len(t))
    out = set()
    B = 1_000_003
    for i in range(len(t) - k + 1):
        h = 0
        for j in range(k):
            h = (h * B + int(t[i + j])) % (1 << 63)  # py ints; engine wraps int64
        out.add(h)
    return out


def test_minhash_estimates_jaccard():
    """MinHash signature agreement ~ exact shingle Jaccard within
    binomial-error bounds (distance.go:198-216 estimand)."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 1000, size=400).astype(np.int64)
    for mut_rate in (0.0, 0.05, 0.2, 0.6):
        other = base.copy()
        idx = rng.random(len(other)) < mut_rate
        other[idx] = rng.integers(1000, 2000, size=int(idx.sum()))
        flat = np.concatenate([base, other])
        lens = np.array([len(base), len(other)])
        sig = kernels.minhash_batch(flat, lens, 4, 256, 42)
        est = (sig[0] == sig[1]).mean()
        sh_a, _ = kernels.shingle_hashes_flat(base, np.array([len(base)]), 4)
        sh_b, _ = kernels.shingle_hashes_flat(other, np.array([len(other)]), 4)
        exact = oracle.jaccard_exact(sh_a.tolist(), sh_b.tolist())
        # 256 hashes: std err = sqrt(j(1-j)/256) <= 0.032; 4 sigma
        assert abs(est - exact) < 0.13, (mut_rate, est, exact)


def test_minhash_identical_and_disjoint():
    a = np.arange(100, dtype=np.int64)
    b = np.arange(1000, 1100, dtype=np.int64)
    sig = kernels.minhash_batch(
        np.concatenate([a, a, b]), np.array([100, 100, 100]), 4, 64, 42
    )
    assert (sig[0] == sig[1]).all()  # identical docs -> identical sigs
    assert (sig[0] == sig[2]).mean() < 0.2  # disjoint -> near-zero agreement


def test_simhash_close_for_near_dup():
    rng = np.random.default_rng(5)
    base = rng.integers(0, 1000, size=500).astype(np.int64)
    near = base.copy()
    near[::50] = 7777  # 2% mutation
    far = rng.integers(0, 1000, size=500).astype(np.int64)
    sim = kernels.simhash_batch(
        np.concatenate([base, near, far]), np.array([500, 500, 500]), 4
    )
    ham_near = bin(int(sim[0]) ^ int(sim[1])).count("1")
    ham_far = bin(int(sim[0]) ^ int(sim[2])).count("1")
    assert ham_near < ham_far
    assert ham_near <= 10


def _planted_docs(spark, n=40):
    """n base docs + near-dup copies of docs 0..4 (ids 1000+i)."""
    rng = np.random.default_rng(9)
    rows = []
    for i in range(n):
        toks = rng.integers(0, 5000, size=200, dtype=np.int64)
        rows.append((f"d{i:04d}", [int(x) for x in toks], 200, "web"))
        if i < 5:
            dup = toks.copy()
            dup[::40] = 4999  # 2.5% mutation -> jaccard ~0.85
            rows.append((f"d{1000+i:04d}", [int(x) for x in dup], 200, "web"))
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )


def test_lsh_recovers_planted_neardups(spark):
    df = _planted_docs(spark)
    pairs = near_duplicates(df, CFG, threshold=0.5).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    want = {(f"d{i:04d}", f"d{1000+i:04d}") for i in range(5)}
    assert want <= got, got
    # no false positives among unrelated docs at this threshold
    assert got == want, got


def test_simhash_near_duplicates_spark(spark):
    """Recall guarantee: every pair within hamming<=3 shares one of 4
    identical 16-bit blocks (pigeonhole), so block-LSH must find it."""
    df = _planted_docs(spark)
    sigs = minhash_fingerprints(df, CFG)
    sims = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    want = set()
    for i in range(5):
        a, b = f"d{i:04d}", f"d{1000+i:04d}"
        if bin(sims[a] ^ sims[b]).count("1") <= 3:
            want.add((a, b))
    pairs = simhash_near_duplicates(sigs, max_hamming=3).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert want <= got
    for r in pairs:  # precision of the hamming column itself
        assert bin(sims[r["doc_a"]] ^ sims[r["doc_b"]]).count("1") == r["hamming"]


def test_fingerprints_deterministic(spark):
    df = _planted_docs(spark)
    a = {r["doc_id"]: (list(r["minhash"]), r["simhash"])
         for r in minhash_fingerprints(df.repartition(1), CFG).collect()}
    b = {r["doc_id"]: (list(r["minhash"]), r["simhash"])
         for r in minhash_fingerprints(df.repartition(5), CFG).collect()}
    assert a == b


def test_simhash_pigeonhole_completeness(spark):
    """Candidate generation by 16-bit blocks must surface EVERY pair
    within hamming <= 3 (pigeonhole: 3 flipped bits cannot touch all
    4 blocks) — compared against brute-force all-pairs hamming."""
    import itertools

    import numpy as np
    from pyspark.sql import functions as F

    from sonar_spark.operators.fingerprint import simhash_near_duplicates

    rng = np.random.default_rng(41)
    base = int(rng.integers(0, 1 << 62))
    sigs = []
    # planted cluster: base signature with 0..3 random bit flips, plus
    # far-away random signatures
    for i in range(8):
        s = base
        for b in rng.choice(62, size=i % 4, replace=False):
            s ^= 1 << int(b)
        sigs.append((f"d{i:02d}", int(s)))
    for i in range(8, 20):
        sigs.append((f"d{i:02d}", int(rng.integers(0, 1 << 62))))
    df = spark.createDataFrame(sigs, "doc_id string, simhash long")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_duplicates(df, max_hamming=3).collect()
    }
    want = set()
    for (ida, sa), (idb, sb) in itertools.combinations(sigs, 2):
        if bin(sa ^ sb).count("1") <= 3:
            want.add(tuple(sorted((ida, idb))))
    assert got == want and len(want) >= 10


def test_connected_components_chain_and_stars(spark):
    """Pointer-jumping min-label propagation: a 12-node path graph
    (worst-case diameter), a star, a triangle, and singletons-by-
    absence all collapse to min-id components in O(log d) rounds."""
    from sonar_spark.operators.fingerprint import connected_components

    edges = (
        # path n00-n01-...-n11 (diameter 11)
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(11)]
        # star centered high, min at a leaf
        + [("s9", "s5"), ("s9", "s3"), ("s9", "s7")]
        # triangle with duplicate + reversed edges
        + [("t2", "t1"), ("t1", "t0"), ("t0", "t2"), ("t1", "t2")]
    )
    df = spark.createDataFrame(edges, "doc_a string, doc_b string")
    got = {
        r["node"]: r["comp"]
        for r in connected_components(df).collect()
    }
    for i in range(12):
        assert got[f"n{i:02d}"] == "n00"
    for s in ("s3", "s5", "s7", "s9"):
        assert got[s] == "s3"
    for t in ("t0", "t1", "t2"):
        assert got[t] == "t0"
    assert len(got) == 12 + 4 + 3


def test_connected_components_random_graphs(spark):
    """Random sparse graphs vs a scalar union-find: component labels
    must equal the min reachable node id everywhere (pointer jumping
    converges within the iteration cap on every topology)."""
    import numpy as np

    rng = np.random.default_rng(77)
    for trial in range(4):
        n = int(rng.integers(20, 60))
        m = int(rng.integers(10, 80))
        edges = [
            (f"v{int(a):03d}", f"v{int(b):03d}")
            for a, b in rng.integers(0, n, size=(m, 2))
            if a != b
        ]
        if not edges:
            continue
        # union-find reference
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {}
        for a, b in edges:
            want[a] = min(want.get(a, a), find(a))
            want[b] = min(want.get(b, b), find(b))
        # canonical: min node id of the component
        comp_min = {}
        for x in want:
            r = find(x)
            comp_min[r] = min(comp_min.get(r, x), x)
        want = {x: comp_min[find(x)] for x in want}

        from sonar_spark.operators.fingerprint import (
            connected_components,
        )

        df = spark.createDataFrame(
            edges, "doc_a string, doc_b string"
        )
        got = {
            r["node"]: r["comp"]
            for r in connected_components(df).collect()
        }
        assert got == want, trial


# ------------------------------------------------------- winnowing


def _winnow_scalar(words, k=4, w=4):
    """Line-for-line scalar winnowing (Schleimer et al. 2003): hash
    every k-shingle (md5-prefix, the engine's convention), slide a
    w-window over the hashes, select each window's min with ties to
    the RIGHTMOST; distinct (hash, pos)."""
    import hashlib

    n_sh = max(len(words) - (k - 1), 1)
    hs = []
    for i in range(n_sh):
        s = " ".join(words[i : i + k])
        hs.append(int(hashlib.md5(s.encode()).hexdigest()[:8], 16))
    out = set()
    for j in range(max(len(hs) - (w - 1), 1)):
        win = hs[j : j + w]
        m = min(win)
        # rightmost occurrence of the min
        pos = j + max(i for i, h in enumerate(win) if h == m) + 1
        out.add((m, pos))
    return out


def test_winnow_matches_scalar_reference(spark):
    """Engine winnowing == the scalar algorithm on random docs,
    including docs shorter than k and shorter than k+w-1."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    want = {}
    for d in range(40):
        n = rng.choice([1, 2, 3, 4, 5, 6, 7, 10, 25, 60])
        words = [rng.choice(vocab) for _ in range(n)]
        rows.append((str(d), words))
        want[str(d)] = _winnow_scalar(words)
    from sonar_spark.operators.fingerprint import winnow_fingerprints

    df = spark.createDataFrame(rows, "doc_id string, words array<string>")
    got = {}
    for r in winnow_fingerprints(df, k=4, w=4).collect():
        got.setdefault(r["doc_id"], set()).add((r["fp"], r["pos"]))
    assert got == want


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """The winnowing guarantee: two docs sharing a token run of
    length >= w + k - 1 share at least one fingerprint VALUE."""
    import random

    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(50)]
    rows = []
    for d in range(20):
        a = [rng.choice(vocab) for _ in range(30)]
        run = [rng.choice(vocab) for _ in range(7)]  # w + k - 1
        b = [rng.choice(vocab) for _ in range(15)] + run + [
            rng.choice(vocab) for _ in range(8)
        ]
        ia = rng.randrange(0, len(a) - 6)
        a = a[:ia] + run + a[ia + 7 :]
        rows.append((f"a{d}", a))
        rows.append((f"b{d}", b))
    from sonar_spark.operators.fingerprint import winnow_fingerprints

    df = spark.createDataFrame(rows, "doc_id string, words array<string>")
    fps = {}
    for r in winnow_fingerprints(df, k=4, w=4).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    for d in range(20):
        assert fps[f"a{d}"] & fps[f"b{d}"], d


def test_fingerprint_matches_caps_and_scores(spark):
    """Stop-fingerprint cap drops ubiquitous fps; overlap uses the
    UNCAPPED per-doc counts; identical docs score overlap 1.0."""
    from sonar_spark.operators.fingerprint import (
        fingerprint_matches,
        winnow_fingerprints,
    )

    boiler = ["x"] * 10  # identical boilerplate in every doc
    rows = [(f"d{i}", boiler) for i in range(10)]
    # two identical docs with unique content
    uniq = [f"u{i}" for i in range(20)]
    rows += [("p1", uniq), ("p2", list(uniq))]
    df = spark.createDataFrame(rows, "doc_id string, words array<string>")
    fps = winnow_fingerprints(df, k=4, w=4)
    out = fingerprint_matches(fps, max_doc_freq=8, min_shared=3).collect()
    # the boilerplate fp appears in 12 docs > 8 -> capped; only the
    # planted identical pair survives
    assert {(r["doc_a"], r["doc_b"]) for r in out} == {("p1", "p2")}
    assert out[0]["overlap"] == 1.0


def test_repetition_profile_crafted(spark):
    """Exact metric values on hand-computable docs."""
    from sonar_spark.functions.text import repetition_profile

    rows = [
        ("loop", ["a"] * 6),            # 4 3-grams all equal
        ("clean", [f"v{i}" for i in range(8)]),
        ("half", ["a", "b", "a", "b", "a", "b"]),
    ]
    df = spark.createDataFrame(rows, "doc_id string, words array<string>")
    got = {r["doc_id"]: r for r in repetition_profile(df).collect()}
    r = got["loop"]
    assert r["top_word_frac"] == 1.0
    assert r["dup_3gram_frac"] == 0.75  # 1 - 1/4
    assert r["flagged"]
    r = got["clean"]
    assert r["top_word_frac"] == 0.125
    assert r["dup_3gram_frac"] == 0.0 and r["dup_5gram_frac"] == 0.0
    assert not r["flagged"]
    r = got["half"]
    assert r["top_word_frac"] == 0.5
    # 3-grams: aba bab aba bab -> 1 - 2/4
    assert r["dup_3gram_frac"] == 0.5
    assert r["flagged"]


def test_incremental_dedup_verdicts(spark):
    """Exact copies -> exact_of; trimmed near-dups -> best_match;
    fresh docs -> keep; corpus x corpus pairs never influence the
    batch verdicts."""
    from pyspark.sql import functions as F

    from sonar_spark.operators.fingerprint import incremental_dedup

    def wdf(rows):
        return spark.createDataFrame(
            rows, "doc_id string, words array<string>"
        )

    vocab = [f"w{i}" for i in range(30)]
    corpus = wdf(
        [
            ("c1", vocab[:12]),
            ("c2", vocab[:12]),          # corpus-internal dup: ignored
            ("c3", vocab[12:26]),
            ("c4", ["zz"] * 6),
        ]
    )
    batch = wdf(
        [
            ("b1", vocab[:12]),          # exact copy of c1 AND c2
            ("b2", vocab[12:24]),        # near-dup of c3 (trimmed)
            ("b3", ["qq", "rr", "ss", "tt", "uu"]),  # fresh
        ]
    )
    got = {
        r["doc_id"]: r
        for r in incremental_dedup(batch, corpus, threshold=0.8).collect()
    }
    assert set(got) == {"b1", "b2", "b3"}
    assert got["b1"]["exact_of"] == "c1" and got["b1"]["n_exact"] == 2
    assert got["b1"]["keep"] is False
    assert got["b2"]["exact_of"] is None
    assert got["b2"]["best_match"] == "c3"
    # jaccard of 4-shingles: b2 has 9 shingles, c3 has 11, share 9
    assert got["b2"]["best_jaccard"] == round(9 / 11, 6)
    assert got["b2"]["keep"] is False
    assert got["b3"]["exact_of"] is None
    assert got["b3"]["best_match"] is None
    assert got["b3"]["keep"] is True


def test_incremental_dedup_candidate_injection(spark):
    """A recall-1 candidate source must reproduce the shingle-path
    result exactly; a candidate set MISSING the true pair loses it
    (the verification stage never invents pairs)."""
    from pyspark.sql import functions as F

    from sonar_spark.operators.fingerprint import incremental_dedup

    vocab = [f"w{i}" for i in range(30)]
    corpus = spark.createDataFrame(
        [("c1", vocab[:14]), ("c2", vocab[14:28])],
        "doc_id string, words array<string>",
    )
    batch = spark.createDataFrame(
        [("b1", vocab[:12])], "doc_id string, words array<string>"
    )
    want = sorted(
        map(tuple, incremental_dedup(batch, corpus).collect())
    )
    full = spark.createDataFrame(
        [("b1", "c1"), ("b1", "c2")], "b_id string, c_id string"
    )
    got = sorted(
        map(
            tuple,
            incremental_dedup(
                batch, corpus, candidate_pairs=full
            ).collect(),
        )
    )
    assert got == want
    empty = full.where(F.lit(False))
    miss = incremental_dedup(
        batch, corpus, candidate_pairs=empty
    ).collect()
    assert miss[0]["best_match"] is None
