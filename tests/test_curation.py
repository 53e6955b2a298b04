"""Brute-force property tests for the round-5 curation additions:
bigram-LM scoring, substring-span dedup, sequence packing, PII scrub.
Each operator is checked against an independent plain-Python oracle
on randomized corpora (seeded), not just the DuckDB driver oracle.
"""

from __future__ import annotations

import math
import random
import re
from collections import Counter

from pyspark.sql import functions as F

from sonar_spark.functions.lm import ngram_lm_scores
from sonar_spark.functions.text import PII_EMAIL, PII_IPV4, PII_PHONE, pii_scrub
from sonar_spark.operators.fingerprint import substring_spans
from sonar_spark.operators.packing import pack_sequences

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _corpus(seed: int, n_docs: int, max_len: int = 40):
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        n = rng.randint(1, max_len)
        words = [rng.choice(VOCAB) for _ in range(n)]
        docs.append((i, words))
    # plant a shared phrase in a third of the docs so duplicated
    # spans exist by construction
    phrase = ["omega", "phi", "chi", "psi", "omega", "phi"]
    for i in range(0, n_docs, 3):
        words = docs[i][1]
        at = len(words) // 2
        docs[i] = (i, words[:at] + phrase + words[at:])
    return docs


def test_ngram_lm_matches_python_oracle(spark):
    docs = _corpus(7, 40)
    df = spark.createDataFrame(
        [(i, w) for i, w in docs], "doc_id long, words array<string>"
    )
    got = {
        r["doc_id"]: r
        for r in ngram_lm_scores(df).collect()
    }

    uni: Counter = Counter()
    bigr: Counter = Counter()
    for _, w in docs:
        uni.update(w)
        bigr.update(zip(w, w[1:]))
    N = sum(uni.values())
    V = len(uni)
    k = 0.5
    bits_by_doc = {}
    for i, w in docs:
        micro = 0
        for pos, tok in enumerate(w):
            if pos == 0:
                p = (uni[tok] + k) / (N + k * V)
            else:
                p = (bigr.get((w[pos - 1], tok), 0) + k) / (
                    uni[w[pos - 1]] + k * V
                )
            lp6 = round(math.log2(p), 6)
            micro += round(lp6 * 1e6)
        bits_by_doc[i] = round(-micro / 1e6 / len(w) + 1e-12, 6)
    for i, w in docs:
        assert got[i]["n_tokens"] == len(w)
        assert got[i]["lm_bits"] == bits_by_doc[i]
        assert got[i]["lm_ppl"] == round(2.0 ** bits_by_doc[i], 6)
    # terciles: bucket boundaries follow the (bits, doc_id) order
    order = sorted(bits_by_doc, key=lambda i: (bits_by_doc[i], i))
    n = len(order)
    sizes = [n // 3 + (1 if j < n % 3 else 0) for j in range(3)]
    want_bucket = {}
    at = 0
    for j, sz in enumerate(sizes):
        for i in order[at : at + sz]:
            want_bucket[i] = j + 1
        at += sz
    assert {i: got[i]["lm_bucket"] for i in want_bucket} == want_bucket


def test_substring_spans_matches_python_oracle(spark):
    k = 4
    docs = _corpus(11, 30)
    df = spark.createDataFrame(
        [(i, w) for i, w in docs], "doc_id long, words array<string>"
    )
    got = {r["doc_id"]: r for r in substring_spans(df, k=k).collect()}

    counts: Counter = Counter()
    for _, w in docs:
        for p in range(len(w) - k + 1):
            counts[tuple(w[p : p + k])] += 1
    for i, w in docs:
        marked = set()
        for p in range(len(w) - k + 1):
            if counts[tuple(w[p : p + k])] >= 2:
                marked.update(range(p, p + k))
        # maximal spans = runs of consecutive marked token indices
        spans = []
        for t in sorted(marked):
            if spans and t == spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], t)
            else:
                spans.append((t, t))
        lens = [b - a + 1 for a, b in spans]
        r = got[i]
        assert r["n_tokens"] == len(w)
        assert r["n_dup_spans"] == len(spans)
        assert r["dup_tokens"] == sum(lens)
        assert r["longest_dup_span"] == (max(lens) if lens else 0)
        assert r["dup_token_frac"] == round(sum(lens) / len(w), 6)
    # the planted phrase must surface: every third doc has a span
    assert all(got[i]["n_dup_spans"] >= 1 for i in range(0, 30, 3))


def test_pack_sequences_matches_python_next_fit(spark):
    cap = 50
    rng = random.Random(3)
    rows = [
        (i, f"s{rng.randint(0, 3)}", rng.randint(1, 70)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok int")
    got = {
        r["doc_id"]: r
        for r in pack_sequences(df, capacity=cap).collect()
    }
    assert len(got) == len(rows)

    by_src: dict[str, list[tuple[int, int]]] = {}
    for i, s, n in rows:
        by_src.setdefault(s, []).append((i, n))
    for s, ds in by_src.items():
        b, fill = 0, 0
        for i, n in sorted(ds):
            if fill > 0 and fill + n > cap:
                b, fill = b + 1, 0
            off = fill
            trunc = n > cap
            fill = cap if trunc else off + n
            r = got[i]
            assert (r["source"], r["window_id"], r["window_off"],
                    r["truncated"]) == (s, b, off, trunc)
    # invariants: offsets stay inside the window; both branches live
    assert all(r["window_off"] < cap for r in got.values())
    assert any(r["truncated"] for r in got.values())
    assert any(not r["truncated"] for r in got.values())


def test_pii_scrub_counts_and_idempotence(spark):
    rows = [
        (0, "plain words only"),
        (1, "mail me at a.b@c.d and x9@y.z today"),
        (2, "srv 10.0.0.1 and 192.168.1.255 up"),
        (3, "call 555-0199 or 555-1234 now"),
        (4, "mixed a@b.c 10.1.2.3 555-9999"),
        (5, "dot.name@host.org trailing"),
        (6, "not-a-phone 5555-1234 and 1234.5678 half"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    want = {}
    for i, t in rows:
        want[i] = (
            len(re.findall(PII_EMAIL, t)),
            len(re.findall(PII_IPV4, t)),
            len(re.findall(PII_PHONE, t)),
        )
    for i, (e, ip, ph) in want.items():
        r = got[i]
        assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (e, ip, ph)
    # idempotence: redacting the redacted text changes nothing
    red = df.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("text", PII_EMAIL, "<EMAIL>"),
                PII_IPV4,
                "<IP>",
            ),
            PII_PHONE,
            "<PHONE>",
        ).alias("text"),
    )
    again = {r["doc_id"]: r for r in pii_scrub(red).collect()}
    for i in want:
        assert again[i]["n_emails"] == 0
        assert again[i]["n_ips"] == 0
        assert again[i]["n_phones"] == 0
        assert again[i]["chars_delta"] == 0
