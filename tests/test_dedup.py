"""Dedup operators: simhash, minhash near-dup, flagship doc clustering."""

import pytest
from pyspark.sql import functions as F

from spel_spark.operators.dedup import (
    cluster_documents,
    minhash_near_dup_pairs,
    simhash64,
    simhash_candidate_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 1
    (3, "spark shuffles partitions across executors with hash partitioning"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (5, "completely unrelated text about cooking pasta with tomato sauce basil"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_simhash_deterministic_and_exact_dup(spark, docs):
    s1 = {r.doc_id: r.simhash for r in simhash64(docs).collect()}
    s2 = {r.doc_id: r.simhash for r in simhash64(docs).collect()}
    assert s1 == s2
    assert s1[1] == s1[4]  # identical text -> identical simhash
    assert s1[1] != s1[3]


def test_simhash_near_dup_pairs(spark, docs):
    pairs = {
        (r.a_id, r.b_id): r.hamming
        for r in simhash_candidate_pairs(simhash64(docs), max_hamming=16).collect()
    }
    assert (1, 4) in pairs and pairs[(1, 4)] == 0
    assert (1, 2) in pairs and pairs[(1, 2)] <= 16
    assert (3, 5) not in pairs


def test_minhash_near_dup_pairs(spark, docs):
    got = {(r.a_id, r.b_id) for r in minhash_near_dup_pairs(docs, jaccard_threshold=0.8).collect()}
    assert (1, 4) in got
    assert (1, 2) in got
    assert all(p[0] != 3 and p[1] != 3 for p in got)


def test_multi_space_tokenization_drops_empty_tokens(spark):
    """Runs of spaces must not create '' tokens: a constant empty-token
    hash biases SimHash bit-sums and MinHash Jaccard estimates the same
    way on every document (round-3 verdict #7).  Spacing-only variants of
    one text must be exact signature duplicates / Jaccard-1.0 pairs."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha  beta   gamma    delta"),  # space runs only
            (3, " alpha beta gamma delta "),  # leading/trailing
        ],
        "doc_id long, text string",
    )
    sh = {r.doc_id: r.simhash for r in simhash64(docs).collect()}
    assert sh[1] == sh[2] == sh[3]
    mh = {
        (r.a_id, r.b_id): r.jacc
        for r in minhash_near_dup_pairs(docs, jaccard_threshold=0.8).collect()
    }
    assert mh == {(1, 2): 1.0, (1, 3): 1.0, (2, 3): 1.0}


def test_content_free_docs_stay_singletons(spark):
    """Documents with no content tokens ('' or whitespace-only) emit no
    signature row BY DESIGN: they never near-dup pair (similarity over an
    empty token set is meaningless — exact dedup owns content-free
    duplicates), and no downstream consumer loses them because cluster
    assignment left-joins the doc table (singleton fallback)."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real content here")],
        "doc_id long, text string",
    )
    assert simhash64(docs).count() == 1  # only doc 3
    assert minhash_near_dup_pairs(docs, jaccard_threshold=0.8).count() == 0


def test_simhash_degenerate_band_matches_naive(spark):
    """Skew gate: 400 near-identical docs (27 shared tokens, 1 unique) land
    in shared 16-bit band buckets — the worst case the salted candidate
    join exists for.  The salted path must return EXACTLY the pairs the
    naive bucket-and-verify algorithm defines (computed in pure Python
    from the collected signatures)."""
    base = " ".join(f"tok{i}" for i in range(27))
    docs = spark.createDataFrame(
        [(i, f"{base} uniq{i}") for i in range(400)], "doc_id long, text string"
    )
    sims = {r.doc_id: r.simhash for r in simhash64(docs).collect()}

    # pure-Python twin of the naive band-bucket + hamming verify
    from collections import defaultdict
    from itertools import combinations

    buckets = defaultdict(set)
    for d, sh in sims.items():
        for j in range(4):
            buckets[(j, (sh >> (16 * j)) & 0xFFFF)].add(d)
    # every doc must actually share a bucket with many others (degenerate)
    assert max(len(v) for v in buckets.values()) >= 100
    want = set()
    for members in buckets.values():
        for a, b in combinations(sorted(members), 2):
            ham = bin(((sims[a] ^ sims[b]) & ((1 << 64) - 1))).count("1")
            if ham <= 8:
                want.add((a, b))
    got = {
        (r.a_id, r.b_id)
        for r in simhash_candidate_pairs(simhash64(docs), max_hamming=8).collect()
    }
    assert got == want
    assert len(got) > 1000  # the degenerate corpus really is dense


def test_cluster_documents_flagship(spark):
    out = cluster_documents(spark, "/root/testdata/sf0.001")
    n = out.count()
    assert n == spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    # deterministic across runs
    a = sorted((r.doc_id, r.cluster_id) for r in out.collect())
    b = sorted(
        (r.doc_id, r.cluster_id)
        for r in cluster_documents(spark, "/root/testdata/sf0.001").collect()
    )
    assert a == b
