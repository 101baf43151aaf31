"""Blocking: LSH determinism, seed independence, salted self-join == naive."""

from itertools import combinations

from pyspark.sql import functions as F

from spel_spark.operators.blocking import (
    LSH_SEEDS,
    blocking_keys,
    minhash_signature,
    salted_pairs,
    surface_nodes,
)


def _surfaces(spark, names):
    df = spark.createDataFrame([(s, 1) for s in names], "norm_surface string, n_mentions int")
    return df.withColumn("surface_id", F.xxhash64("norm_surface"))


def test_minhash_deterministic(spark):
    df = _surfaces(spark, ["kamora ledger", "pivek solar"])
    a = minhash_signature(df).orderBy("norm_surface").collect()
    b = minhash_signature(df).orderBy("norm_surface").collect()
    assert a == b


def test_minhash_seeds_vary(spark):
    """Regression: all 16 hashes must differ per surface (the 2-arg-lambda
    index bug produced identical columns)."""
    df = _surfaces(spark, ["kamora ledger"])
    row = minhash_signature(df).collect()[0]
    vals = {row[f"mh_{i}"] for i in range(len(LSH_SEEDS))}
    assert len(vals) > len(LSH_SEEDS) // 2


def test_lsh_recalls_typo(spark):
    df = _surfaces(spark, ["feemur voskin", "fevmur voskin"])
    keys = blocking_keys(df)
    shared = (
        keys.groupBy("block_key")
        .count()
        .filter((F.col("count") > 1) & F.col("block_key").startswith("b"))
    )
    assert shared.count() >= 1


def test_first_token_key_recalls_truncation(spark):
    df = _surfaces(spark, ["kamora", "kamora ledger"])
    pairs = salted_pairs(blocking_keys(df))
    assert pairs.count() == 1


def test_salted_equals_naive(spark):
    """Triangle-replicated self-join == naive combinations, even when the
    block is forced to salt (max_cell=2 on a 9-member block)."""
    names = [f"hot {i}" for i in range(9)]
    df = _surfaces(spark, names)
    blocks = df.select(
        "surface_id", "norm_surface", F.lit("k:hot").alias("block_key")
    )
    got = {
        (r.a_id, r.b_id)
        for r in salted_pairs(blocks, max_cell=2, max_salts=8).collect()
    }
    ids = sorted(r.surface_id for r in df.collect())
    want = {(a, b) for a, b in combinations(ids, 2)}
    assert got == want


def test_salted_pairs_dedup_across_families(spark):
    df = _surfaces(spark, ["kamora ledger", "kamora ledgex"])
    pairs = salted_pairs(blocking_keys(df)).collect()
    assert len(pairs) == 1  # shares f: and several b: keys, but one row out


def test_surface_nodes_counts(spark):
    m = spark.createDataFrame(
        [("search", 10), ("search", 7), ("kamora ledger", 3)],
        "norm_surface string, mention_id long",
    )
    rows = {r.norm_surface: r for r in surface_nodes(m).collect()}
    assert rows["search"].n_mentions == 2
    assert rows["search"].min_mention_id == 7
    assert rows["kamora ledger"].n_mentions == 1


def test_salted_id_pairs_equals_naive(spark):
    """Payload-free salted self-join == naive all-pairs, including an
    oversized hot block that spans multiple salt cells."""
    import itertools

    from spel_spark.operators.blocking import salted_id_pairs

    rows = [(i, "hot") for i in range(300)] + [
        (1000 + i, f"cold{i % 7}" ) for i in range(70)
    ]
    df = spark.createDataFrame(rows, "id long, block_key string")
    got = {
        (r.a_id, r.b_id)
        for r in salted_id_pairs(df, max_cell=32, max_salts=16).collect()
    }
    want = set()
    by_key = {}
    for i, k in rows:
        by_key.setdefault(k, []).append(i)
    for members in by_key.values():
        for a, b in itertools.combinations(sorted(members), 2):
            want.add((a, b))
    assert got == want


def test_two_phase_anchor_election_matches_single_window(spark):
    from spel_spark.operators.blocking import anchor_pairs

    """The salted two-phase anchor election must pick EXACTLY the anchors
    a single per-block window would (top-k composes across phases)."""
    import random

    from pyspark.sql import Window

    rng = random.Random(5)
    rows = []
    for blk in range(12):
        for s in range(rng.randint(2, 200)):
            rows.append((blk * 10000 + s, f"s{blk}_{s}", rng.randint(1, 50), f"b{blk}"))
    blocks = spark.createDataFrame(
        rows, "surface_id long, norm_surface string, n_mentions long, block_key string"
    )
    pairs = anchor_pairs(blocks, n_anchors=2, full_block_limit=1)
    # oracle: single-window top-2 anchors per block, then member-anchor pairs
    w = Window.partitionBy("block_key").orderBy(
        F.col("n_mentions").desc(), F.col("surface_id")
    )
    top = (
        blocks.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("block_key", F.col("surface_id").alias("anchor_id"))
    )
    want = {
        (min(r.surface_id, r.anchor_id), max(r.surface_id, r.anchor_id))
        for r in blocks.join(top, "block_key").collect()
        if r.surface_id != r.anchor_id
    }
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    assert got == want
