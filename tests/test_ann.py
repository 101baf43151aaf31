"""ANN: LSH-bucketed top-k recall vs brute-force cosine."""

import pytest
from pyspark.sql import functions as F

from spel_spark.operators.ann import ann_lsh_topk, with_lsh_signature
from spel_spark.queries import q_ann_topk_cosine

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vecs(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .cache()
    )


def test_lsh_signature_deterministic(spark, vecs):
    a = {r.vec_id: r.lsh_sig for r in with_lsh_signature(vecs.limit(50)).collect()}
    b = {r.vec_id: r.lsh_sig for r in with_lsh_signature(vecs.limit(50)).collect()}
    assert a == b


def test_lsh_topk_recall_vs_brute_force(spark, vecs):
    brute = {
        (r.q_id, r.nbr_id)
        for r in q_ann_topk_cosine(spark, SF).collect()
    }
    queries = vecs.filter(F.col("vec_id") < 10)
    lsh = {
        (r.q_id, r.nbr_id)
        for r in ann_lsh_topk(vecs, queries, k=5, n_bits=16, bands=4).collect()
    }
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.5, recall  # 4 bands x 4 bits on 64-dim embeddings


def test_salted_bipartite_pairs_match_naive_on_hot_key(spark):
    """Skew gate for the LSH bucket join: one hot band key shared by 200
    corpus rows and 20 queries, max_cell forced tiny (8) so the hot key
    splits into many salt cells.  Salted output must equal the naive
    bipartite equi-join exactly."""
    from spel_spark.operators.ann import salted_bipartite_id_pairs

    right = spark.createDataFrame(
        [(i, "hot") for i in range(200)] + [(i, f"cold{i % 7}") for i in range(200, 260)],
        "nbr_id long, band string",
    )
    left = spark.createDataFrame(
        [(i, "hot") for i in range(20)] + [(201, "cold3"), (202, "coldX")],
        "q_id long, band string",
    )
    got = {
        (r.q_id, r.nbr_id)
        for r in salted_bipartite_id_pairs(
            left, right, "q_id", "nbr_id", max_cell=8
        ).collect()
    }
    want = {
        (ql, nr)
        for ql, qb in [(r.q_id, r.band) for r in left.collect()]
        for nr, nb in [(r.nbr_id, r.band) for r in right.collect()]
        if qb == nb
    }
    assert got == want
    n_cold3 = sum(1 for i in range(200, 260) if i % 7 == 3)
    assert len(want) == 20 * 200 + n_cold3  # hot block + cold3; coldX matches nothing


def test_lsh_band_join_carries_ids_only(spark, vecs):
    """Scale shape: the banded bucket join must not replicate vectors
    through the explode — vector columns may only be joined back AFTER
    the candidate dedup (verdict r2 finding #2).  Checkable plan fact:
    the distinct over candidates aggregates on id columns only (the old
    plan's distinct keys included q_id_v/nbr_id_v array payloads)."""
    import re

    from spel_spark.plans import physical_plan

    queries = vecs.filter(F.col("vec_id") < 10)
    plan = physical_plan(ann_lsh_topk(vecs, queries, k=5))
    agg_keys = re.findall(r"HashAggregate\(keys=\[([^\]]*)\]", plan)
    assert agg_keys, plan  # the candidate dedup must exist
    for keys in agg_keys:
        assert "v#" not in keys, keys


def test_ivf_assign_covers_all_cells_used(spark, vecs):
    from spel_spark.operators.ann import ivf_assign, ivf_centroids

    cents = ivf_centroids(vecs, nlist=8, seed=42)
    assert len(cents) == 8
    assigned = ivf_assign(vecs, cents)
    cells = {r.cell for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(8)) and len(cells) >= 2
    # deterministic
    cents2 = ivf_centroids(vecs, nlist=8, seed=42)
    assert cents == cents2


def test_ivf_topk_recall_vs_brute_force(spark, vecs):
    from spel_spark.operators.ann import ann_ivf_topk, ivf_centroids

    brute = {(r.q_id, r.nbr_id) for r in q_ann_topk_cosine(spark, SF).collect()}
    queries = vecs.filter(F.col("vec_id") < 10)
    cents = ivf_centroids(vecs, nlist=8, seed=42)
    ivf = {
        (r.q_id, r.nbr_id)
        for r in ann_ivf_topk(
            vecs, queries, k=5, nprobe=4, centroids=cents
        ).collect()
    }
    recall = len(brute & ivf) / len(brute)
    # probing half the cells of a trained quantizer should catch most
    assert recall >= 0.6, recall


def test_ivf_full_probe_equals_brute(spark, vecs):
    """nprobe == nlist degenerates to exact brute force — recall 1.0."""
    from spel_spark.operators.ann import ann_ivf_topk, ivf_centroids

    brute = {(r.q_id, r.nbr_id) for r in q_ann_topk_cosine(spark, SF).collect()}
    queries = vecs.filter(F.col("vec_id") < 10)
    cents = ivf_centroids(vecs, nlist=4, seed=42)
    ivf = {
        (r.q_id, r.nbr_id)
        for r in ann_ivf_topk(vecs, queries, k=5, nprobe=4, centroids=cents).collect()
    }
    assert ivf == brute
