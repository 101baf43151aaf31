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
