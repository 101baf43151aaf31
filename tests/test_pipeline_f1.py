"""End-to-end: pairwise F1 >= 0.99 (the north-rule gate), score symmetry,
resume-from-checkpoint equality, lineage completeness."""

import pytest
from pyspark.sql import functions as F

from spel_spark.operators.metrics import (
    pairwise_f1_by_block,
    pairwise_micro_f1,
    resolve_labeled_pairs,
)
from spel_spark.operators.scoring import score_pairs
from spel_spark.pipeline import STAGES, run_pipeline


@pytest.fixture(scope="module")
def pipeline_out(spark, corpus, transcripts_df, tmp_path_factory):
    from spel_spark.io import CheckpointStore

    base = str(tmp_path_factory.mktemp("ckpt_e2e"))
    store = CheckpointStore(spark, base)
    redirects = spark.createDataFrame(corpus.redirects)
    clusters = run_pipeline(spark, transcripts_df, store, redirects=redirects)
    return store, clusters


def test_pairwise_f1_meets_north_rule(spark, corpus, pipeline_out):
    _, clusters = pipeline_out
    labeled = spark.createDataFrame(corpus.labeled_pairs)
    row = pairwise_micro_f1(resolve_labeled_pairs(labeled, clusters)).collect()[0]
    assert row.precision >= 0.99, row
    assert row.recall >= 0.99, row
    assert row.f1 >= 0.99, row


def test_per_block_f1(spark, corpus, pipeline_out):
    _, clusters = pipeline_out
    labeled = spark.createDataFrame(corpus.labeled_pairs)
    per = pairwise_f1_by_block(resolve_labeled_pairs(labeled, clusters))
    has_pos = (F.col("tp") + F.col("fn")) > 0
    # blocks with gold positives: no catastrophic block; negative-only
    # blocks (near-miss families): zero false positives
    bad = per.filter(
        (has_pos & (F.col("n_pairs") >= 50) & (F.col("f1") < 0.9))
        | (~has_pos & (F.col("fp") > 0))
    )
    assert bad.count() == 0, bad.collect()


def test_resume_reuses_checkpoints(spark, corpus, transcripts_df, pipeline_out):
    """Second run over a committed store must reuse every stage and produce
    identical clusters (reference analogue: continue_from_previous_checkpoint,
    src/spel/finetune_step_1.py:65-66)."""
    store, clusters = pipeline_out
    for s in STAGES:
        assert store.exists(s), s
    redirects = spark.createDataFrame(corpus.redirects)
    again = run_pipeline(spark, transcripts_df, store, redirects=redirects)
    a = {(r.mention_id, r.cluster_id) for r in clusters.collect()}
    b = {(r.mention_id, r.cluster_id) for r in again.collect()}
    assert a == b


def test_resume_after_partial_failure(spark, corpus, transcripts_df, pipeline_out):
    """Simulate a crash: delete the tail stages, rerun, verify identical
    output and that early stages were NOT recomputed (mtime unchanged)."""
    import os

    store, clusters = pipeline_out
    a = {(r.mention_id, r.cluster_id) for r in clusters.collect()}  # before delete
    before = os.path.getmtime(os.path.join(store.base_dir, "mentions", "_SUCCESS"))
    for s in ["edges", "clusters"]:
        store.delete(s)
    redirects = spark.createDataFrame(corpus.redirects)
    again = run_pipeline(spark, transcripts_df, store, redirects=redirects)
    after = os.path.getmtime(os.path.join(store.base_dir, "mentions", "_SUCCESS"))
    assert before == after
    b = {(r.mention_id, r.cluster_id) for r in again.collect()}
    assert a == b


def test_lineage_written_per_stage(pipeline_out):
    store, _ = pipeline_out
    stages = {r.stage for r in store.read_lineage().select("stage").distinct().collect()}
    for s in STAGES:
        assert s in stages, s


def test_score_symmetry(spark, pipeline_out):
    """s(a,b) == s(b,a): swap the surface columns and rescore."""
    store, _ = pipeline_out
    pairs = store.read("pairs").limit(200)
    fwd = score_pairs(pairs).select("a_id", "b_id", "score")
    swapped = pairs.select(
        "a_id", "b_id",
        F.col("b_norm").alias("a_norm"), F.col("a_norm").alias("b_norm"),
        "block_key",
    )
    rev = score_pairs(swapped).select("a_id", "b_id", F.col("score").alias("score_rev"))
    j = fwd.join(rev, ["a_id", "b_id"])
    bad = j.filter(F.abs(F.col("score") - F.col("score_rev")) > 1e-9)
    assert bad.count() == 0


def test_clusters_cover_all_mentions(spark, pipeline_out):
    store, _ = pipeline_out
    clusters = store.read("clusters")  # re-read: prior test rewrote the stage
    assert clusters.count() == store.read("mentions").count()
    assert clusters.filter(F.col("cluster_id").isNull()).count() == 0
