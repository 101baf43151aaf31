"""Incremental streaming ER (streaming/incremental.py): appending turns
through the delta-bipartite merge must yield EXACTLY the clusters of a
full batch recompute — same mention_id -> cluster_id mapping — and a
retried epoch must be a no-op (effectively-once state commits)."""

from spel_spark.operators.mentions import (
    extract_mentions,
    with_mention_id,
    with_norm_surface,
)
from spel_spark.pipeline import PipelineConfig, run_pipeline
from spel_spark.streaming.incremental import (
    merge_batch,
    read_clusters,
    start_incremental_er,
)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _mentions(spark, pdf):
    return with_mention_id(
        with_norm_surface(extract_mentions(spark.createDataFrame(pdf, schema=SCHEMA)))
    )


def _cluster_map(df):
    return {r.mention_id: r.cluster_id
            for r in df.select("mention_id", "cluster_id").collect()}


def _batch_clusters(spark, pdf):
    # exact_pairs: the incremental path generates ALL pairs sharing a
    # block key (delta-bipartite union over epochs), i.e. the exact-pair
    # semantics; anchor sparsification is a batch-mode optimization
    return run_pipeline(
        spark,
        spark.createDataFrame(pdf, schema=SCHEMA),
        store=None,
        config=PipelineConfig(exact_pairs=True),
    )


def test_incremental_merge_equals_batch(spark, corpus, tmp_path):
    state = str(tmp_path / "state")
    pdf = corpus.transcripts.head(1000)
    merge_batch(spark, _mentions(spark, pdf.iloc[:600]), state, epoch=0)
    final = merge_batch(spark, _mentions(spark, pdf.iloc[600:]), state, epoch=1)
    want = _cluster_map(_batch_clusters(spark, pdf))
    assert _cluster_map(final) == want
    # the committed snapshot is the same assignment
    assert _cluster_map(read_clusters(spark, state)) == want


def test_incremental_epoch_retry_is_idempotent(spark, corpus, tmp_path):
    """foreachBatch is at-least-once: re-running an epoch (executor loss
    after a partial state write) must reproduce identical state, because
    every input of epoch e is filtered to epoch < e."""
    state = str(tmp_path / "state_retry")
    pdf = corpus.transcripts.head(400)
    merge_batch(spark, _mentions(spark, pdf.iloc[:250]), state, epoch=0)
    b2 = _mentions(spark, pdf.iloc[250:])
    first = _cluster_map(merge_batch(spark, b2, state, epoch=1))
    retried = _cluster_map(merge_batch(spark, b2, state, epoch=1))
    assert first == retried
    assert _cluster_map(read_clusters(spark, state)) == first


def test_corrupt_state_fails_batch_instead_of_resetting(spark, corpus, tmp_path):
    """A state table that EXISTS but cannot be read must raise (so the
    streaming checkpoint retries the batch) — mapping it to 'no state'
    would silently drop this epoch's new-vs-old pairs forever."""
    import pytest

    state = str(tmp_path / "state_bad")
    pdf = corpus.transcripts.head(200)
    merge_batch(spark, _mentions(spark, pdf.iloc[:100]), state, epoch=0)
    # replace the blocks table with an unreadable non-parquet file
    import shutil

    shutil.rmtree(f"{state}/blocks")
    with open(f"{state}/blocks", "w") as f:
        f.write("not parquet")
    with pytest.raises(Exception):
        merge_batch(spark, _mentions(spark, pdf.iloc[100:]), state, epoch=1)


def test_streaming_incremental_er_matches_batch(spark, corpus, tmp_path):
    """End-to-end through foreachBatch: two availableNow drains sharing a
    checkpoint (two separate epochs — one drain would coalesce the files
    into a single batch) == one batch recompute."""
    src = str(tmp_path / "src")
    state = str(tmp_path / "state_stream")
    ckpt = str(tmp_path / "ckpt")
    pdf = corpus.transcripts.head(600)
    spark.createDataFrame(pdf.iloc[:400], schema=SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = start_incremental_er(spark, src, state, ckpt)
    q.awaitTermination(180)
    spark.createDataFrame(pdf.iloc[400:], schema=SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = start_incremental_er(spark, src, state, ckpt)
    q.awaitTermination(180)
    got = _cluster_map(read_clusters(spark, state))
    assert got == _cluster_map(_batch_clusters(spark, pdf))
