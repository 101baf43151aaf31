"""End-to-end entity-resolution pipeline with checkpointed stages + resume.

Stage DAG (each stage an atomic checkpoint + per-partition lineage rows,
resumable from the last committed stage — north rule):

  transcripts
    -> mentions     (extract + normalize + redirect + mention_id)
    -> surfaces     (distinct norm surfaces = dedup of the Zipf head)
    -> blocks       (3 key families, exploded)
    -> pairs        (salted self-join over distinct surfaces)
    -> scores       (blended similarity)
    -> edges        (threshold)
    -> components   (large-star/small-star CC, per-iteration checkpoint)
    -> clusters     (mention -> canonical min-mention-id cluster)

The reference's equivalent lifecycle is EP1 (SURVEY §3): per-document
Python loop -> here, partition parallelism over conversations.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spel_spark.io import CheckpointStore
from spel_spark.operators.blocking import (
    anchor_pairs,
    blocking_keys,
    salted_pairs,
    surface_nodes,
)
from spel_spark.operators.clustering import assign_clusters, connected_components
from spel_spark.operators.mentions import (
    extract_mentions,
    extract_mentions_arrow,
    with_mention_id,
    with_norm_surface,
)
from spel_spark.operators.scoring import DEFAULT_THRESHOLD, score_pairs, threshold_edges

STAGES = ["mentions", "surfaces", "blocks", "pairs", "scores", "edges", "clusters"]


def mentions_storage_level():
    """Storage level for the (wide) mentions persist, shared by the fused
    pipeline and bench.py so the bench always measures the shipped plan.
    MEMORY_AND_DISK default (pinned A/B at 8M turns with the 32g heap:
    62.2 s vs 63.7 s DISK_ONLY at 8 threads); override with
    SPEL_MENTIONS_STORAGE for small-heap deployments."""
    import os

    from pyspark import StorageLevel

    name = os.environ.get("SPEL_MENTIONS_STORAGE", "MEMORY_AND_DISK")
    lvl = getattr(StorageLevel, name, None)
    if not isinstance(lvl, StorageLevel):
        valid = [n for n in dir(StorageLevel) if n[0].isupper()]
        raise ValueError(
            f"SPEL_MENTIONS_STORAGE={name!r} is not a pyspark StorageLevel; "
            f"valid: {', '.join(valid)}"
        )
    return lvl


@dataclass
class PipelineConfig:
    threshold: float = DEFAULT_THRESHOLD
    max_cell: int = 1024
    max_salts: int = 64
    use_arrow_extractor: bool = False
    use_cosine: bool = False
    # persist the (wide) mentions table in ephemeral mode: trades one full
    # re-extract pass in assign_clusters for a columnar cache fill
    persist_mentions: bool = True
    # anchor-sparsified pair generation (O(n·k) per block) vs exact
    # all-pairs (O(n²), salted).  Anchors are the scale default.
    exact_pairs: bool = False
    n_anchors: int = 2


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    store: CheckpointStore | None,
    redirects: DataFrame | None = None,
    config: PipelineConfig | None = None,
    resume: bool = True,
) -> DataFrame:
    """Run (or resume) the full flow; returns the clusters DataFrame.

    Resume: a stage whose checkpoint committed (atomic rename / Iceberg
    snapshot) is read back instead of recomputed — the analogue of the
    reference's continue_from_previous_checkpoint
    (src/spel/finetune_step_1.py:65-66).  ``store=None`` runs ephemerally
    (localCheckpoint only, no durability — for quick evaluations).
    """
    cfg = config or PipelineConfig()

    # single-consumer stages are fused, not persisted: scores feeds only
    # edges, blocks feeds only pairs, pairs feeds only scores — persisting
    # them pays a cache fill nothing reads twice (r5: dropping the blocks/
    # pairs persists removed two serial materialization barriers from the
    # fused DAG).  mentions defaults to persisted (columnar cache): the
    # 8M-turn scaling runs showed the re-extract pass in assign_clusters
    # costs more than the cache fill; surfaces (tiny) is read by blocks
    # AND assign; edges by CC's backend-selection count AND the collect.
    _EPHEMERAL_NO_PERSIST = {"scores", "clusters", "blocks", "pairs"} | (
        set() if cfg.persist_mentions else {"mentions"}
    )

    def stage(name: str, build) -> DataFrame:
        if store is None:
            df = build()
            # fuse into one DAG; persist only small reused outputs.
            # mentions (wide, 10^7+ rows): MEMORY_AND_DISK with the 32g
            # local-mode heap (pinned A/B at 8M turns: 62.2 s vs 63.7 s
            # DISK_ONLY at 8 threads, scaling eff 0.866 vs 0.824).  Under
            # the old 8g heap the in-memory columnar fill GC-thrashed and
            # DISK_ONLY won — storage level is env-tunable for small-heap
            # deployments via SPEL_MENTIONS_STORAGE.
            if name in _EPHEMERAL_NO_PERSIST:
                return df
            if name == "mentions":
                return df.persist(mentions_storage_level())
            return df.persist()
        if resume and store.exists(name):
            return store.read(name)
        df = build()
        store.write(df, name)
        committed = store.read(name)
        # score histogram lands in lineage for any stage carrying a score
        # column (scores, edges) — A13 / SURVEY §1.4
        store.append_lineage(name, committed, score_col="score")
        return committed

    def build_mentions() -> DataFrame:
        ext = extract_mentions_arrow if cfg.use_arrow_extractor else extract_mentions
        m = ext(transcripts)
        m = with_norm_surface(m, redirects)
        return with_mention_id(m)

    mentions = stage("mentions", build_mentions)
    surfaces = stage("surfaces", lambda: surface_nodes(mentions))
    blocks = stage("blocks", lambda: blocking_keys(surfaces))
    def build_pairs() -> DataFrame:
        if cfg.exact_pairs:
            return salted_pairs(blocks, cfg.max_cell, cfg.max_salts)
        return anchor_pairs(blocks, n_anchors=cfg.n_anchors)

    pairs = stage("pairs", build_pairs)
    scores = stage("scores", lambda: score_pairs(pairs, cfg.use_cosine))
    edges = stage("edges", lambda: threshold_edges(scores, cfg.threshold))

    def build_clusters() -> DataFrame:
        comps = connected_components(edges, store=None)
        return assign_clusters(mentions, surfaces, comps)

    return stage("clusters", build_clusters)


def load_transcripts_df(spark: SparkSession, corpus) -> DataFrame:
    """pandas Corpus.transcripts -> Spark DataFrame with exact schema."""
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    return spark.createDataFrame(corpus.transcripts, schema=schema)
