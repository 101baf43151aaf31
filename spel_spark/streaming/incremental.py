"""Incremental streaming entity resolution: merge new turns into the
existing clustering instead of recomputing the world.

This is the operational 100-TB mode of the ER flow (the reference's
analogue is one-document-at-a-time serving behind a lock,
src/gerbil_connect/server.py:88-151): a trillion-turn corpus is clustered
ONCE in batch, then each arriving micro-batch only pays for what it adds —

* pair generation is DELTA-BIPARTITE: surfaces first seen in this batch
  join against the full block index (new x all, skew-salted ids-only via
  ann.salted_bipartite_id_pairs); old x old pairs were generated when
  their newer member first arrived, so the union over epochs is EXACTLY
  the batch pair set (every unordered pair materializes at the epoch its
  later member appears — an induction the equality test pins);
* connected components runs on the STAR-CONTRACTED graph: previous
  (node -> component) assignments re-enter as edges, so CC converges in
  O(1) delta rounds instead of O(log n) full rounds — component labels
  stay min-node ids, since a star's label is itself a member;
* the mention instance table is touched append-only.

State layout under ``state_dir`` (all parquet, every write lands in an
``epoch=<id>`` partition with dynamic partition overwrite — a RETRIED
epoch replaces its own partition and reads only ``epoch < current``, so
foreachBatch's at-least-once becomes effectively-once, same discipline as
ingest.start_mention_ingest):

  mentions/    append  per-mention rows of each batch
  blocks/      append  block keys of surfaces FIRST SEEN in the epoch
  edges/       append  match edges discovered in the epoch
  surfaces/    snapshot  merged (norm_surface, n_mentions, min_mention_id)
  components/  snapshot  (node, component) — the star edges of the next epoch
  clusters/    snapshot  full mention -> cluster assignment

Production deployment would keep these as Iceberg tables (MERGE INTO for
the snapshots, snapshot expiry for retention); plain epoch-partitioned
parquet keeps the same commit semantics without the catalog dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spel_spark.operators.ann import salted_bipartite_id_pairs
from spel_spark.operators.blocking import blocking_keys, surface_nodes
from spel_spark.operators.clustering import assign_clusters, connected_components
from spel_spark.operators.scoring import DEFAULT_THRESHOLD, score_pairs, threshold_edges


def _path(state_dir: str, name: str) -> str:
    return f"{state_dir}/{name}"


def _write_epoch(df: DataFrame, path: str, epoch: int) -> None:
    (
        df.withColumn("epoch", F.lit(int(epoch)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(path)
    )


def _with_epoch(schema) -> "object":
    from pyspark.sql.types import IntegerType, StructType

    full = StructType(list(schema.fields))
    return full.add("epoch", IntegerType())


def _read_state(spark: SparkSession, path: str, schema) -> DataFrame | None:
    """Read a state table with its EXPLICIT schema (+ the epoch partition
    column).  Explicit schemas matter twice: an epoch that produced zero
    rows leaves a file-less partition dir that schema inference cannot
    read, and inference would make 'empty' indistinguishable from
    'broken'.

    ONLY the path-missing case maps to None: any other failure (transient
    IO, corrupt footer — these surface at action time under an explicit
    schema) must FAIL the batch so the streaming checkpoint retries it —
    treating it as empty state would silently drop every new-vs-old pair
    of this epoch, and since a pair is only generated at the epoch its
    later member first arrives, the edges would be missing forever
    after."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(_with_epoch(schema)).parquet(path)
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            return None
        raise


def _read_prev(
    spark: SparkSession, path: str, epoch: int, schema
) -> DataFrame | None:
    """All rows committed by epochs < ``epoch`` (None when the table does
    not exist yet).  Excluding the current epoch makes a retried epoch
    deterministic: its own partial partition is never an input."""
    df = _read_state(spark, path, schema)
    return None if df is None else df.filter(F.col("epoch") < epoch)


def _read_latest(
    spark: SparkSession, path: str, epoch: int, schema
) -> DataFrame | None:
    """The most recent snapshot strictly before ``epoch``."""
    df = _read_prev(spark, path, epoch, schema)
    if df is None:
        return None
    mx = df.agg(F.max("epoch")).collect()[0][0]
    if mx is None:
        return None
    return df.filter(F.col("epoch") == mx).drop("epoch")


# fixed state-table schemas (epoch partition column added at read time)
SURFACES_SCHEMA = "norm_surface string, n_mentions bigint, min_mention_id bigint"
BLOCKS_SCHEMA = "surface_id bigint, norm_surface string, block_key string"
EDGES_SCHEMA = "a_id bigint, b_id bigint"
COMPONENTS_SCHEMA = "node bigint, component bigint"


def _st(ddl: str):
    from pyspark.sql.types import StructType

    return StructType.fromDDL(ddl)


def merge_batch(
    spark: SparkSession,
    batch_mentions: DataFrame,
    state_dir: str,
    epoch: int,
    threshold: float = DEFAULT_THRESHOLD,
    max_cell: int = 1024,
) -> DataFrame:
    """Merge one micro-batch of extracted mentions into the state and
    return the updated full clusters DataFrame.

    ``batch_mentions`` must carry (conv_id, turn_idx, begin_char,
    end_char, surface, norm_surface, mention_id) — i.e. the output of
    streaming_mentions / the batch mention chain.  mention_id is a
    deterministic hash of the natural key, so incremental and batch runs
    assign IDENTICAL cluster ids (the equality test's invariant).
    """
    m = batch_mentions.persist()
    _write_epoch(m, _path(state_dir, "mentions"), epoch)

    batch_surf = surface_nodes(m)
    prev_surf = _read_latest(
        spark, _path(state_dir, "surfaces"), epoch, _st(SURFACES_SCHEMA)
    )
    if prev_surf is None:
        merged_surf = batch_surf
        new_surf = batch_surf
    else:
        cols = ["norm_surface", "n_mentions", "min_mention_id"]
        merged_surf = (
            prev_surf.select(*cols)
            .unionByName(batch_surf.select(*cols))
            .groupBy("norm_surface")
            .agg(
                F.sum("n_mentions").alias("n_mentions"),
                F.min("min_mention_id").alias("min_mention_id"),
            )
            .withColumn("surface_id", F.xxhash64("norm_surface"))
        )
        new_surf = batch_surf.join(
            prev_surf.select("norm_surface"), "norm_surface", "left_anti"
        )
    merged_surf = merged_surf.persist()
    _write_epoch(
        merged_surf.select("norm_surface", "n_mentions", "min_mention_id"),
        _path(state_dir, "surfaces"),
        epoch,
    )

    # delta-bipartite candidate generation: NEW surfaces vs the full block
    # index (ids only through the salt cells; norms joined back after)
    new_blocks = blocking_keys(new_surf).select(
        "surface_id", "norm_surface", "block_key"
    ).persist()
    _write_epoch(new_blocks, _path(state_dir, "blocks"), epoch)
    prev_blocks = _read_prev(
        spark, _path(state_dir, "blocks"), epoch, _st(BLOCKS_SCHEMA)
    )
    all_blocks = new_blocks.select("surface_id", "block_key")
    if prev_blocks is not None:
        all_blocks = all_blocks.unionByName(
            prev_blocks.select("surface_id", "block_key")
        )
    cand = (
        salted_bipartite_id_pairs(
            new_blocks.select(F.col("surface_id").alias("n_id"), "block_key"),
            all_blocks.select(F.col("surface_id").alias("o_id"), "block_key"),
            "n_id",
            "o_id",
            key_col="block_key",
            max_cell=max_cell,
        )
        .filter(F.col("n_id") != F.col("o_id"))
        .select(
            F.least("n_id", "o_id").alias("a_id"),
            F.greatest("n_id", "o_id").alias("b_id"),
        )
        .distinct()
    )
    norms = merged_surf.select("surface_id", "norm_surface")
    pairs = cand.join(
        norms.select(F.col("surface_id").alias("a_id"), F.col("norm_surface").alias("a_norm")),
        "a_id",
    ).join(
        norms.select(F.col("surface_id").alias("b_id"), F.col("norm_surface").alias("b_norm")),
        "b_id",
    )
    new_edges = threshold_edges(score_pairs(pairs), threshold).select("a_id", "b_id")
    _write_epoch(new_edges, _path(state_dir, "edges"), epoch)
    # read the committed bytes back: scoring (the Jaro-Winkler pandas UDF
    # over every salted candidate pair — the flow's most expensive stage)
    # must run ONCE per epoch, not re-execute for CC's backend-selection
    # count and again for the edge collect
    new_edges = (
        _read_state(spark, _path(state_dir, "edges"), _st(EDGES_SCHEMA))
        .filter(F.col("epoch") == epoch)
        .drop("epoch")
    )

    # CC delta rounds: previous components re-enter as star edges
    prev_comp = _read_latest(
        spark, _path(state_dir, "components"), epoch, _st(COMPONENTS_SCHEMA)
    )
    cc_in = new_edges
    if prev_comp is not None:
        cc_in = cc_in.unionByName(
            prev_comp.select(
                F.col("node").alias("a_id"), F.col("component").alias("b_id")
            )
        )
    comps = connected_components(cc_in)
    _write_epoch(comps, _path(state_dir, "components"), epoch)

    prev_m = _read_prev(spark, _path(state_dir, "mentions"), epoch, m.schema)
    all_mentions = m if prev_m is None else prev_m.drop("epoch").unionByName(m)
    clusters = assign_clusters(all_mentions, merged_surf, comps)
    _write_epoch(clusters, _path(state_dir, "clusters"), epoch)
    # hand back the committed snapshot — a caller action must not re-run
    # the assignment joins
    out = (
        _read_state(spark, _path(state_dir, "clusters"), clusters.schema)
        .filter(F.col("epoch") == epoch)
        .drop("epoch")
    )
    for df in (m, merged_surf, new_blocks):
        df.unpersist()
    return out


def read_clusters(spark: SparkSession, state_dir: str) -> DataFrame:
    """The latest committed cluster assignment."""
    df = spark.read.parquet(_path(state_dir, "clusters"))
    mx = df.agg(F.max("epoch")).collect()[0][0]
    return df.filter(F.col("epoch") == mx).drop("epoch")


def start_incremental_er(
    spark: SparkSession,
    source_path: str,
    state_dir: str,
    checkpoint_path: str,
    redirects: DataFrame | None = None,
    threshold: float = DEFAULT_THRESHOLD,
):
    """Continuous ER: transcript stream -> per-batch incremental cluster
    merge.  availableNow trigger (drain-and-stop); the streaming
    checkpoint + epoch-partitioned state give exactly-once cluster
    snapshots across restarts.  Returns the StreamingQuery."""
    from spel_spark.streaming.ingest import read_transcript_stream, streaming_mentions

    stream = read_transcript_stream(spark, source_path)
    ments = streaming_mentions(stream, redirects)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        merge_batch(spark, batch_df, state_dir, epoch_id, threshold)

    return (
        ments.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
