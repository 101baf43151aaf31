"""Blocking: candidate-pair generation with skew-proof self-joins.

The reference bounds its label search space by shrinking a 500K-entity
output head to 5.6K in-domain entities (src/spel/model.py:56-79) and by
per-mention candidate sets (src/spel/candidate_manager.py:31-56).  Our
blocking stage plays exactly that role: no pair outside a shared block key
is ever scored.

Three key families, unioned (J9-style union of candidate sources):

* ``k:`` exact normalized surface        — recalls all normalization-
  recoverable corruptions (case/punct/possessive/slug);
* ``f:`` first token (multi-token only)  — recalls truncations and
  abbreviations, which preserve the head token;
* ``b<j>:`` MinHash-LSH bands over character 3-shingles — recalls typos
  and other ed-1 noise (deterministic xxhash64 seeds, SURVEY A12).

Scale design (the part that must survive 100 TB):

* pairs are generated over **distinct surface forms**, not mention
  instances — instance->surface mapping collapses the Zipf head (a hot
  tool name is ONE node no matter how many billion times it occurs);
* oversized blocks are **salt-partitioned** (triangle replication): a
  block of n surfaces with S salts becomes S*(S+1)/2 bounded cells, each
  joined independently — the self-join never sees a monolithic hot key
  (north star: "salted to break skew on hot mentions").  AQE skew-join
  cannot do this for us because both sides of a self-join skew together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spel_spark.functions.similarity import shingles_col

# MinHash-LSH parameters: 8 bands x 2 rows = 16 hash functions.
# P(band collision) = 1-(1-j^2)^8 ≈ 0.99 at shingle-jaccard 0.6.
LSH_SEEDS = list(range(101, 117))
LSH_BANDS = 8
LSH_ROWS = 2


def surface_nodes(mentions: DataFrame) -> DataFrame:
    """Distinct normalized surfaces with a stable 64-bit surface_id.

    mentions must carry ``norm_surface`` and ``mention_id``.  Carries
    per-surface mention counts (frequency drives anchor election and
    salting) and the min mention id (cluster canonicalization happens on
    this tiny table instead of re-shuffling the instance table).
    """
    return (
        mentions.filter(F.length("norm_surface") > 0)
        .groupBy("norm_surface")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.min("mention_id").alias("min_mention_id"),
        )
        .withColumn("surface_id", F.xxhash64("norm_surface"))
    )


def _seeded_min_hash(sh, seed: int):
    # NB: the lambda must take exactly ONE arg — a two-arg lambda would be
    # interpreted by Spark as (element, index) and silently drop the seed.
    return F.array_min(F.transform(sh, lambda x: F.xxhash64(x, F.lit(seed))))


def minhash_signature(df: DataFrame, col: str = "norm_surface") -> DataFrame:
    """16 seeded min-hashes over character 3-shingles — pure builtins."""
    sh = shingles_col(F.col(col))
    out = df
    for i, seed in enumerate(LSH_SEEDS):
        out = out.withColumn(f"mh_{i}", _seeded_min_hash(sh, seed))
    return out


def blocking_keys(surfaces: DataFrame) -> DataFrame:
    """Explode each surface node into its block keys (all three families).

    Returns (surface_id, norm_surface, n_mentions, block_key); n_mentions
    (instance frequency) drives anchor election and salting downstream.
    """
    sig = minhash_signature(surfaces)
    band_cols = []
    for j in range(LSH_BANDS):
        parts = [F.col(f"mh_{j * LSH_ROWS + r}") for r in range(LSH_ROWS)]
        band_cols.append(
            F.concat(F.lit(f"b{j}:"), F.xxhash64(*parts).cast("string"))
        )
    # first-token key applies to single-token surfaces too: a truncated
    # surface ("kamora") must co-block with its full form ("kamora ledger")
    first_tok = F.split(F.col("norm_surface"), " ").getItem(0)
    keys = F.array(
        F.concat(F.lit("k:"), F.col("norm_surface")),
        F.concat(F.lit("f:"), first_tok),
        *band_cols,
    )
    return (
        sig.select(
            "surface_id",
            "norm_surface",
            "n_mentions",
            F.explode(F.filter(keys, lambda k: k.isNotNull())).alias("block_key"),
        )
    )


def salted_id_pairs(
    blocks: DataFrame,
    id_col: str = "id",
    key_col="block_key",
    max_cell: int = 1024,
    max_salts: int = 64,
    carry: tuple = (),
    pair_filter=None,
    first_shared_key=None,
) -> DataFrame:
    """Payload-free triangle-salted self-join: all unordered id pairs
    sharing a key, deduplicated across keys.  Output (a_id, b_id).

    The id-only core of :func:`salted_pairs` for callers that join their
    payload back afterwards (e.g. document token sets, which are far too
    wide to replicate through the salt cells).  A block of n members with
    S salts becomes S*(S+1)/2 bounded cells joined independently — no
    single task ever sees a whole hot bucket (degenerate LSH buckets are
    the doc-dedup analogue of hot mention surfaces).

    ``key_col`` is a single column name or a sequence of names (composite
    bucket key, e.g. ``("slot", "bandh")`` — narrow typed columns join
    faster than concatenated strings and carry the band slot for the
    emit-once filter below).

    ``carry`` names narrow scalar columns of ``blocks`` (e.g. a token
    count) replicated through the cells as ``a_<c>``/``b_<c>`` so that
    ``pair_filter`` — a SYMMETRIC boolean Column over them — can prune
    pairs BEFORE the dedup shuffle (the widest shuffle of the flow).
    Symmetry is required because the filter runs before the (a, b)
    canonicalization.

    Cross-key dedup, two modes (guide §2.3/§2.4 — the dedup shuffle was
    the widest exchange of the whole dedup flow):

    * default — ``.distinct()`` on (a_id, b_id): one full shuffle of
      every surviving joined row (measured at sf0.1: 27M rows in, 5.6M
      out — a dense near-dup corpus emits each pair from ~5 of 8 bands).
    * ``first_shared_key`` — a SYMMETRIC int Column over carried
      ``a_*``/``b_*`` columns giving the 0-based FIRST band slot the two
      members share.  A pair is kept only where that slot equals the
      bucket's own slot (the first element of the composite key), so each
      unordered pair is emitted exactly once across keys AND cells with
      no distinct shuffle at all.  Requires a composite ``key_col`` whose
      FIRST column is the band-slot index.  In this mode the canonically
      swapped carry columns ride along in the output (callers verify
      inline instead of re-joining payloads).
    """
    key_cols = [key_col] if isinstance(key_col, str) else list(key_col)
    counts = blocks.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_members"))
    sized = (
        blocks.join(counts, key_cols)
        .filter(F.col("n_members") > 1)
        .withColumn(
            "n_salts",
            F.least(
                F.greatest(F.ceil(F.col("n_members") / max_cell), F.lit(1)),
                F.lit(max_salts),
            ).cast("int"),
        )
        .withColumn(
            "salt", F.pmod(F.xxhash64(id_col, F.lit(7)), F.col("n_salts")).cast("int")
        )
    )
    a_side = sized.select(
        *key_cols,
        F.col(id_col).alias("a_id"),
        *[F.col(c).alias(f"a_{c}") for c in carry],
        F.col("salt").alias("i"),
        F.explode(F.sequence(F.col("salt"), F.col("n_salts") - 1)).alias("j"),
    )
    b_side = sized.select(
        *key_cols,
        F.col(id_col).alias("b_id"),
        *[F.col(c).alias(f"b_{c}") for c in carry],
        F.explode(F.sequence(F.lit(0), F.col("salt"))).alias("i"),
        F.col("salt").alias("j"),
    )
    joined = a_side.join(b_side, [*key_cols, "i", "j"])
    if first_shared_key is None:
        joined = joined.filter(F.col("a_id") != F.col("b_id"))
        if pair_filter is not None:
            joined = joined.filter(pair_filter)
        return joined.select(
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
        ).distinct()
    # emit-once mode.  Within one bucket, triangle replication yields each
    # unordered pair once in off-diagonal cells (orientation fixed by
    # salt) and BOTH orientations in the diagonal cell — a_id < b_id
    # there keeps one (and drops self-pairs).  Across buckets, a member
    # sits in exactly one bucket per slot, so keeping the pair only in
    # its first shared slot makes the global emission exactly-once: the
    # union over buckets is reproduced without the distinct shuffle.
    joined = joined.filter(
        (F.col("i") != F.col("j")) | (F.col("a_id") < F.col("b_id"))
    ).filter(F.col(key_cols[0]) == first_shared_key)
    if pair_filter is not None:
        joined = joined.filter(pair_filter)
    a_lt = F.col("a_id") < F.col("b_id")
    return joined.select(
        F.when(a_lt, F.col("a_id")).otherwise(F.col("b_id")).alias("a_id"),
        F.when(a_lt, F.col("b_id")).otherwise(F.col("a_id")).alias("b_id"),
        *[
            F.when(a_lt, F.col(f"a_{c}")).otherwise(F.col(f"b_{c}")).alias(f"a_{c}")
            for c in carry
        ],
        *[
            F.when(a_lt, F.col(f"b_{c}")).otherwise(F.col(f"a_{c}")).alias(f"b_{c}")
            for c in carry
        ],
    )


def salted_pairs(
    blocks: DataFrame,
    max_cell: int = 1024,
    max_salts: int = 64,
) -> DataFrame:
    """All unordered surface pairs sharing a block key, skew-salted.

    blocks: (surface_id, norm_surface, block_key).
    Output: (a_id, b_id, a_norm, b_norm, block_key) with a_id < b_id,
    deduplicated across key families.

    Triangle replication: member with salt s appears on the A side of
    cells (s, j) for j >= s and the B side of cells (i, s) for i <= s;
    equi-join on (block_key, i, j) then a_id < b_id keeps each pair once.
    """
    # consumed by three plan branches (counts + both join sides): persist
    # the narrow projection so the upstream (scan + normalize + banding)
    # is expanded once, not three times (see anchor_pairs for the audit)
    blocks = blocks.select(
        "surface_id", "norm_surface", "block_key"
    ).persist()
    counts = blocks.groupBy("block_key").agg(F.count(F.lit(1)).alias("n_members"))
    sized = (
        blocks.join(counts, "block_key")
        .filter(F.col("n_members") > 1)
        .withColumn(
            "n_salts",
            F.least(
                F.greatest(F.ceil(F.col("n_members") / max_cell), F.lit(1)),
                F.lit(max_salts),
            ).cast("int"),
        )
        .withColumn("salt", F.pmod(F.xxhash64("surface_id", F.lit(7)), F.col("n_salts")).cast("int"))
    )
    a_side = sized.select(
        "block_key",
        F.col("surface_id").alias("a_id"),
        F.col("norm_surface").alias("a_norm"),
        F.col("salt").alias("i"),
        F.explode(F.sequence(F.col("salt"), F.col("n_salts") - 1)).alias("j"),
    )
    b_side = sized.select(
        "block_key",
        F.col("surface_id").alias("b_id"),
        F.col("norm_surface").alias("b_norm"),
        F.explode(F.sequence(F.lit(0), F.col("salt"))).alias("i"),
        F.col("salt").alias("j"),
    )
    # off-diagonal cells yield each pair in ONE orientation (A = smaller
    # salt); canonicalize by id instead of filtering, else half the
    # cross-salt pairs would be lost
    joined = a_side.join(b_side, ["block_key", "i", "j"]).filter(
        F.col("a_id") != F.col("b_id")
    )
    a_lt = F.col("a_id") < F.col("b_id")
    pairs = joined.select(
        F.when(a_lt, F.col("a_id")).otherwise(F.col("b_id")).alias("a_id"),
        F.when(a_lt, F.col("b_id")).otherwise(F.col("a_id")).alias("b_id"),
        F.when(a_lt, F.col("a_norm")).otherwise(F.col("b_norm")).alias("a_norm"),
        F.when(a_lt, F.col("b_norm")).otherwise(F.col("a_norm")).alias("b_norm"),
        "block_key",
    )
    # dedup across key families: one row per unordered pair
    return pairs.groupBy("a_id", "b_id").agg(
        F.first("a_norm").alias("a_norm"),
        F.first("b_norm").alias("b_norm"),
        F.min("block_key").alias("block_key"),
    )


def anchor_pairs(
    blocks: DataFrame,
    n_anchors: int = 2,
    full_block_limit: int = 8,
) -> DataFrame:
    """Anchor-sparsified pair generation — the 100-TB-scale path.

    All-pairs inside a block is O(n²); at trillion-turn scale a block of
    10⁵ distinct typo variants would emit 10¹⁰ pairs.  But clustering only
    needs CONNECTIVITY: every member must reach the entity core, and the
    core IS the block's most frequent surface (easy corruptions all
    normalize onto the canonical form, so its instance count dominates).
    So: elect the top-``n_anchors`` surfaces per block by mention frequency
    (ties by surface_id for determinism) and pair every member with each
    anchor — O(n·k) per block; transitive closure (CC) completes the
    cluster.  Blocks with <= ``full_block_limit`` members keep exact
    all-pairs (cheap, and protects tiny blocks whose anchor may itself be
    a corrupted form).

    The reference's analogue: candidate sets restrict scoring to a small
    allow-list per mention (src/spel/candidate_manager.py:76-103).

    blocks: (surface_id, norm_surface, n_mentions, block_key).
    Output: (a_id, b_id, a_norm, b_norm, block_key), a_id < b_id, deduped.
    """
    from pyspark.sql import Window

    # blocks is consumed twice while filling the sized cache below
    # (count aggregation + join probe): persist the narrow projection so
    # the scan + normalize + MinHash banding upstream runs exactly once
    blocks = blocks.select(
        "surface_id", "norm_surface", "n_mentions", "block_key"
    ).persist()
    counts = blocks.groupBy("block_key").agg(F.count(F.lit(1)).alias("n_members"))
    # persist: the sized-blocks table is consumed by FIVE plan branches
    # (small -> salted_pairs' counts + both join sides; big -> anchor
    # election + member join).  Unpersisted, each branch re-expanded the
    # whole upstream — parquet scan + normalize + 16-hash MinHash banding
    # — so one query planned 5 scans of the base table (r6 plan audit:
    # pairs_engine had 68 Exchanges / 5 Scans; with the persist the
    # upstream runs once).  A derived projection is persisted, never the
    # caller's DataFrame; lifecycle follows the caller's action (same
    # contract as dedup.minhash_near_dup_pairs).
    sized = (
        blocks.join(counts, "block_key").filter(F.col("n_members") > 1).persist()
    )

    small = sized.filter(F.col("n_members") <= full_block_limit).select(
        "surface_id", "norm_surface", "n_mentions", "block_key"
    )
    big = sized.filter(F.col("n_members") > full_block_limit)

    # Two-phase anchor election: a mega-block (10^7 typo variants of one
    # hot tool name) must not concentrate its whole rank sort in ONE
    # window task.  Phase 1 ranks within (block, salt) cells — bounded;
    # phase 2 ranks the <= 64*n_anchors survivors per block — tiny.
    # Top-k composes across phases (any global top-k row is top-k in its
    # cell), so the result is IDENTICAL to the single-window election.
    order = (F.col("n_mentions").desc(), F.col("surface_id"))
    w1 = Window.partitionBy("block_key", "_salt").orderBy(*order)
    w2 = Window.partitionBy("block_key").orderBy(*order)
    anchors = (
        big.withColumn(
            "_salt", F.pmod(F.xxhash64("surface_id", F.lit(13)), F.lit(64)).cast("int")
        )
        .withColumn("rk1", F.row_number().over(w1))
        .filter(F.col("rk1") <= n_anchors)
        .withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= n_anchors)
        .select(
            F.col("surface_id").alias("anchor_id"),
            F.col("norm_surface").alias("anchor_norm"),
            "block_key",
        )
    )
    member_anchor = (
        big.join(anchors, "block_key")
        .filter(F.col("surface_id") != F.col("anchor_id"))
    )
    a_lt = F.col("surface_id") < F.col("anchor_id")
    big_pairs = member_anchor.select(
        F.when(a_lt, F.col("surface_id")).otherwise(F.col("anchor_id")).alias("a_id"),
        F.when(a_lt, F.col("anchor_id")).otherwise(F.col("surface_id")).alias("b_id"),
        F.when(a_lt, F.col("norm_surface")).otherwise(F.col("anchor_norm")).alias("a_norm"),
        F.when(a_lt, F.col("anchor_norm")).otherwise(F.col("norm_surface")).alias("b_norm"),
        "block_key",
    )
    small_pairs = salted_pairs(small)
    return (
        big_pairs.unionByName(small_pairs)
        .groupBy("a_id", "b_id")
        .agg(
            F.first("a_norm").alias("a_norm"),
            F.first("b_norm").alias("b_norm"),
            F.min("block_key").alias("block_key"),
        )
    )
