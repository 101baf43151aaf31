"""Candidate-set JSON source adapter (S3: the three PPRforNED layouts).

The reference loads per-mention entity allow-lists from JSON in three
layouts and merges testa/testb (reference: src/spel/candidate_manager.py:
31-56, keys consumed at :58-74):

* ``context_agnostic``        {mention_surface: [entity, ...]}
* ``context_aware_mentions``  {sentence_text: {mention_surface: [entity, ...]}}
* ``context_aware_spans``     {sentence_text: {"(begin, end)": [entity, ...]}}

Spark-side parse: raw wholetext read + ``from_json`` into nested map types
+ explode — one pass, no driver JSON materialization, no one-row-wide
DataFrame (the same scale posture as read_redirects_json).  All three
layouts normalize to one schema feeding candidate_filter (J8):

  (context_key STRING?, mention STRING?, begin_char INT?, end_char INT?,
   entity STRING, rank INT)

``rank`` is the entity's 0-based position in its JSON list — candidate
lists are RANK-ORDERED in the reference (candidate_manager.py:42-51
appends preserving file order; downstream tie-breaks consume that order),
so the file order must be recoverable: sort by rank within a key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

LAYOUTS = ("context_agnostic", "context_aware_mentions", "context_aware_spans")


def read_candidate_json(spark: SparkSession, path: str, layout: str) -> DataFrame:
    """Parse one candidate JSON file into normalized candidate rows."""
    if layout not in LAYOUTS:
        raise ValueError(f"layout must be one of {LAYOUTS}, got {layout!r}")
    raw = spark.read.text(path, wholetext=True)
    null_s = F.lit(None).cast("string")
    null_i = F.lit(None).cast("int")
    if layout == "context_agnostic":
        m = raw.select(
            F.explode(F.from_json("value", "map<string,array<string>>")).alias(
                "mention", "entities"
            )
        )
        return m.select(
            null_s.alias("context_key"),
            "mention",
            null_i.alias("begin_char"),
            null_i.alias("end_char"),
            F.posexplode("entities").alias("rank", "entity"),
        ).select(
            "context_key", "mention", "begin_char", "end_char", "entity",
            F.col("rank").cast("int").alias("rank"),
        )
    nested = raw.select(
        F.explode(
            F.from_json("value", "map<string,map<string,array<string>>>")
        ).alias("context_key", "inner")
    ).select("context_key", F.explode("inner").alias("key", "entities"))
    if layout == "context_aware_mentions":
        return nested.select(
            "context_key",
            F.col("key").alias("mention"),
            null_i.alias("begin_char"),
            null_i.alias("end_char"),
            F.posexplode("entities").alias("rank", "entity"),
        ).select(
            "context_key", "mention", "begin_char", "end_char", "entity",
            F.col("rank").cast("int").alias("rank"),
        )
    # context_aware_spans: key is "(begin, end)" (candidate_manager.py:66)
    return nested.select(
        "context_key",
        null_s.alias("mention"),
        F.regexp_extract("key", r"\((\d+),\s*(\d+)\)", 1).cast("int").alias("begin_char"),
        F.regexp_extract("key", r"\((\d+),\s*(\d+)\)", 2).cast("int").alias("end_char"),
        F.posexplode("entities").alias("rank", "entity"),
    ).select(
        "context_key", "mention", "begin_char", "end_char", "entity",
        F.col("rank").cast("int").alias("rank"),
    )


_KEY_COLS = ["context_key", "mention", "begin_char", "end_char", "entity"]
_LIST_KEY = ["context_key", "mention", "begin_char", "end_char"]  # one candidate LIST


def _with_list_key(df: DataFrame) -> DataFrame:
    # NULL-safe grouping/join key for the candidate list identity: plain
    # join keys never match NULL = NULL, and the context_agnostic layout
    # has NULL context/begin/end by design
    return df.withColumn(
        "_lk",
        F.concat_ws(
            "\x01",
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x02")) for c in _LIST_KEY],
        ),
    )


def union_candidates(
    a: DataFrame, b: DataFrame, mode: str = "append_unseen"
) -> DataFrame:
    """J9 union-merge of two candidate tables (testa ∪ testb).

    ``mode="append_unseen"`` — the reference's CONTEXT-AGNOSTIC merge
    (candidate_manager.py:44-49): the merged list is a's list followed by
    b's UNSEEN entities in b's order.  Ranks reproduce that
    concatenation: a-entities keep a's rank; b-only entities are
    re-ranked after a's list end, so sorting the merged rows by rank
    reconstructs the reference's merged list exactly (no rank
    collisions).

    ``mode="replace"`` — the reference's CONTEXT-AWARE merge
    (candidate_manager.py:51 uses ``dict.update``): for any list key
    present in b, b's list WHOLLY replaces a's (a's rows for that key are
    dropped, b's ranks kept verbatim); a-only keys pass through.  Use
    this when merging context_aware_mentions / context_aware_spans
    tables — routing them through append_unseen diverges from reference
    semantics (round-3 advice #1).
    """
    if mode not in ("append_unseen", "replace"):
        raise ValueError(f"mode must be 'append_unseen' or 'replace', got {mode!r}")
    a = _with_list_key(a.groupBy(*_KEY_COLS).agg(F.min("rank").alias("rank")))
    b = _with_list_key(b.groupBy(*_KEY_COLS).agg(F.min("rank").alias("rank")))
    if mode == "replace":
        a_kept = a.join(b.select("_lk").distinct(), "_lk", "left_anti")
        return a_kept.select(*_KEY_COLS, "rank").unionByName(
            b.select(*_KEY_COLS, "rank")
        )
    a_len = a.groupBy("_lk").agg((F.max("rank") + 1).alias("_a_len"))
    b_only = b.join(a.select("_lk", "entity"), ["_lk", "entity"], "left_anti")
    w = Window.partitionBy("_lk").orderBy("rank")
    b_ranked = (
        b_only.withColumn("_pos", F.row_number().over(w) - 1)
        .join(a_len, "_lk", "left")
        .select(
            *_KEY_COLS,
            (F.coalesce(F.col("_a_len"), F.lit(0)) + F.col("_pos"))
            .cast("int")
            .alias("rank"),
        )
    )
    return a.select(*_KEY_COLS, "rank").unionByName(b_ranked)
