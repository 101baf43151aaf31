"""Span-level operators: BIOES tagging, phrase building, span alignment,
candidate filtering — the reference's token/span machinery re-expressed
set-based (SURVEY W1/A4/J6/J7/J8/X7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# BIOES label codes, matching the reference (span_annotation.py:17,139)
BIOES = {"B": 0, "I": 1, "O": 2, "E": 3, "S": 4}


def bioes_tags(tokens: DataFrame) -> DataFrame:
    """W1: BIOES labels from an in-mention bitmap via lag/lead.

    The reference derives B/I/O/E/S per token from neighbours with a
    sequential scan (src/spel/data_loader.py:232-240); here it is two
    window functions + a CASE cascade.

    tokens: (doc_id, token_idx, is_in_mention boolean); mention boundaries
    additionally need ``mention_break`` (true when this token starts a new
    mention even if the previous token was in one) — pass lit(False) for
    the reference's plain bitmap semantics.
    """
    w = Window.partitionBy("doc_id").orderBy("token_idx")
    prev = F.coalesce(F.lag("is_in_mention").over(w), F.lit(False))
    nxt = F.coalesce(F.lead("is_in_mention").over(w), F.lit(False))
    cur = F.col("is_in_mention")
    label = (
        F.when(~cur, F.lit("O"))
        .when(~prev & ~nxt, F.lit("S"))
        .when(~prev & nxt, F.lit("B"))
        .when(prev & nxt, F.lit("I"))
        .otherwise(F.lit("E"))
    )
    code = (
        F.when(label == "B", BIOES["B"])
        .when(label == "I", BIOES["I"])
        .when(label == "O", BIOES["O"])
        .when(label == "E", BIOES["E"])
        .otherwise(BIOES["S"])
    )
    return tokens.withColumn("bioes", label).withColumn("bioes_code", code)


def phrases_from_annotations(word_annotations: DataFrame) -> DataFrame:
    """A4/W3: consecutive-run grouping — adjacent words with the same
    resolved annotation merge into one phrase (the PhraseAnnotation
    analogue; reference src/spel/utils.py:389-396).

    input: (doc_id, word_idx, resolved_annotation, begin_char, end_char,
    word, confidence); output one row per phrase.
    """
    w = Window.partitionBy("doc_id").orderBy("word_idx")
    chg = F.when(
        F.lag("resolved_annotation").over(w).isNull()
        | (F.lag("resolved_annotation").over(w) != F.col("resolved_annotation")),
        1,
    ).otherwise(0)
    runs = word_annotations.withColumn("chg", chg).withColumn(
        "run_id", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        runs.groupBy("doc_id", "run_id", "resolved_annotation")
        .agg(
            F.min("begin_char").alias("begin_char"),
            F.max("end_char").alias("end_char"),
            # X9: turn-text reconstruction must round-trip byte-identically
            F.concat_ws(" ", F.collect_list("word")).alias("phrase"),
            F.avg("confidence").alias("confidence"),  # A11 mean-of-words
            F.count(F.lit(1)).alias("n_words"),
        )
    )


def span_overlap_join(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """J6: gold<->predicted span alignment as an interval join.

    The reference aligns the two phrase streams with a 97-line two-pointer
    merge that re-segments spans (src/spel/utils.py:425-521 — "the
    hairiest code in the repo").  Set-based: join on doc_id + overlap
    predicate, resolve one-to-many by largest overlap (row_number).

    gold/pred: (doc_id, begin, end, entity).  Output: one row per gold
    span with its best-overlapping prediction (or nulls).
    """
    # rename BOTH sides' doc_id before the join: when pred derives from
    # gold (shared lineage), g["doc_id"] == p["doc_id"] resolves to a
    # trivially-true predicate and the join silently goes cross-document
    g = gold.select(
        F.col("doc_id").alias("g_doc"),
        F.col("begin").alias("g_begin"), F.col("end").alias("g_end"),
        F.col("entity").alias("g_entity"),
    )
    p = pred.select(
        F.col("doc_id").alias("p_doc"),
        F.col("begin").alias("p_begin"), F.col("end").alias("p_end"),
        F.col("entity").alias("p_entity"),
    )
    joined = g.join(
        p,
        (F.col("g_doc") == F.col("p_doc"))
        & (F.col("p_begin") < F.col("g_end"))
        & (F.col("g_begin") < F.col("p_end")),
        "left",
    ).withColumn("doc_id", F.col("g_doc")).drop("g_doc", "p_doc")
    overlap = F.least("g_end", "p_end") - F.greatest("g_begin", "p_begin")
    w = Window.partitionBy("doc_id", "g_begin", "g_end").orderBy(
        F.desc_nulls_last(overlap), F.col("p_begin")
    )
    return (
        joined.withColumn("overlap", overlap)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


def span_metric_counts(gold: DataFrame, pred: DataFrame, match_entity: bool = True) -> DataFrame:
    """J7/A5: micro MD/EL counters — |g∩p| via inner join + one agg
    (reference: src/spel/decao_eval.py:1185-1202)."""
    keys = ["doc_id", "begin", "end"] + (["entity"] if match_entity else [])
    tp = gold.join(pred, keys, "inner").count()
    n_gold = gold.count()
    n_pred = pred.count()
    spark = gold.sparkSession
    prec = tp / max(n_pred, 1)
    rec = tp / max(n_gold, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-12)
    return spark.createDataFrame(
        [(tp, n_pred, n_gold, prec, rec, f1)],
        "tp long, n_pred long, n_gold long, precision double, recall double, f1 double",
    )


def candidate_filter(
    predictions: DataFrame, candidate_sets: DataFrame, null_entity: int = 0
) -> DataFrame:
    """J8: restrict predictions to the mention's candidate allow-list; a
    prediction outside it falls back to the null entity (reference:
    src/spel/candidate_manager.py:76-103).

    predictions: (block_key, entity_id, ...); candidate_sets:
    (block_key, entity_id) allow-list.
    """
    # rename BOTH allow-list columns before the join: when candidate_sets
    # derives from predictions (same lineage), df["col"] references resolve
    # ambiguously and drop() can keep the null-filled side (observed: all
    # non-allowed rows got block_key NULL)
    allowed = candidate_sets.select(
        F.col("block_key").alias("_allow_key"),
        F.col("entity_id").alias("allowed_entity"),
    ).distinct()
    return (
        predictions.join(
            F.broadcast(allowed),
            (predictions["block_key"] == F.col("_allow_key"))
            & (predictions["entity_id"] == F.col("allowed_entity")),
            "left",
        )
        .withColumn(
            "entity_id",
            F.when(F.col("allowed_entity").isNotNull(), F.col("entity_id")).otherwise(
                F.lit(null_entity)
            ),
        )
        .drop("_allow_key", "allowed_entity")
    )


def softmax_over_window(df: DataFrame, value_col: str, part_cols: list[str]) -> DataFrame:
    """X7: numerically-stable softmax of a column within a partition —
    exp(x - max) / sum(exp(x - max)) via window aggregates (the reference
    softmaxes logits per token, src/spel/model.py:54,179)."""
    w = Window.partitionBy(*part_cols)
    shifted = F.exp(F.col(value_col) - F.max(value_col).over(w))
    return df.withColumn("_e", shifted).withColumn(
        "softmax", F.col("_e") / F.sum("_e").over(w)
    ).drop("_e")
