"""Span operators: BIOES, phrase run-grouping, overlap alignment,
candidate filtering, softmax."""

import math

import pytest
from pyspark.sql import functions as F

from spel_spark.operators.spans import (
    bioes_tags,
    candidate_filter,
    phrases_from_annotations,
    softmax_over_window,
    span_metric_counts,
    span_overlap_join,
)


def test_bioes(spark):
    # bitmap: 0 1 1 1 0 1 0 -> O B I E O S O
    rows = [(1, i, b) for i, b in enumerate([False, True, True, True, False, True, False])]
    df = spark.createDataFrame(rows, "doc_id int, token_idx int, is_in_mention boolean")
    got = [r.bioes for r in bioes_tags(df).orderBy("token_idx").collect()]
    assert got == ["O", "B", "I", "E", "O", "S", "O"]
    codes = [r.bioes_code for r in bioes_tags(df).orderBy("token_idx").collect()]
    assert codes == [2, 0, 1, 3, 2, 4, 2]


def test_phrases_from_annotations(spark):
    rows = [
        (1, 0, 7, 0, 3, "New", 0.9),
        (1, 1, 7, 4, 8, "York", 0.8),
        (1, 2, 0, 9, 11, "is", 1.0),
        (1, 3, 5, 12, 16, "cool", 0.7),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id int, word_idx int, resolved_annotation int, "
        "begin_char int, end_char int, word string, confidence double",
    )
    got = {
        (r.resolved_annotation, r.phrase, r.begin_char, r.end_char, r.n_words)
        for r in phrases_from_annotations(df).collect()
    }
    assert (7, "New York", 0, 8, 2) in got
    assert (0, "is", 9, 11, 1) in got
    assert (5, "cool", 12, 16, 1) in got
    conf = {r.phrase: r.confidence for r in phrases_from_annotations(df).collect()}
    assert conf["New York"] == pytest.approx(0.85)


def test_span_overlap_join(spark):
    gold = spark.createDataFrame(
        [(1, 0, 8, "A"), (1, 20, 30, "B"), (1, 40, 45, "C")],
        "doc_id int, begin int, end int, entity string",
    )
    pred = spark.createDataFrame(
        [(1, 0, 8, "A"), (1, 18, 26, "B"), (1, 24, 31, "X")],
        "doc_id int, begin int, end int, entity string",
    )
    out = {r.g_begin: (r.p_begin, r.p_entity) for r in span_overlap_join(gold, pred).collect()}
    assert out[0] == (0, "A")        # exact match
    assert out[20] == (18, "B")      # largest overlap wins (6 > 6 tie -> smaller begin)
    assert out[40] == (None, None)   # unmatched gold kept with nulls


def test_span_metric_counts(spark):
    gold = spark.createDataFrame(
        [(1, 0, 8, "A"), (1, 20, 30, "B")], "doc_id int, begin int, end int, entity string"
    )
    pred = spark.createDataFrame(
        [(1, 0, 8, "A"), (1, 20, 30, "X"), (1, 50, 60, "Z")],
        "doc_id int, begin int, end int, entity string",
    )
    el = span_metric_counts(gold, pred, match_entity=True).collect()[0]
    assert (el.tp, el.n_pred, el.n_gold) == (1, 3, 2)
    md = span_metric_counts(gold, pred, match_entity=False).collect()[0]
    assert (md.tp, md.n_pred, md.n_gold) == (2, 3, 2)


def test_candidate_filter(spark):
    preds = spark.createDataFrame(
        [("eu", 3, 0.9), ("eu", 4, 0.8), ("bonn", 7, 0.5)],
        "block_key string, entity_id int, score double",
    )
    cands = spark.createDataFrame(
        [("eu", 3), ("bonn", 9)], "block_key string, entity_id int"
    )
    got = {(r.block_key, r.score): r.entity_id for r in candidate_filter(preds, cands).collect()}
    assert got[("eu", 0.9)] == 3   # allowed
    assert got[("eu", 0.8)] == 0   # not in allow-list -> null entity
    assert got[("bonn", 0.5)] == 0


def test_softmax(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (1, 3.0), (2, 5.0)], "g int, value double"
    )
    got = {(r.g, r.value): r.softmax for r in softmax_over_window(df, "value", ["g"]).collect()}
    z = sum(math.exp(x - 3.0) for x in [1.0, 2.0, 3.0])
    assert got[(1, 3.0)] == pytest.approx(1.0 / z)
    assert got[(2, 5.0)] == pytest.approx(1.0)
    assert sum(v for (g, _), v in got.items() if g == 1) == pytest.approx(1.0)


def test_candidate_rerank_hand_cases(spark):
    """J8 full semantics (ref candidate_manager.py:76-103): fall back to
    the best allowed ALTERNATIVE; no/empty list -> null; null passes."""
    from spel_spark.operators.spans import candidate_rerank

    alts_t = "array<struct<entity_id:int,p:double>>"
    rows = [
        # (row, block_key, entity_id, alternatives best-first)
        (1, "k1", 5, [(5, 0.9), (7, 0.5)]),    # allowed -> stays 5
        (2, "k1", 9, [(9, 0.9), (5, 0.5), (7, 0.3)]),  # 9 disallowed -> 5
        (3, "k1", 9, [(9, 0.9), (8, 0.5)]),    # nothing allowed -> 0
        (4, "k2", 3, [(3, 0.9)]),              # no allow list at all -> 0
        (5, "k1", 0, [(6, 0.9)]),              # already null -> passes
    ]
    preds = spark.createDataFrame(
        [(r, k, e, a) for r, k, e, a in rows],
        f"row int, block_key string, entity_id int, alternatives {alts_t}",
    )
    allow = spark.createDataFrame(
        [("k1", 5), ("k1", 7)], "block_key string, entity_id int"
    )
    got = {r.row: r.entity_id for r in candidate_rerank(preds, allow).collect()}
    assert got == {1: 5, 2: 5, 3: 0, 4: 0, 5: 0}
