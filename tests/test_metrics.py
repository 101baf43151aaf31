"""Pairwise micro-F1 on a hand-computed miniature."""

import pytest

from spel_spark.operators.metrics import pairwise_micro_f1, resolve_labeled_pairs


def test_micro_f1_hand_case(spark):
    # clusters: m1,m2 -> c1; m3 -> c3; m4 unresolved (not extracted)
    clusters = spark.createDataFrame(
        [("c", 0, 0, 100), ("c", 1, 0, 100), ("c", 2, 0, 300)],
        "conv_id string, turn_idx int, begin_char int, cluster_id long",
    )
    labeled = spark.createDataFrame(
        [
            ("c", 0, 0, "c", 1, 0, "k", True),    # tp
            ("c", 0, 0, "c", 2, 0, "k", True),    # fn (different clusters)
            ("c", 1, 0, "c", 2, 0, "k", False),   # tn
            ("c", 0, 0, "c", 9, 0, "k", True),    # fn (b missing -> pred false)
        ],
        "a_conv string, a_turn int, a_begin int, "
        "b_conv string, b_turn int, b_begin int, block_key string, same_entity boolean",
    )
    row = pairwise_micro_f1(resolve_labeled_pairs(labeled, clusters)).collect()[0]
    assert (row.tp, row.fp, row.fn) == (1, 0, 2)
    assert row.precision == pytest.approx(1.0)
    assert row.recall == pytest.approx(1 / 3)


def test_macro_f1_unweighted_mean(spark):
    """A6: the macro row is the UNWEIGHTED mean of per-block F1
    (decao_eval.py:1205-1221) — a huge block and a tiny block count
    equally."""
    from spel_spark.operators.metrics import pairwise_f1_by_block, pairwise_macro_f1

    rows = (
        # block "big": 8 pairs, 4 tp, 2 fp, 2 fn -> P=2/3, R=2/3, F1=2/3
        [("big", True, True)] * 4
        + [("big", False, True)] * 2
        + [("big", True, False)] * 2
        # block "tiny": 1 pair, perfect -> F1=1.0
        + [("tiny", True, True)]
    )
    df = spark.createDataFrame(
        rows, "block_key string, same_entity boolean, pred_same boolean"
    )
    per = {r.block_key: r.f1 for r in pairwise_f1_by_block(df).collect()}
    assert per["big"] == pytest.approx(2 / 3)
    assert per["tiny"] == pytest.approx(1.0)
    m = pairwise_macro_f1(df).collect()[0]
    assert m.n_blocks == 2
    # unweighted: (2/3 + 1) / 2, NOT the pair-weighted micro value
    assert m.macro_f1 == pytest.approx((2 / 3 + 1.0) / 2)
    assert m.macro_precision == pytest.approx((2 / 3 + 1.0) / 2)


def test_subword_eval_counters(spark):
    """A7 vs a hand-counted python twin (reference semantics:
    decao_eval.py:1335-1391 — masked overall/in/out accuracies)."""
    from spel_spark.operators.metrics import subword_eval_counters

    rows = [
        # (mask, actual, pred)
        (True, True, True), (True, True, False), (True, False, False),
        (True, False, True), (False, True, True), (True, True, True),
    ]
    df = spark.createDataFrame(
        rows, "eval_mask boolean, is_in_mention boolean, pred_in_mention boolean"
    )
    r = subword_eval_counters(df).collect()[0]
    masked = [x for x in rows if x[0]]
    assert r.total == len(masked) == 5
    assert r.correct == sum(1 for _, a, p in masked if a == p) == 3
    assert r.total_true == 3 and r.correct_true == 2
    assert r.total_false == 2 and r.correct_false == 1
    assert r.overall_acc == 3 * 100.0 / 5
    assert r.in_mention_acc == 2 * 100.0 / 3
    assert r.out_mention_acc == 1 * 100.0 / 2
    # empty-denominator guard
    empty = spark.createDataFrame(
        [(False, True, True)],
        "eval_mask boolean, is_in_mention boolean, pred_in_mention boolean",
    )
    r0 = subword_eval_counters(empty).collect()[0]
    assert (r0.overall_acc, r0.in_mention_acc, r0.out_mention_acc) == (0.0, 0.0, 0.0)
