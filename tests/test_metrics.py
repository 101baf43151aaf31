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
