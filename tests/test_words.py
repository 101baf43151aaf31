"""A1/A2 word resolution: hand-built reference cases, Spark == Python twin,
DuckDB oracle parity on the synthesized subword fixture."""

import duckdb
import pytest
from pyspark.sql import functions as F

from spel_spark.operators.words import (
    resolve_word_py,
    resolve_words,
    word_candidates,
)

SUBWORD_SCHEMA = (
    "doc_id long, word_idx long, subword_idx long, "
    "top_k array<struct<entity_id: long, p: double>>"
)


def _df(spark, words):
    """words: dict word_idx -> list of subword top_k lists."""
    rows = []
    for widx, subs in words.items():
        for sidx, tk in enumerate(subs):
            rows.append((0, widx, sidx, [(int(i), float(p)) for i, p in tk]))
    return spark.createDataFrame(rows, SUBWORD_SCHEMA)


# hand-built cases exercising every branch of the reference cascade
# (src/spel/span_annotation.py:90-107)
CASES = {
    # unanimous top-1 -> that id, even though id 5 has the better average
    0: [[(3, 0.4), (5, 0.9)], [(3, 0.3), (5, 0.8)], [(3, 0.5), (5, 0.7)]],
    # split top-1, non-empty intersection -> best avg-prob candidate
    # (8: mean 0.7 beats 7: mean 0.65)
    1: [[(7, 0.6), (8, 0.5)], [(8, 0.9), (7, 0.7)]],
    # empty intersection, majority vote -> 2 (two of three top-1 votes)
    2: [[(2, 0.5)], [(2, 0.4)], [(9, 0.99)]],
    # empty intersection, all top-1 distinct (count==1) -> FIRST subword's
    3: [[(4, 0.5)], [(6, 0.9)], [(1, 0.99)]],
    # single subword -> its top-1
    4: [[(11, 0.2), (12, 0.1)]],
}

EXPECTED = {0: 3, 1: 8, 2: 2, 3: 4, 4: 11}


def test_python_twin_reference_cases():
    for widx, subs in CASES.items():
        got, conf = resolve_word_py(subs)
        assert got == EXPECTED[widx], f"word {widx}"
        # confidence = 0.0-substituted mean probability of the winner
        n = len(subs)
        want_conf = (
            sum(next((p for i, p in tk if i == got), 0.0) for tk in subs) / n
        )
        assert conf == pytest.approx(want_conf)


def test_spark_matches_python_twin(spark):
    df = _df(spark, CASES)
    got = {
        r.word_idx: (r.resolved_entity, r.confidence)
        for r in resolve_words(df).collect()
    }
    for widx, subs in CASES.items():
        want = resolve_word_py(subs)
        assert got[widx][0] == want[0], f"word {widx}"
        assert got[widx][1] == pytest.approx(want[1])


def test_spark_matches_python_twin_randomized(spark):
    import random

    rng = random.Random(13)
    words = {}
    for widx in range(200):
        n_sub = rng.randint(1, 4)
        subs = []
        for _ in range(n_sub):
            k = rng.randint(1, 4)
            ids = rng.sample(range(12), k)
            subs.append([(i, round(rng.random(), 3)) for i in ids])
        words[widx] = subs
    df = _df(spark, words)
    got = {
        r.word_idx: (r.resolved_entity, r.confidence)
        for r in resolve_words(df).collect()
    }
    for widx, subs in words.items():
        want = resolve_word_py(subs)
        assert got[widx][0] == want[0], (widx, subs)
        assert got[widx][1] == pytest.approx(want[1])


def test_word_candidates_intersection(spark):
    df = _df(spark, {1: CASES[1]})
    rows = {
        r.entity_id: r
        for r in word_candidates(df).filter(F.col("word_idx") == 1).collect()
    }
    # both 7 and 8 appear in both subwords' top-k -> both candidates
    assert rows[7].is_candidate and rows[8].is_candidate
    assert rows[7].avg_p == pytest.approx((0.6 + 0.7) / 2)
    assert rows[8].avg_p == pytest.approx((0.5 + 0.9) / 2)
    assert rows[7].votes == 1 and rows[8].votes == 1


def test_word_resolution_oracle_parity(spark, sf001_dir):
    from spel_spark.queries import SQL_WORD_RESOLUTION, q_word_resolution

    sdf = q_word_resolution(spark, sf001_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf001_dir}/events.parquet')"
    )
    odf = con.execute(SQL_WORD_RESOLUTION).df()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(by=cols, ignore_index=True)
    b = odf[cols].sort_values(by=cols, ignore_index=True)
    assert len(a) == len(b) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_duplicate_entity_in_topk_counts_once(spark):
    """Set semantics: entity 7 duplicated inside subword 0's top_k must
    count as ONE hit with its best p — it is NOT in the intersection
    (absent from subword 1), so the unanimous entity 5 wins."""
    from pyspark.sql import functions as F

    from spel_spark.operators.words import resolve_words, word_candidates

    subwords = spark.createDataFrame(
        [
            (0, 0, 0, [(7, 0.9), (7, 0.8), (5, 0.6)]),
            (0, 0, 1, [(5, 0.7)]),
        ],
        "doc_id long, word_idx long, subword_idx long, "
        "top_k array<struct<entity_id: long, p: double>>",
    )
    cand = {
        r.entity_id: (r.n_hits, r.is_candidate, r.avg_p)
        for r in word_candidates(subwords).collect()
    }
    import pytest as _pt

    assert cand[7][:2] == (1, False)   # one hit (set semantics)
    assert cand[7][2] == _pt.approx(0.45)   # best p 0.9 / 2 subwords
    assert cand[5][:2] == (2, True)
    assert cand[5][2] == _pt.approx(0.65)
    got = resolve_words(subwords).collect()[0]
    assert got.resolved_entity == 5
    # the Python twin must apply the same set semantics (max p per
    # subword for duplicated ids), not first-occurrence or plain sum
    from spel_spark.operators.words import resolve_word_py

    ent, conf = resolve_word_py([[(7, 0.9), (7, 0.8), (5, 0.6)], [(5, 0.7)]])
    assert ent == 5
    assert conf == _pt.approx(got.confidence)
