"""F2 punctuation-aware tokenizer: reference-branch hand cases, Spark ==
Python twin on real corpus turns, offset round-trip invariant."""

import pytest
from pyspark.sql import functions as F

from spel_spark.functions.tokenize import punct_tokenize, punct_tokenize_py


def test_reference_branches():
    # punctuation-free word kept whole
    assert punct_tokenize_py("hello world") == [
        ("hello", 0, 5), ("world", 6, 11),
    ]
    # possessive split only on punctuation-free words (utils.py:30-34)
    assert punct_tokenize_py("Kamora's ledger") == [
        ("Kamora", 0, 6), ("'s", 6, 8), ("ledger", 9, 15),
    ]
    # leading/trailing punct runs become single tokens (utils.py:37-56)
    assert punct_tokenize_py("(hello)!") == [
        ("(", 0, 1), ("hello", 1, 6), (")!", 6, 8),
    ]
    # possessive does NOT split when the word is punct-bounded
    assert punct_tokenize_py("(word's)") == [
        ("(", 0, 1), ("word's", 1, 7), (")", 7, 8),
    ]
    # all-punctuation word stays one token
    assert punct_tokenize_py("... x") == [("...", 0, 3), ("x", 4, 5)]
    # empty / multi-space
    assert punct_tokenize_py("") == []
    assert punct_tokenize_py("a  b") == [("a", 0, 1), ("b", 3, 4)]
    # uppercase possessive
    assert punct_tokenize_py("BOB'S") == [("BOB", 0, 3), ("'S", 3, 5)]


CASES = [
    "hello world", "Kamora's ledger", "(hello)!", "(word's)", "... x",
    "a  b", "BOB'S", "it's a-b- 'quoted' U.S. end.", "trailing space ",
    " leading", "only", "", "'s", "a'b,c",
]


def test_spark_matches_python_twin(spark):
    df = spark.createDataFrame(
        [(str(i), 0, s) for i, s in enumerate(CASES)],
        "conv_id string, turn_idx int, text string",
    )
    got = {}
    for r in punct_tokenize(df).collect():
        got.setdefault(int(r.conv_id), []).append(
            (r.token_idx, r.tok, r.begin_char, r.end_char)
        )
    for i, s in enumerate(CASES):
        want = [
            (k, t, b, e) for k, (t, b, e) in enumerate(punct_tokenize_py(s))
        ]
        assert sorted(got.get(i, [])) == want, repr(s)


def test_roundtrip_invariant_on_corpus(spark, transcripts_df):
    toks = punct_tokenize(transcripts_df.limit(500))
    joined = toks.join(
        transcripts_df.select("conv_id", "turn_idx", "text"),
        ["conv_id", "turn_idx"],
    )
    bad = joined.filter(
        F.expr("substring(text, begin_char + 1, end_char - begin_char)")
        != F.col("tok")
    )
    assert bad.count() == 0
    assert toks.count() > 0


def test_spark_matches_python_on_corpus(spark, transcripts_df):
    sample = transcripts_df.limit(200).select("conv_id", "turn_idx", "text")
    rows = sample.collect()
    got = {}
    for r in punct_tokenize(sample).collect():
        got.setdefault((r.conv_id, r.turn_idx), []).append(
            (r.token_idx, r.tok, r.begin_char, r.end_char)
        )
    for r in rows:
        want = [
            (k, t, b, e)
            for k, (t, b, e) in enumerate(punct_tokenize_py(r.text))
        ]
        assert sorted(got.get((r.conv_id, r.turn_idx), [])) == want, r.text
