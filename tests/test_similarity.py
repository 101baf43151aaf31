"""Similarity kernels: known values, symmetry, builtin/Python agreement."""

import math

import pytest
from pyspark.sql import functions as F

from spel_spark.functions.similarity import (
    array_jaccard,
    cosine_sim,
    hashed_ngram_cosine,
    jaro_winkler_py,
    jaro_winkler_udf,
    levenshtein_sim,
    shingles_col,
    token_jaccard,
)


def test_jw_known_values():
    # classic textbook values
    assert jaro_winkler_py("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-3)
    assert jaro_winkler_py("DIXON", "DICKSONX") == pytest.approx(0.8133, abs=1e-3)
    assert jaro_winkler_py("abc", "abc") == 1.0
    assert jaro_winkler_py("abc", "xyz") == 0.0
    assert jaro_winkler_py("", "abc") == 0.0


def test_jw_symmetry(corpus):
    surfaces = corpus.gold_mentions["surface"].drop_duplicates().tolist()[:50]
    for i in range(0, len(surfaces) - 1, 2):
        a, b = surfaces[i], surfaces[i + 1]
        assert jaro_winkler_py(a, b) == pytest.approx(jaro_winkler_py(b, a))


def test_jw_batch_kernel_matches_py():
    """The native batch kernel must agree with the pure-Python definition
    bit-for-bit on randomized inputs (incl. unicode + edge lengths)."""
    import random

    from spel_spark.functions.similarity import jaro_winkler_batch

    rng = random.Random(7)
    alpha = "abcdefg é日 "
    cases = [("", ""), ("a", ""), ("", "b"), ("martha", "marhta"),
             ("kamora ledger", "kamora lédger"), ("日本語テスト", "日本語テスト")]
    for _ in range(2000):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 25)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 25)))
        if rng.random() < 0.2:
            b = a
        cases.append((a, b))
    got = jaro_winkler_batch([c[0] for c in cases], [c[1] for c in cases])
    for (a, b), g in zip(cases, got):
        assert abs(jaro_winkler_py(a, b) - g) < 1e-12, (a, b)
    assert len(jaro_winkler_batch([], [])) == 0
    assert list(jaro_winkler_batch(["", ""], ["", "x"])) == [1.0, 0.0]


def test_jw_batch_nul_chars_match_py():
    """Strings containing NUL route to the Python twin: numpy's 0-padded
    'U' matrix can't distinguish a trailing '\\x00' from padding, so the
    C path would under-count lengths and break the bit-for-bit guarantee
    (ADVICE r2).  Mixed batches must stay aligned."""
    from spel_spark.functions.similarity import jaro_winkler_batch

    cases = [
        ("abc\x00", "abc"), ("abc\x00", "abc\x00"), ("\x00", ""),
        ("a\x00b", "ab"), ("martha", "marhta"),  # last one stays on the kernel
        ("x", "x\x00\x00"),
    ]
    got = jaro_winkler_batch([c[0] for c in cases], [c[1] for c in cases])
    for (a, b), g in zip(cases, got):
        assert abs(jaro_winkler_py(a, b) - g) < 1e-12, (a, b)
    # NUL is a real character: "abc\x00" != "abc" must NOT score 1.0
    assert jaro_winkler_py("abc\x00", "abc") < 1.0


def test_jw_udf_matches_py(spark):
    pairs = [("kamora ledger", "kamora"), ("abc", "abd"), ("x", "x"), ("", "y")]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = [r.jw for r in df.select(jaro_winkler_udf("a", "b").alias("jw")).collect()]
    want = [jaro_winkler_py(a, b) for a, b in pairs]
    assert got == pytest.approx(want)


def test_token_jaccard(spark):
    df = spark.createDataFrame([("a b c", "b c d"), ("a", "a"), ("a", "b")], "x string, y string")
    got = [r.j for r in df.select(token_jaccard(F.col("x"), F.col("y")).alias("j")).collect()]
    assert got == pytest.approx([2 / 4, 1.0, 0.0])


def test_levenshtein_sim(spark):
    df = spark.createDataFrame([("kitten", "sitting"), ("same", "same")], "x string, y string")
    got = [r.s for r in df.select(levenshtein_sim(F.col("x"), F.col("y")).alias("s")).collect()]
    assert got == pytest.approx([1 - 3 / 7, 1.0])


def test_shingles(spark):
    df = spark.createDataFrame([("abcd",), ("ab",)], "s string")
    got = [r.g for r in df.select(shingles_col(F.col("s")).alias("g")).collect()]
    assert got[0] == ["abc", "bcd"]
    assert got[1] == ["ab"]


def test_array_jaccard(spark):
    df = spark.createDataFrame([(["a", "b"], ["b", "c"])], "x array<string>, y array<string>")
    got = df.select(array_jaccard(F.col("x"), F.col("y")).alias("j")).collect()[0].j
    assert got == pytest.approx(1 / 3)


def test_cosine_sim(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 0.0])],
        "x array<double>, y array<double>",
    )
    got = [r.c for r in df.select(cosine_sim(F.col("x"), F.col("y")).alias("c")).collect()]
    assert got == pytest.approx([1.0, 0.0, 1 / math.sqrt(2)])


def test_hashed_cosine_properties(spark):
    df = spark.createDataFrame(
        [("kamora ledger", "kamora ledger"), ("kamora ledger", "xyzzy plugh")],
        "x string, y string",
    )
    got = [
        r.c
        for r in df.select(hashed_ngram_cosine(F.col("x"), F.col("y")).alias("c")).collect()
    ]
    assert got[0] == pytest.approx(1.0)
    assert got[1] < 0.5
