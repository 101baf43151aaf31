"""Normalizer: Spark column expr == pure-Python twin == DuckDB SQL snippet."""

import duckdb
import pytest
from pyspark.sql import functions as F

from spel_spark.functions.normalize import (
    norm_surface_col,
    norm_surface_py,
    norm_surface_sql,
)

CASES = [
    "The_Washington_Post",
    "washington post's",
    "  (Hello, World!)  ",
    "UPPER_CASE_SLUG",
    "curly ’quotes’ and – dashes",
    "multi   space",
    "x",
    "",
    "tool's`",
    "Wash. Post",
    # non-ASCII: round-1 divergence — the SQL twin skipped the unicode fold
    "Kamora’s Ledger",
    "Ã©clair Ã¼ber ÃŃcono",  # mojibake repairs, then accent folds
    "café…done — €100",
    "Â£5 âĦ¢ brand",
    "楊 CJK blanked",
    "naïve ō č ž ć É ș",
    "nbsp here",
]


def test_py_matches_col(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "s string")
    got = [r.n for r in df.select(norm_surface_col(F.col("s")).alias("n")).collect()]
    want = [norm_surface_py(s) for s in CASES]
    assert got == want


def test_py_matches_duckdb_sql():
    con = duckdb.connect()
    for s in CASES:
        got = con.execute(
            f"select {norm_surface_sql('?')}", [s]
        ).fetchone()[0]
        assert got == norm_surface_py(s), s


def test_corpus_surfaces_agree(spark, corpus):
    surfaces = corpus.gold_mentions["surface"].drop_duplicates().tolist()
    df = spark.createDataFrame([(s,) for s in surfaces], "s string")
    got = {
        r.s: r.n
        for r in df.select("s", norm_surface_col(F.col("s")).alias("n")).collect()
    }
    for s in surfaces:
        assert got[s] == norm_surface_py(s), s


def test_idempotent():
    for s in CASES:
        once = norm_surface_py(s)
        assert norm_surface_py(once) == once
