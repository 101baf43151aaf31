"""Property-based twin-equivalence tests (hypothesis).

The engine leans on "N implementations that MUST agree byte-for-byte"
(Spark column / pure-Python / DuckDB SQL); unit tests pin hand cases,
these pin the long tail.  Strategy: hypothesis generates adversarial
strings driver-side, then ONE Spark job (and one DuckDB query) checks a
whole batch — never a Spark job per example.
"""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from spel_spark.functions.normalize import (
    norm_surface_col,
    norm_surface_py,
    norm_surface_sql,
)
from spel_spark.functions.tokenize import punct_tokenize_py

# printable ASCII + the folded/mojibake codepoints + some raw unicode
_ALPHABET = st.sampled_from(
    list(
        "abcXYZ 019_'\"-.,;:!?()[]{}’‘“”–—"
        " éÅ中�\t"
    )
)
_TEXTS = st.lists(st.text(_ALPHABET, max_size=24), min_size=1, max_size=48)


@settings(max_examples=20, deadline=None)
@given(_TEXTS)
def test_norm_surface_py_matches_sql(texts):
    """Python twin == DuckDB SQL twin on arbitrary unicode soup."""
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {norm_surface_sql('s')} FROM (SELECT unnest(?) AS s)", [texts]
    ).fetchall()
    assert [r[0] for r in got] == [norm_surface_py(t) for t in texts]


def test_norm_surface_col_matches_py_on_fuzz_corpus(spark):
    """Spark column twin == Python twin on a hypothesis-built corpus
    (one Spark job for the whole corpus)."""
    texts = []

    @settings(max_examples=60, deadline=None)
    @given(st.text(_ALPHABET, max_size=40))
    def collect(t):
        texts.append(t)

    collect()
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = [
        r.n for r in df.select(norm_surface_col(F.col("s")).alias("n")).collect()
    ]
    assert got == [norm_surface_py(t) for t in texts]


@settings(max_examples=200, deadline=None)
@given(st.text(_ALPHABET, max_size=60))
def test_punct_tokenize_py_offsets_roundtrip(text):
    """Every emitted token slices back out of the original text, tokens
    are non-empty, in order, and non-overlapping."""
    toks = punct_tokenize_py(text)
    prev_end = -1
    for tok, b, e in toks:
        assert tok != ""
        assert 0 <= b < e <= len(text)
        assert text[b:e] == tok
        assert b >= prev_end - 0  # ordered, no overlap ('s split shares edge)
        prev_end = e


@settings(max_examples=200, deadline=None)
@given(st.text(st.sampled_from(list("ab '.x-")), max_size=40))
def test_norm_surface_py_idempotent(s):
    """normalize(normalize(x)) == normalize(x) — the alias key is a
    fixpoint, so re-normalizing checkpointed data never drifts."""
    n = norm_surface_py(s)
    assert norm_surface_py(n) == n


def test_possessive_boundary_is_ascii(spark):
    """Python's \\b is unicode-aware; Java regex and RE2 use ASCII \\w.
    The twin must use re.ASCII so "bob'sñx" normalizes identically in all
    three implementations (the 's strips before the unicode char)."""
    import duckdb

    from spel_spark.functions.normalize import (
        norm_surface_col,
        norm_surface_py,
        norm_surface_sql,
    )

    cases = ["bob'sñx", "ann's", "it's-a", "x'sé", "q's9", "no apostrophe"]
    py = [norm_surface_py(t) for t in cases]
    con = duckdb.connect()
    sql = [
        r[0]
        for r in con.execute(
            f"SELECT {norm_surface_sql('s')} FROM (SELECT unnest(?) AS s)", [cases]
        ).fetchall()
    ]
    df = spark.createDataFrame([(t,) for t in cases], "s string")
    col = [r.n for r in df.select(norm_surface_col(F.col("s")).alias("n")).collect()]
    assert py == sql == col, (py, sql, col)


@given(
    st.lists(
        st.sampled_from(
            ["word", "Jones", "cats", ",", ".", "!", '"', "'", "``", "''",
             "(", ")", "$", "'s", "'em", "n't", "“", "”", "x9"]
        ),
        max_size=14,
    )
)
def test_detokenize_py_invariants(words):
    """Properties of the Moses-EN twin over arbitrary token sequences:
    (1) every non-quote alphanumeric token survives verbatim, (2) the
    output never has leading/double spaces, (3) length is bounded by the
    space-joined input."""
    from spel_spark.functions.detokenize import moses_detokenize_py

    out = moses_detokenize_py(words)
    assert "  " not in out and not out.startswith(" ")
    assert len(out) <= len(" ".join(words))
    for w in words:
        if w.isalnum():
            assert w in out
