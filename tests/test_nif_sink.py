"""NIF sink round-trip + X4 unicode-escape decode + EP1 lifecycle
integration (subwords -> word resolution -> phrase building -> span
metrics), mirroring the reference's flagship evaluation flow (SURVEY §3
EP1; reference: src/spel/evaluate_local.py:79-109)."""

import os

import pytest
from pyspark.sql import functions as F

TTL = "/root/reference/resources/data/aida_testc.ttl"


def test_nif_roundtrip(spark, tmp_path):
    """parse(serialize(parse(x))) == parse(x) on real gold data (subset)."""
    if not os.path.exists(TTL):
        pytest.skip("fixture absent")
    from spel_spark.sources.nif import collect_turtle, parse_nif_gold, to_nif_turtle

    contexts, phrases = parse_nif_gold(spark, TTL)
    contexts = contexts.filter(F.col("doc_id") < 12).cache()
    phrases = phrases.filter(F.col("doc_id") < 12).cache()
    ttl2 = collect_turtle(to_nif_turtle(contexts, phrases))
    p2 = tmp_path / "roundtrip.ttl"
    p2.write_text(ttl2)
    c2, ph2 = parse_nif_gold(spark, str(p2))
    want_c = {(r.doc_id, r.text) for r in contexts.collect()}
    got_c = {(r.doc_id, r.text) for r in c2.collect()}
    assert got_c == want_c
    want_p = {tuple(r) for r in phrases.collect()}
    got_p = {tuple(r) for r in ph2.collect()}
    assert got_p == want_p


def test_unicode_unescape_udf(spark):
    from spel_spark.functions.normalize import unicode_unescape_udf

    rows = [
        ("Bras\\u00edlia",), ("plain",), ("caf\\u00e9",), ("already é",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "s string")
    got = [r.d for r in df.select(unicode_unescape_udf()(F.col("s")).alias("d")).collect()]
    assert got[0] == "Brasília"
    assert got[1] == "plain"
    assert got[2] == "café"
    assert got[3] == "already é"  # non-ascii passes through unchanged
    assert got[4] is None


def test_ep1_lifecycle(spark):
    """EP1 end-to-end on hand-built model output: subword annotations ->
    A1/A2 resolution -> A4 phrase building -> F4 non-O filter -> J7
    metrics vs gold spans.  Word 1 needs the best-avg-candidate branch;
    the rest are unanimous."""
    from spel_spark.operators.spans import phrases_from_annotations, span_metric_counts
    from spel_spark.operators.words import resolve_words

    # doc 0 text layout: "Kamora Ledger runs the Atlas Hub"
    #                      0-6    7-13   14-18 19-22 23-28 29-32
    words = [
        # (word_idx, word, begin, end, subwords: list of top_k)
        (0, "Kamora", 0, 6, [[(5, 0.9)], [(5, 0.8)]]),
        # split top-1, intersection resolves to 5 (avg 0.75 beats 3's 0.45)
        (1, "Ledger", 7, 13, [[(5, 0.7), (3, 0.4)], [(3, 0.5), (5, 0.8)]]),
        (2, "runs", 14, 18, [[(0, 0.99)]]),
        (3, "the", 19, 22, [[(0, 0.98)]]),
        (4, "Atlas", 23, 28, [[(7, 0.9)]]),
        (5, "Hub", 29, 32, [[(7, 0.85)], [(7, 0.95)]]),
    ]
    sub_rows = [
        (0, w, s, [(int(i), float(p)) for i, p in tk])
        for w, _, _, _, subs in words
        for s, tk in enumerate(subs)
    ]
    subwords = spark.createDataFrame(
        sub_rows,
        "doc_id long, word_idx long, subword_idx long, "
        "top_k array<struct<entity_id: long, p: double>>",
    )
    resolved = resolve_words(subwords)
    meta = spark.createDataFrame(
        [(0, w, t, b, e) for w, t, b, e, _ in words],
        "doc_id long, word_idx long, word string, begin_char long, end_char long",
    )
    anns = resolved.join(meta, ["doc_id", "word_idx"]).select(
        "doc_id", "word_idx",
        F.col("resolved_entity").alias("resolved_annotation"),
        "begin_char", "end_char", "word",
        F.col("confidence"),
    )
    phrases = phrases_from_annotations(anns)
    pred = phrases.filter(F.col("resolved_annotation") != 0).select(
        "doc_id",
        F.col("begin_char").alias("begin"),
        F.col("end_char").alias("end"),
        F.col("resolved_annotation").alias("entity"),
    )
    got = {(r.begin_char, r.end_char, r.resolved_annotation, r.phrase) for r in (
        phrases.filter(F.col("resolved_annotation") != 0)
        .select("begin_char", "end_char", "resolved_annotation", "phrase")
        .collect()
    )}
    # X9: phrase text reconstructed from words
    assert got == {(0, 13, 5, "Kamora Ledger"), (23, 32, 7, "Atlas Hub")}
    gold = spark.createDataFrame(
        [(0, 0, 13, 5), (0, 23, 32, 7)], "doc_id long, begin long, end long, entity long"
    )
    m = span_metric_counts(gold, pred).collect()[0]
    assert (m.tp, m.n_pred, m.n_gold) == (2, 2, 2)
    assert m.f1 == pytest.approx(1.0)


def test_nif_roundtrip_multiline_and_backslash(spark, tmp_path):
    """Sink/parse round-trip for texts with newlines, quotes, and literal
    backslash-n sequences (raw newlines are illegal in single-quoted
    turtle; the escaper must emit \\n and the parser decode it — while a
    LITERAL backslash+n survives as two characters)."""
    from spel_spark.sources.nif import collect_turtle, parse_nif_gold, to_nif_turtle

    contexts = spark.createDataFrame(
        [
            (0, "https://x/ctx/0", 'line one\nline "two"\nliteral \\n stays'),
            (1, "https://x/ctx/1", "plain"),
        ],
        "doc_id int, doc_uri string, text string",
    )
    phrases = spark.createDataFrame(
        [(0, 0, 8, "line one", "E1")],
        "doc_id int, begin int, end int, surface string, entity string",
    )
    p = tmp_path / "ml.ttl"
    p.write_text(collect_turtle(to_nif_turtle(contexts, phrases)))
    c2, p2 = parse_nif_gold(spark, str(p))
    got = {(r.doc_id, r.text) for r in c2.collect()}
    assert got == {
        (0, 'line one\nline "two"\nliteral \\n stays'),
        (1, "plain"),
    }
    assert {tuple(r) for r in p2.collect()} == {(0, 0, 8, "line one", "E1")}
