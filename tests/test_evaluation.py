"""EP1 flagship (composed reference evaluation lifecycle) + J6 full
re-segmentation alignment, with hand cases mirroring the reference's
split/merge/spacing branches (src/spel/utils.py:425-521)."""

import os

import pytest
from pyspark.sql import functions as F

from spel_spark.operators.evaluation import AIDA_TESTC, ep1_evaluate
from spel_spark.operators.spans import span_align_resegment, span_eval_from_alignment

SPAN_SCHEMA = "doc_id int, begin int, end int, entity int, surface string"

needs_ttl = pytest.mark.skipif(
    not os.path.exists(AIDA_TESTC), reason="reference aida_testc.ttl absent"
)


def _segs(spark, gold_rows, pred_rows):
    g = spark.createDataFrame(gold_rows, SPAN_SCHEMA)
    p = spark.createDataFrame(pred_rows, SPAN_SCHEMA)
    return {
        (r.doc_id, r.seg_begin, r.seg_end): r
        for r in span_align_resegment(g, p).collect()
    }


def test_align_merge_case(spark):
    """Pred merges 'Alice Smith' + ' met' into one span: the reference's
    p-longer branch re-segments p at gold boundaries (utils.py:476-500)."""
    gold = [(1, 0, 11, 5, "Alice Smith"), (1, 12, 15, 0, "met"), (1, 16, 19, 7, "Bob")]
    pred = [(1, 0, 15, 5, "Alice Smith met"), (1, 16, 19, 7, "Bob")]
    s = _segs(spark, gold, pred)
    assert len(s) == 3
    assert s[(1, 0, 11)].status == "CORRECTLY_FOUND_BOTH_SPAN_AND_ANNOTATION"
    assert s[(1, 0, 11)].p_slice == "Alice Smith"  # re-segmented from the merge
    # the over-covered 'met' region: gold O, pred annotated -> over-generated
    assert s[(1, 12, 15)].status == "OVER_GENERATED_ANNOTATION"
    assert s[(1, 16, 19)].status == "CORRECTLY_FOUND_BOTH_SPAN_AND_ANNOTATION"


def test_align_split_case(spark):
    """Pred splits gold 'Alice Smith' into two spans: the g-longer branch
    (utils.py:448-474) — each pred piece aligns to a gold sub-segment."""
    gold = [(1, 0, 11, 5, "Alice Smith")]
    pred = [(1, 0, 5, 5, "Alice"), (1, 6, 11, 5, "Smith")]
    s = _segs(spark, gold, pred)
    assert len(s) == 2
    assert s[(1, 0, 5)].g_slice == "Alice" and s[(1, 0, 5)].span_match
    assert s[(1, 6, 11)].g_slice == "Smith" and s[(1, 6, 11)].span_match
    assert all(
        v.status == "CORRECTLY_FOUND_BOTH_SPAN_AND_ANNOTATION" for v in s.values()
    )


def test_align_space_insensitive_surface(spark):
    """utils.py:436-438: surfaces equal after removing spaces count as the
    same span (possessive detokenization: \"kamora 's\" vs \"kamora's\")."""
    gold = [(1, 0, 8, 3, "kamora's")]
    pred = [(1, 0, 8, 3, "kamora 's")]
    s = _segs(spark, gold, pred)
    assert s[(1, 0, 8)].span_match
    assert s[(1, 0, 8)].status == "CORRECTLY_FOUND_BOTH_SPAN_AND_ANNOTATION"
    # a genuinely different surface stays unaligned
    s2 = _segs(spark, gold, [(1, 0, 8, 3, "other txt")])
    assert s2[(1, 0, 8)].status == "UNALIGNED"


def test_align_statuses_and_metrics(spark):
    """All four ComparisonResult statuses + the MD/EL counter math
    (evaluate_local.py:98-109)."""
    gold = [
        (1, 0, 3, 1, "abc"),   # correct both
        (1, 4, 7, 2, "def"),   # span right, annotation wrong
        (1, 8, 11, 0, "ghi"),  # gold O, pred O -> correctly ignored
        (1, 12, 15, 0, "jkl"), # gold O, pred annotated -> over-generated
        (1, 16, 19, 4, "mno"), # gold annotated, pred O -> MD fn
    ]
    pred = [
        (1, 0, 3, 1, "abc"),
        (1, 4, 7, 9, "def"),
        (1, 8, 11, 0, "ghi"),
        (1, 12, 15, 9, "jkl"),
        (1, 16, 19, 0, "mno"),
    ]
    s = _segs(spark, gold, pred)
    assert s[(1, 0, 3)].status == "CORRECTLY_FOUND_BOTH_SPAN_AND_ANNOTATION"
    assert s[(1, 4, 7)].status == "CORRECTLY_FOUND_SPAN_BUT_NOT_ANNOTATION"
    assert s[(1, 8, 11)].status == "CORRECTLY_IGNORED_O"
    assert s[(1, 12, 15)].status == "OVER_GENERATED_ANNOTATION"
    g = spark.createDataFrame(gold, SPAN_SCHEMA)
    p = spark.createDataFrame(pred, SPAN_SCHEMA)
    m = span_eval_from_alignment(span_align_resegment(g, p)).collect()[0]
    # MD: tp = {abc, def}, fp = {jkl}, fn = {mno}
    assert (m.md_tp, m.md_fp, m.md_fn) == (2, 1, 1)
    # EL: p_el = {abc, def->9, jkl->9}; g_el = {abc, def->2, mno}; tp = {abc}
    assert (m.el_tp, m.el_fp, m.el_fn) == (1, 2, 2)
    assert m.md_precision == pytest.approx(2 / 3)
    assert m.md_recall == pytest.approx(2 / 3)


def test_ignore_over_generated_mode(spark):
    """utils.py:522-528: with ignore_over_generated, a spurious prediction
    over gold-O text is reset to O and rescored CORRECTLY_IGNORED_O —
    it stops counting as an MD/EL false positive; everything else is
    untouched."""
    gold = [(1, 0, 3, 1, "abc"), (1, 4, 7, 0, "def"), (1, 8, 11, 2, "ghi")]
    pred = [(1, 0, 3, 1, "abc"), (1, 4, 7, 9, "def"), (1, 8, 11, 0, "ghi")]
    g = spark.createDataFrame(gold, SPAN_SCHEMA)
    p = spark.createDataFrame(pred, SPAN_SCHEMA)
    segs = span_align_resegment(g, p)
    plain = span_eval_from_alignment(segs).collect()[0]
    assert (plain.md_tp, plain.md_fp, plain.md_fn) == (1, 1, 1)
    flag = span_eval_from_alignment(segs, ignore_over_generated=True).collect()[0]
    assert (flag.md_tp, flag.md_fp, flag.md_fn) == (1, 0, 1)
    assert (flag.el_tp, flag.el_fp, flag.el_fn) == (1, 0, 1)

    # end to end: corrupted EP1 run — over-generations (O words flipped to
    # entity 1) vanish from fp under the flag, recall side unchanged
    r_plain = ep1_evaluate(
        spark, ttl_path="/nonexistent.ttl", corrupt_every=5,
        portable_corruption=True,
    ).collect()[0]
    r_flag = ep1_evaluate(
        spark, ttl_path="/nonexistent.ttl", corrupt_every=5,
        portable_corruption=True, ignore_over_generated=True,
    ).collect()[0]
    assert r_flag.md_fp < r_plain.md_fp
    assert r_flag.md_fn == r_plain.md_fn
    assert r_flag.md_f1 > r_plain.md_f1


def test_align_word_prefix_fallback(spark):
    """utils.py:486-497 ('re-alignment not helpful'): when no prefix of
    the longer span's words reproduces the shorter span's string, the
    reference walks both word lists in lockstep and emits the longest
    pairwise-equal word prefix as an aligned pair — dropping the first
    differing word — before continuing on the remainders.  Hand trace
    for gold 'the naïve' vs pred 'the nai ve' (both spans over [0,9]):
    the reference emits (['the'], ['the']) with the spans' entities and
    leaves 'naïve'/'nai ve' divergent (its loop no longer terminates
    there — utils.py:487 builds an empty phrase and re-advances by
    zero), so the tail is reported UNALIGNED."""
    gold = [(1, 0, 9, 5, "the naïve")]
    pred = [(1, 0, 9, 5, "the nai ve")]
    s = _segs(spark, gold, pred)
    assert len(s) == 2
    a = s[(1, 0, 3)]
    assert (a.g_slice, a.p_slice) == ("the", "the")
    assert a.span_match and a.status == "CORRECTLY_FOUND_BOTH_SPAN_AND_ANNOTATION"
    b = s[(1, 4, 9)]
    assert (b.g_slice, b.p_slice) == ("naïve", "nai ve")
    assert not b.span_match and b.status == "UNALIGNED"

    # multi-word equal prefix + differing entities -> SPAN_BUT_NOT_ANNOTATION
    s2 = _segs(
        spark,
        [(1, 0, 12, 5, "aa bb cîty x")],
        [(1, 0, 12, 9, "aa bb city x")],
    )
    a2 = s2[(1, 0, 5)]
    assert (a2.g_slice, a2.p_slice) == ("aa bb", "aa bb")
    assert a2.status == "CORRECTLY_FOUND_SPAN_BUT_NOT_ANNOTATION"
    assert s2[(1, 6, 12)].status == "UNALIGNED"

    # no shared first word -> no fallback, single UNALIGNED segment
    s3 = _segs(spark, [(1, 0, 5, 5, "alpha")], [(1, 0, 5, 5, "gamma")])
    assert len(s3) == 1 and s3[(1, 0, 5)].status == "UNALIGNED"

    # an empty shared "word" (F.split keeps ''-tokens when both slices
    # start with a space) must NOT become a zero-width aligned segment
    # scoring a phantom tp — the reference's word lists never contain ''
    s5 = _segs(spark, [(1, 0, 4, 1, " abc")], [(1, 0, 4, 1, " xyz")])
    assert len(s5) == 1 and s5[(1, 0, 4)].status == "UNALIGNED"

    # O-entity prefix on both sides -> CORRECTLY_IGNORED_O
    s4 = _segs(spark, [(1, 0, 9, 0, "the naïve")], [(1, 0, 9, 0, "the nai ve")])
    assert s4[(1, 0, 3)].status == "CORRECTLY_IGNORED_O"


def test_eval_gates_tp_on_span_match(spark):
    """Round-3 advice #2: a segment whose sliced surfaces mismatch
    (status UNALIGNED — the reference raises there) must never count as a
    tp even when both entities agree; it scores as fp + fn and is
    surfaced in n_unaligned_entities."""
    gold = [(1, 0, 3, 1, "abc"), (1, 4, 7, 2, "def")]
    pred = [(1, 0, 3, 1, "xyz"), (1, 4, 7, 2, "def")]  # first surface differs
    g = spark.createDataFrame(gold, SPAN_SCHEMA)
    p = spark.createDataFrame(pred, SPAN_SCHEMA)
    m = span_eval_from_alignment(span_align_resegment(g, p)).collect()[0]
    assert (m.md_tp, m.md_fp, m.md_fn) == (1, 1, 1)
    assert (m.el_tp, m.el_fp, m.el_fn) == (1, 1, 1)
    assert m.n_unaligned_entities == 1


@needs_ttl
def test_ep1_gold_vs_gold_is_perfect(spark):
    """The composed lifecycle over the REAL aida_testc.ttl: feeding the
    gold labels through tokenize -> synth subwords -> resolve -> phrases
    -> align must reproduce the gold exactly (F1 = 1.0 on both MD and
    EL) — pipeline parity for the reference's #1 entry point."""
    r = ep1_evaluate(spark).collect()[0]
    assert r.gold_source == f"nif:{AIDA_TESTC}"  # real-gold run, visibly
    assert r.n_docs == 131
    assert r.n_gold_phrases > 3000
    assert r.n_pred_phrases == r.n_gold_phrases
    assert r.md_f1 == pytest.approx(1.0)
    assert r.el_f1 == pytest.approx(1.0)
    assert r.md_fp == 0 and r.md_fn == 0


@needs_ttl
def test_ep1_corruption_degrades_deterministically(spark):
    """A seeded 1-in-20 label corruption must degrade F1 below 1.0 by an
    exactly reproducible amount (the sensitivity half of the EP1 gate)."""
    r1 = ep1_evaluate(spark, corrupt_every=20).collect()[0]
    r2 = ep1_evaluate(spark, corrupt_every=20).collect()[0]
    assert r1.el_f1 < 1.0
    assert 0.5 < r1.el_f1 < 0.999
    assert (r1.md_tp, r1.md_fp, r1.md_fn, r1.el_f1) == (
        r2.md_tp, r2.md_fp, r2.md_fn, r2.el_f1
    )


def test_ep1_synthetic_fallback_runs_anywhere(spark):
    """Without the reference checkout the built-in corpus drives the same
    DAG to the same invariant (F1 = 1.0)."""
    r = ep1_evaluate(spark, ttl_path="/nonexistent/gold.ttl").collect()[0]
    assert r.gold_source == "builtin_fallback"  # fallback is distinguishable
    assert r.n_docs == 3
    assert r.md_f1 == pytest.approx(1.0)
    assert r.el_f1 == pytest.approx(1.0)


def test_align_properties_random_partitions(spark):
    """Property: for ANY two span streams that partition the same doc into
    contiguous intervals, the aligned segments (1) partition the doc
    exactly (no gaps, no overlaps), (2) all carry span_match (same text
    both sides), and (3) identical streams yield perfect metrics."""
    import random

    rng = random.Random(99)

    def rand_partition(doc_id, text):
        # random contiguous split into spans with random entities
        cuts = sorted(rng.sample(range(1, len(text)), rng.randint(1, 6)))
        bounds = [0] + cuts + [len(text)]
        return [
            (doc_id, b, e, rng.choice([0, 0, 1, 2, 3]), text[b:e])
            for b, e in zip(bounds, bounds[1:])
        ]

    docs = {d: "x" * rng.randint(8, 40) for d in range(1, 21)}
    gold_rows, pred_rows = [], []
    for d, text in docs.items():
        gold_rows += rand_partition(d, text)
        pred_rows += rand_partition(d, text)
    g = spark.createDataFrame(gold_rows, SPAN_SCHEMA)
    p = spark.createDataFrame(pred_rows, SPAN_SCHEMA)
    segs = span_align_resegment(g, p).collect()
    by_doc = {}
    for r in segs:
        by_doc.setdefault(r.doc_id, []).append((r.seg_begin, r.seg_end))
        assert r.span_match, r  # same doc text both sides -> always matches
    for d, ivs in by_doc.items():
        ivs.sort()
        assert ivs[0][0] == 0 and ivs[-1][1] == len(docs[d])
        for (b1, e1), (b2, e2) in zip(ivs, ivs[1:]):
            assert e1 == b2, (d, ivs)  # contiguous: no gap, no overlap
    # identity: aligning a stream against itself is perfect
    m = span_eval_from_alignment(span_align_resegment(g, g)).collect()[0]
    assert m.md_fp == m.md_fn == 0 and m.el_f1 == pytest.approx(1.0)
