"""NIF gold source on the REAL reference fixture (aida_testc.ttl): document
and mention counts from README.md:258-260, span/text consistency, and the
J6/J7 operators running over genuine gold spans."""

import os

import pytest
from pyspark.sql import functions as F

from spel_spark.sources.nif import parse_nif_gold

TTL = "/root/reference/resources/data/aida_testc.ttl"

needs_ttl = pytest.mark.skipif(
    not os.path.exists(TTL), reason="reference testc fixture not present"
)


@pytest.fixture(scope="module")
def nif(spark):
    contexts, phrases = parse_nif_gold(spark, TTL)
    return contexts.cache(), phrases.cache()


@needs_ttl
def test_testc_counts(nif):
    """131 docs (README.md:258).  NOTE: the README claims 4,028 mentions
    but the shipped snapshot contains 3,781 phrase blocks (grep
    'nif:anchorOf' == 3,781; beginIndex lines == 3,781 + 131 contexts);
    the parser is validated against an independent line scan below."""
    contexts, phrases = nif
    assert contexts.count() == 131
    # independent pure-python scan of the same file
    n_anchor = n_ctx = 0
    ents = set()
    with open(TTL, encoding="utf-8") as f:
        for line in f:
            if "nif:anchorOf" in line:
                n_anchor += 1
            if " a nif:Context," in line or " a nif:Context ;" in line:
                n_ctx += 1
            if "itsrdf:taIdentRef" in line:
                ents.add(line.split("<")[1].split(">")[0])
    assert contexts.count() == n_ctx == 131
    assert phrases.count() == n_anchor == 3781
    assert phrases.select("doc_id").distinct().count() <= 131
    assert phrases.select("entity").distinct().count() == len(
        {e for e in ents if "sfu.ca" not in e}
    )


@needs_ttl
def test_spans_slice_into_context_text(spark, nif):
    """X10 invariant on real data: text[begin:end] == anchorOf."""
    contexts, phrases = nif
    joined = phrases.join(contexts.select("doc_id", "text"), "doc_id")
    sliced = joined.withColumn(
        "slice", F.substring("text", F.col("begin") + 1, F.col("end") - F.col("begin"))
    )
    bad = sliced.filter(F.col("slice") != F.col("surface"))
    assert bad.count() == 0, bad.select("doc_id", "begin", "surface", "slice").head(5)


@needs_ttl
def test_span_metrics_on_real_gold(spark, nif):
    """J6/J7 over real gold: gold-vs-gold is perfect; dropping every 4th
    span gives recall exactly 3/4 at precision 1."""
    from spel_spark.operators.spans import span_metric_counts, span_overlap_join

    _, phrases = nif
    gold = phrases.select("doc_id", "begin", "end", "entity")
    n_gold = gold.count()
    perfect = span_metric_counts(gold, gold).collect()[0]
    assert perfect.tp == n_gold and perfect.f1 == pytest.approx(1.0)

    from pyspark.sql import Window

    pred = gold.withColumn(
        "rn",
        F.row_number().over(Window.orderBy("doc_id", "begin", "end")),
    ).filter(F.col("rn") % 4 != 0).drop("rn")
    m = span_metric_counts(gold, pred).collect()[0]
    assert m.precision == pytest.approx(1.0)
    assert m.recall == pytest.approx(m.tp / n_gold)
    assert m.tp == pred.count()

    aligned = span_overlap_join(gold, pred)
    # every gold span appears exactly once on the left of the alignment
    assert aligned.count() == n_gold
    matched = aligned.filter(F.col("p_begin").isNotNull())
    # aligned matches are exact-overlap self matches
    exact = matched.filter(
        (F.col("g_begin") == F.col("p_begin")) & (F.col("g_end") == F.col("p_end"))
    )
    assert exact.count() == matched.count()
