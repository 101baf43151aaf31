"""NIF (RDF turtle) gold-annotation source — S8-lite.

The reference parses GERBIL's NIF wire format with the pynif library
(reference: src/gerbil_connect/nif_parser.py:5-47); the repo ships a real
public gold fixture, ``resources/data/aida_testc.ttl`` (131 docs, 4,028
mentions — README.md:258-260).  This adapter parses the line-structured
turtle Spark-side into two DataFrames, giving J6/J7 (span alignment +
metric counts) a genuine gold-span input instead of synthetic data:

* contexts: (doc_id INT, doc_uri STRING, text STRING)
* phrases:  (doc_id INT, begin INT, end INT, surface STRING, entity STRING)

Parser shape: each turtle block starts at ``<subject> a ...`` and carries
one predicate per line; a running ``last(subject)`` window groups lines by
block (the same ordered-scan pattern as the PPRforNED adapter,
sources/resources.py).  This handles the NIF files GERBIL and the
reference emit (one predicate per line, offset-based URIs); it is not a
general RDF parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_WIKI_PREFIX = "http://en.wikipedia.org/wiki/"


def _unescape(col):
    """Turtle string unescape for the two escapes GERBIL emits."""
    return F.replace(
        F.replace(col, F.lit('\\"'), F.lit('"')), F.lit("\\\\"), F.lit("\\")
    )


def parse_nif_gold(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Parse a NIF turtle file into (contexts, phrases) DataFrames."""
    raw = (
        spark.read.text(path)
        .withColumn("file", F.input_file_name())
        .withColumn("mono", F.monotonically_increasing_id())
    )
    w = Window.partitionBy("file").orderBy("mono")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    subj_start = F.regexp_extract("value", r"^<(\S+)> a ", 1)
    lines = raw.withColumn(
        "subj",
        F.last(F.when(subj_start != "", subj_start), ignorenulls=True).over(cum),
    )
    fields = lines.select(
        "subj",
        F.regexp_extract("value", r"nif:isString \"(.*)\" \.$", 1).alias("is_string"),
        F.regexp_extract("value", r"nif:anchorOf \"(.*)\" ;$", 1).alias("anchor"),
        F.regexp_extract("value", r"nif:beginIndex \"(\d+)\"", 1).alias("begin_s"),
        F.regexp_extract("value", r"nif:endIndex \"(\d+)\"", 1).alias("end_s"),
        F.regexp_extract("value", r"nif:referenceContext <(\S+)>", 1).alias("ref"),
        F.regexp_extract("value", r"itsrdf:taIdentRef <(\S+)>", 1).alias("ident"),
        # 'a nif:Context,' / 'a nif:Context ;' but NOT nif:ContextCollection
        F.col("value").rlike(r" a nif:Context[,; ]").alias("is_context"),
    )
    nn = lambda c: F.max(F.when(F.col(c) != "", F.col(c))).alias(c)  # noqa: E731
    blocks = fields.groupBy("subj").agg(
        nn("is_string"), nn("anchor"), nn("begin_s"), nn("end_s"),
        nn("ref"), nn("ident"),
        F.max(F.col("is_context").cast("int")).alias("is_context"),
    )
    doc_id_of = lambda c: F.regexp_extract(c, r"/(\d+)$", 1).cast("int")  # noqa: E731
    contexts = blocks.filter(
        (F.col("is_context") == 1) & F.col("is_string").isNotNull()
    ).select(
        doc_id_of(F.col("subj")).alias("doc_id"),
        F.col("subj").alias("doc_uri"),
        _unescape(F.col("is_string")).alias("text"),
    )
    phrases = blocks.filter(
        F.col("subj").contains("#offset_") & F.col("anchor").isNotNull()
    ).select(
        doc_id_of(F.col("ref")).alias("doc_id"),
        F.col("begin_s").cast("int").alias("begin"),
        F.col("end_s").cast("int").alias("end"),
        _unescape(F.col("anchor")).alias("surface"),
        F.replace(F.col("ident"), F.lit(_WIKI_PREFIX), F.lit("")).alias("entity"),
    )
    return contexts, phrases
