"""AIDA-CoNLL TSV source (reference operator S1 + join J1).

The reference streams `AIDA-YAGO2-dataset.tsv` line-by-line with a
stateful Python loop (reference: src/spel/aida.py:197-220): `-DOCSTART-`
sentinels open documents, blank lines close sentences, and tab-separated
token lines carry up to 7 annotation columns (column semantics documented
at src/spel/aida.py:14-22).

Spark re-expression: `spark.read.text` -> per-file line index -> running
count of sentinel/blank markers via window sums derives (doc_id,
sentence_idx, token_idx); the 7 columns are a split projection.  The
dataset itself is license-gated and absent from the reference snapshot;
tests synthesize format-identical fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TOKEN_COLS = [
    "token", "bio", "full_mention", "yago_entity",
    "wiki_url", "wiki_id", "freebase_mid",
]


def read_aida_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Parse the AIDA TSV into a flat tokens DataFrame.

    Output: (doc_id, doc_header, sentence_idx, token_idx, token, bio,
    full_mention, yago_entity, wiki_url, wiki_id, freebase_mid).

    Line order: AIDA ships as ONE text file; a single-file `read.text`
    yields rows in file order per split, made explicit with a per-file
    window over `monotonically_increasing_id` (splits of one file keep
    ascending ids).
    """
    raw = (
        spark.read.text(path)
        .withColumn("file", F.input_file_name())
        .withColumn("mono", F.monotonically_increasing_id())
    )
    w = Window.partitionBy("file").orderBy("mono")
    lines = raw.withColumn("line_no", F.row_number().over(w))

    is_doc = F.col("value").startswith("-DOCSTART-")
    is_blank = F.length(F.trim(F.col("value"))) == 0
    cum = Window.partitionBy("file").orderBy("line_no").rowsBetween(
        Window.unboundedPreceding, 0
    )
    marked = (
        lines.withColumn("doc_id", F.sum(is_doc.cast("int")).over(cum))
        .withColumn("sentence_idx", F.sum(is_blank.cast("int")).over(cum))
    )
    header = marked.filter(is_doc).select(
        "doc_id", F.regexp_extract("value", r"-DOCSTART- \((.*)\)", 1).alias("doc_header")
    )
    cols = F.split(F.col("value"), "\t")
    tokens = (
        marked.filter(~is_doc & ~is_blank)
        .select(
            "doc_id", "sentence_idx", "line_no",
            # F.get: null (not ANSI error) for rows with fewer columns —
            # AIDA lines carry 1-7 columns (aida.py:14-22)
            *[F.get(cols, i).alias(name) for i, name in enumerate(TOKEN_COLS)],
        )
        .withColumn(
            "token_idx",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("line_no")) - 1,
        )
        .drop("line_no")
    )
    return tokens.join(F.broadcast(header), "doc_id")


def split_of(doc_header) -> "F.Column":
    """train / testa / testb from the docstart header (aida.py:5-7)."""
    return (
        F.when(doc_header.contains("testa"), F.lit("testa"))
        .when(doc_header.contains("testb"), F.lit("testb"))
        .otherwise(F.lit("train"))
    )


def mention_candidate_rank_join(
    tokens: DataFrame, candidate_records: DataFrame
) -> DataFrame:
    """J1: the reference's ordered equi-join with positional consumption.

    For each B-tagged token, the reference scans for the first unconsumed
    CandidateRecord with matching orig_text (src/spel/aida.py:79-84) —
    stateful in Python, but equivalent to ranking both sides per
    (doc_id, surface) in order and equi-joining on the occurrence rank.

    tokens: B-rows with (doc_id, token_idx, full_mention).
    candidate_records: (doc_id, record_idx, orig_text, ...).
    """
    wt = Window.partitionBy("doc_id", "full_mention").orderBy("token_idx")
    b_tokens = tokens.filter(F.col("bio") == "B").withColumn(
        "occurrence_rank", F.row_number().over(wt)
    )
    wc = Window.partitionBy("doc_id", "orig_text").orderBy("record_idx")
    ranked_cands = candidate_records.withColumn(
        "occurrence_rank", F.row_number().over(wc)
    )
    return b_tokens.join(
        ranked_cands,
        (b_tokens["doc_id"] == ranked_cands["doc_id"])
        & (b_tokens["full_mention"] == ranked_cands["orig_text"])
        & (b_tokens["occurrence_rank"] == ranked_cands["occurrence_rank"]),
        "left",
    ).drop(ranked_cands["doc_id"]).drop(ranked_cands["occurrence_rank"])
