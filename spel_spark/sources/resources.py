"""Resource dimension sources (reference operators S2-S5).

* PPRforNED candidate files (S2): ENTITY/CANDIDATE key:value TSV lines,
  one member file per document inside a zip (reference: src/spel/aida.py:
  92-187).  A zip-member-per-doc layout is a Spark anti-pattern, so the
  normalized form is two tables — candidate_records (one row per ENTITY
  line, ranked per doc) and candidates (one row per CANDIDATE line) —
  parsed from the concatenated text with builtins only.
* canonical redirects + candidate JSONs (S3): spark.read.json ->
  broadcast dimensions (reference: src/spel/configuration.py:39-53,
  src/spel/candidate_manager.py:31-56).
* newline vocab -> dense ids (S4): file order = id order after the two
  reserved slots {'|||O|||': 0, '<pad>': 1} (reference:
  src/spel/configuration.py:64-70).
* gzipped JSONL training records (S5): spark.read.json handles .gz
  natively (reference uses a torchdata tar pipe, data_loader.py:154-178).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

RESERVED_VOCAB = ["|||O|||", "<pad>"]  # configuration.py:65


def _kv(cols: F.Column, key: str) -> F.Column:
    """Extract `key:value` cell from a split TSV line (aida.py:103-125)."""
    hit = F.filter(cols, lambda c: c.startswith(f"{key}:"))
    return F.when(
        F.size(hit) > 0, F.substr(hit.getItem(0), F.lit(len(key) + 2), F.length(hit.getItem(0)))
    )


def read_ppr_candidates(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Parse PPRforNED-format text (one file per doc, filename = doc_id+1).

    Per-doc candidate files are far below one split, so each file's lines
    stay inside one partition and ``monotonically_increasing_id`` is
    increasing in file order within it (the >1-split ordering hazard
    documented at sources/nif.py:parse_nif_gold cannot apply here).

    Returns (candidate_records, candidates):
      candidate_records: doc_id, record_idx, text, normal_name,
        predicted_type, qid, orig_text, non_considered_word_count, url
      candidates: doc_id, record_idx, id, in_count, out_count, url, name,
        normal_name, normal_wiki_title, predicted_type
    """
    raw = (
        spark.read.text(path)
        .withColumn("file", F.input_file_name())
        .withColumn("mono", F.monotonically_increasing_id())
    )
    w = Window.partitionBy("file").orderBy("mono")
    # member filename is str(doc_id + 1)  (aida.py:180)
    doc_id = (
        F.regexp_extract(F.col("file"), r"([0-9]+)[^/]*$", 1).cast("int") - 1
    )
    lines = (
        raw.withColumn("line_no", F.row_number().over(w))
        .withColumn("doc_id", doc_id)
        .filter(F.length(F.trim("value")) > 0)
    )
    return _parse_ppr_lines(lines)


def _parse_ppr_lines(lines: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Shared ENTITY/CANDIDATE line parser (aida.py:92-171 semantics).

    lines: (file, doc_id, line_no, value) with line_no ordered per file."""
    is_entity = F.col("value").startswith("ENTITY")
    cum = Window.partitionBy("file").orderBy("line_no").rowsBetween(
        Window.unboundedPreceding, 0
    )
    marked = lines.withColumn("record_idx", F.sum(is_entity.cast("int")).over(cum) - 1)
    cols = F.split(F.col("value"), "\t")

    records = marked.filter(is_entity).select(
        "doc_id", "record_idx",
        _kv(cols, "text").alias("text"),
        _kv(cols, "normalName").alias("normal_name"),
        _kv(cols, "predictedType").alias("predicted_type"),
        _kv(cols, "qid").alias("qid"),
        _kv(cols, "origText").alias("orig_text"),
        F.size(F.split(_kv(cols, "origText"), " ")).alias("non_considered_word_count"),
        _kv(cols, "url").alias("url"),
    )
    cands = marked.filter(F.col("value").startswith("CANDIDATE")).select(
        "doc_id", "record_idx",
        _kv(cols, "id").alias("id"),
        _kv(cols, "inCount").cast("int").alias("in_count"),
        _kv(cols, "outCount").cast("int").alias("out_count"),
        _kv(cols, "url").alias("url"),
        _kv(cols, "name").alias("name"),
        _kv(cols, "normalName").alias("normal_name"),
        _kv(cols, "normalWikiTitle").alias("normal_wiki_title"),
        _kv(cols, "predictedType").alias("predicted_type"),
    )
    return records, cands


def read_zip_members(
    spark: SparkSession, zip_path: str, n_partitions: int = 32
) -> DataFrame:
    """S2 zip-member extraction, distributed (ref src/spel/aida.py:174-187
    opens PPRforNED.zip and reads members named ``str(doc_id+1)`` one
    lookup at a time).

    Spark shape: the member NAMELIST is read once on the driver (zip
    central directory only — no payloads), parallelized, and each
    partition opens the zip LOCALLY and reads only its own members inside
    an Arrow ``mapInPandas`` — member bytes never pass through the
    driver.  Requires ``zip_path`` to be executor-visible (shared
    storage), like any Spark input path.  Returns (member, content).
    """
    import zipfile

    with zipfile.ZipFile(zip_path) as zf:
        names = [n for n in zf.namelist() if not n.endswith("/")]
    ndf = spark.createDataFrame(
        [(n,) for n in names], "member string"
    ).repartition(min(n_partitions, max(len(names), 1)))

    def read_members(batches):
        import pandas as pd
        import zipfile as _zf

        with _zf.ZipFile(zip_path) as zf:
            for pdf in batches:
                if pdf.empty:  # empty frames break Arrow type inference
                    continue
                yield pd.DataFrame(
                    {
                        "member": pdf["member"],
                        "content": [
                            zf.read(m).decode("utf-8", "replace")
                            for m in pdf["member"]
                        ],
                    }
                )

    return ndf.mapInPandas(read_members, "member string, content string")


def read_ppr_candidates_zip(
    spark: SparkSession, zip_path: str
) -> tuple[DataFrame, DataFrame]:
    """S2 end-to-end from the zip itself: member name ``str(doc_id+1)``
    (aida.py:180) -> per-line rows -> the shared ENTITY/CANDIDATE parser.
    Same output contract as :func:`read_ppr_candidates`, no pre-extraction
    step left to the user."""
    # only members whose basename is purely numeric are candidate docs —
    # the reference opens members named str(doc_id+1) and nothing else
    # (aida.py:180); metadata members (__MACOSX/._1, README) would parse
    # as phantom records or collide on the digits-suffix regex
    members = read_zip_members(spark, zip_path).filter(
        F.col("member").rlike(r"(^|/)[0-9]+$")
    )
    lines = (
        members.select(
            F.col("member").alias("file"),
            (F.regexp_extract("member", r"([0-9]+)$", 1).cast("int") - 1).alias(
                "doc_id"
            ),
            # \r?\n: zip members written on Windows are CRLF and a plain
            # '\n' split leaves '\r' on every line (F.trim strips spaces
            # only) — same fix as sources/nif.py's gold parse
            F.posexplode(F.split("content", "\r?\n")).alias("line_no", "value"),
        )
        .filter(F.length(F.trim("value")) > 0)
    )
    return _parse_ppr_lines(lines)


def read_vocab(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited titles -> (entity_id, entity_title); ids follow
    file order after the reserved slots (S4)."""
    raw = (
        spark.read.text(path)
        .withColumn("file", F.input_file_name())
        .withColumn("mono", F.monotonically_increasing_id())
    )
    w = Window.partitionBy("file").orderBy("mono")
    reserved = spark.createDataFrame(
        list(enumerate(RESERVED_VOCAB)), "entity_id int, entity_title string"
    )
    titles = raw.select(
        (F.row_number().over(w) + len(RESERVED_VOCAB) - 1).alias("entity_id"),
        F.col("value").alias("entity_title"),
    )
    return reserved.unionByName(titles)


def read_redirects_json(spark: SparkSession, path: str) -> DataFrame:
    """`{alias: canonical, ...}` JSON object -> (alias, canonical) rows.

    Scale-safe: the file is read as raw text and parsed with ``from_json``
    into a ``map<string,string>`` that is then exploded — one pass, no
    one-row-wide DataFrame, no per-key driver round-trips (round-1 finding:
    the column-per-key form falls over on a 500K-alias dimension).
    """
    raw = spark.read.text(path, wholetext=True)
    return raw.select(
        F.explode(F.from_json(F.col("value"), "map<string,string>")).alias(
            "alias", "canonical"
        )
    )


def read_jsonl_gz(spark: SparkSession, path: str, schema: T.StructType | str | None = None) -> DataFrame:
    """S5: gzipped JSONL — native to spark.read.json (supply the schema;
    never inferSchema on the hot path, SURVEY §1.3)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
