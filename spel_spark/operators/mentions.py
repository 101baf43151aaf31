"""Mention extraction: transcript turns -> mention rows with char offsets.

Analogue of the reference's span detection + phrase building
(reference: src/spel/utils.py:280-397 chunk_annotate_and_merge_to_phrase;
span offsets src/spel/span_annotation.py:48-54).  The corpus convention
(datagen docstring) is that mentions are double-quote-delimited, so
extraction is deterministic; the hard coreference problem stays with
blocking/scoring/clustering.

Two implementations, tested to agree row-for-row:

* :func:`extract_mentions` — **pure Spark builtins** (split + posexplode +
  window prefix-sum for offsets); zero Python, whole-stage codegen.
* :func:`extract_mentions_arrow` — ``mapInPandas`` Arrow UDTF (the shape
  the north star mandates for pluggable tokenizers; swap the regex for a
  real tokenizer on real data).

Both preserve the per-turn text round-trip invariant:
``substring(text, begin_char+1, end_char-begin_char) == surface``.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spel_spark.functions.normalize import norm_surface_col

MENTION_SCHEMA = (
    "conv_id string, turn_idx int, begin_char int, end_char int, "
    "surface string, tool string"
)


def extract_mentions(transcripts: DataFrame) -> DataFrame:
    """Builtin extractor: quote-delimited spans with exact char offsets.

    split(text, '"') yields alternating outside/inside segments; inside
    segments sit at odd positions.  Begin offsets are prefix sums of prior
    segment lengths (+1 quote per boundary) computed WITHIN the row by an
    ``aggregate`` HOF — the whole stage is a narrow map with **zero
    shuffle**, so it scales linearly with input splits (a window over
    (conv_id, turn_idx) would shuffle every segment row).
    """
    segs = F.split(F.col("text"), '"')
    # running-sum array: begins[i] = sum_{j<i}(len(segs[j]) + 1)
    begins = F.aggregate(
        segs,
        F.struct(
            F.lit(0).cast("int").alias("pos"),
            F.array().cast("array<int>").alias("begins"),
        ),
        lambda acc, s: F.struct(
            (acc["pos"] + F.length(s) + 1).cast("int").alias("pos"),
            F.concat(acc["begins"], F.array(acc["pos"])).alias("begins"),
        ),
        lambda acc: acc["begins"],
    )
    exploded = transcripts.select(
        "conv_id", "turn_idx", "tool",
        F.size(segs).alias("n_segs"),
        F.posexplode(
            F.arrays_zip(segs.alias("segs"), begins.alias("begins"))
        ).alias("pos", "z"),
    )
    return exploded.filter(
        (F.col("pos") % 2 == 1) & (F.col("pos") < F.col("n_segs") - 1)
    ).select(
        "conv_id",
        "turn_idx",
        F.col("z.begins").alias("begin_char"),
        (F.col("z.begins") + F.length(F.col("z.segs"))).cast("int").alias("end_char"),
        F.col("z.segs").alias("surface"),
        "tool",
    )


_MENTION_RE = re.compile(r'"([^"]*)"')


def extract_mentions_arrow(transcripts: DataFrame) -> DataFrame:
    """mapInPandas extractor — Arrow-batched, same output as the builtin.

    This is the extension point for real tokenization (SURVEY §2.10 item 1):
    replace the regex with any per-batch vectorized span detector.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "conv_id": [], "turn_idx": [], "begin_char": [],
                "end_char": [], "surface": [], "tool": [],
            }
            for conv, turn, text, tool in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"], pdf["tool"]
            ):
                if not isinstance(text, str):
                    continue
                for m in _MENTION_RE.finditer(text):
                    out["conv_id"].append(conv)
                    out["turn_idx"].append(turn)
                    out["begin_char"].append(m.start(1))
                    out["end_char"].append(m.end(1))
                    out["surface"].append(m.group(1))
                    out["tool"].append(tool)
            if out["conv_id"]:  # empty frames infer wrong Arrow types
                yield pd.DataFrame(out)

    return transcripts.select("conv_id", "turn_idx", "text", "tool").mapInPandas(
        op, schema=MENTION_SCHEMA
    )


def with_mention_id(mentions: DataFrame) -> DataFrame:
    """Deterministic 64-bit mention id (FIXTURES §3): xxhash64 of the
    natural key.  Used identically for predicted and gold mentions so ids
    align without a join."""
    return mentions.withColumn(
        "mention_id", F.xxhash64("conv_id", "turn_idx", "begin_char")
    )


def with_norm_surface(mentions: DataFrame, redirects: DataFrame | None = None) -> DataFrame:
    """Add the normalized surface key; optionally apply the canonical-
    redirect dimension (broadcast left join + coalesce — reference J3,
    src/spel/data_loader.py:269-271)."""
    out = mentions.withColumn("norm_surface", norm_surface_col(F.col("surface")))
    if redirects is not None:
        out = (
            out.join(
                F.broadcast(redirects),
                out["norm_surface"] == redirects["alias_norm"],
                "left",
            )
            .withColumn("norm_surface", F.coalesce("canonical_norm", "norm_surface"))
            .drop("alias_norm", "canonical_norm")
        )
    return out
