"""Word-level candidate aggregation + annotation resolution (A1 + A2).

The reference aggregates each word's subword predictions in two steps
(reference: src/spel/span_annotation.py):

* A1 — candidate construction (span_annotation.py:77-80 + the
  0.0-when-absent probability assignment at :109-121): a word's candidate
  set is the INTERSECTION of its subwords' top-k entity-id sets; each
  surviving id is scored by its mean probability across subwords.
* A2 — resolution cascade (span_annotation.py:90-107): unanimous top-1 ->
  that id; else best mean-probability candidate; else the majority top-1
  vote; if every top-1 appears exactly once, the FIRST subword's top-1.

Set-based re-expression: one posexplode + one groupBy builds per-(word,
entity) stats; a single row_number whose ordering keys encode the whole
cascade picks the winner:

  1. votes == n_subwords        (unanimous — at most one id can have it)
  2. is_candidate               (intersection members outrank the rest)
  3. avg_p among candidates     (best mean probability)
  4. votes                      (majority vote)
  5. first_vote_subword         (earliest top-1 voter == "first" tie rule)
  6. entity_id                  (total order)

Key 5 reproduces the reference's count==1 branch exactly (the earliest
voter of a 1-vote field IS subword 0's top-1).  Where the reference's tie
order is Python-set iteration order (nondeterministic), keys 5-6 impose a
deterministic one — documented deviation, required for resume equality.

Input schema: (doc_id, word_idx, subword_idx,
               top_k ARRAY<STRUCT<entity_id INT, p DOUBLE>>)
where the array order is the model's rank order (element 1 = top-1), as in
the reference's top_k_i_list/top_k_p_list pairing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def word_candidates(subwords: DataFrame) -> DataFrame:
    """A1: per-(doc, word, entity) aggregation of subword top-k lists.

    Returns (doc_id, word_idx, entity_id, n_subwords, n_hits, votes,
    first_vote_subword, avg_p, is_candidate):

    * ``avg_p`` = sum of the entity's probabilities over ALL the word's
      subwords / n_subwords — i.e. mean with 0.0 substituted where the
      entity is absent from a subword's top-k (span_annotation.py:109-121);
    * ``is_candidate`` = present in every subword's top-k (the set
      intersection of span_annotation.py:78-79);
    * ``votes`` = number of subwords whose top-1 is this entity;
      ``first_vote_subword`` = earliest such subword index.
    """
    ex = subwords.select(
        "doc_id",
        "word_idx",
        "subword_idx",
        F.posexplode("top_k").alias("pos", "c"),
    ).select(
        "doc_id", "word_idx", "subword_idx", "pos",
        F.col("c.entity_id").alias("entity_id"),
        F.col("c.p").alias("p"),
    )
    nsub = subwords.groupBy("doc_id", "word_idx").agg(
        F.count(F.lit(1)).alias("n_subwords")
    )
    # set semantics per subword: a duplicated entity_id inside one top_k
    # must count as ONE hit with its best p (the reference intersects SETS,
    # span_annotation.py:78-79) — count(*) would inflate n_hits past
    # n_subwords and double-count sum_p
    per_sub = ex.groupBy("doc_id", "word_idx", "subword_idx", "entity_id").agg(
        F.max("p").alias("p"),
        F.min("pos").alias("pos"),
    )
    agg = per_sub.groupBy("doc_id", "word_idx", "entity_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.sum("p").alias("sum_p"),
        F.sum((F.col("pos") == 0).cast("long")).alias("votes"),
        F.min(F.when(F.col("pos") == 0, F.col("subword_idx"))).alias(
            "first_vote_subword"
        ),
    )
    return agg.join(nsub, ["doc_id", "word_idx"]).select(
        "doc_id", "word_idx", "entity_id", "n_subwords", "n_hits", "votes",
        "first_vote_subword",
        (F.col("sum_p") / F.col("n_subwords")).alias("avg_p"),
        (F.col("n_hits") == F.col("n_subwords")).alias("is_candidate"),
    )


def resolve_words(subwords: DataFrame) -> DataFrame:
    """A2: the resolution cascade as one window over A1's output.

    Returns (doc_id, word_idx, resolved_entity, confidence, n_subwords)
    with ``confidence`` = the winner's 0.0-substituted mean probability
    (span_annotation.py:82-84).
    """
    cand = word_candidates(subwords)
    w = Window.partitionBy("doc_id", "word_idx").orderBy(
        F.col("unanimous").desc(),
        F.col("is_candidate").desc(),
        F.col("cand_avg_p").desc(),
        F.col("votes").desc(),
        F.col("first_vote_subword").asc_nulls_last(),
        F.col("entity_id").asc(),
    )
    ranked = (
        cand.withColumn("unanimous", F.col("votes") == F.col("n_subwords"))
        # COMPARISON key = floor(avg*1e9 + 0.5) as a scaled integer: two
        # entities whose sums differ only in float summation order (ulps,
        # ~1e-16) must tie here and fall through to votes — while real
        # probability differences down to 1e-9 still rank.  floor-scaled
        # integers, not round(): Spark round is HALF_UP, Python round is
        # HALF_EVEN, DuckDB scale-multiplies — three different winners at
        # half boundaries; floor(x*1e9+0.5) is identical in all three.
        .withColumn(
            "cand_avg_p",
            F.floor(
                F.when(F.col("is_candidate"), F.col("avg_p")).otherwise(F.lit(0.0))
                * F.lit(1e9)
                + F.lit(0.5)
            ).cast("long"),
        )
        .withColumn("rk", F.row_number().over(w))
    )
    return ranked.filter(F.col("rk") == 1).select(
        "doc_id", "word_idx",
        F.col("entity_id").alias("resolved_entity"),
        F.col("avg_p").alias("confidence"),
        "n_subwords",
    )


# --------------------------------------------------------------------------
# pure-Python twin of the reference algorithm, for unit-test parity
# --------------------------------------------------------------------------

def resolve_word_py(top_k_lists: list[list[tuple[int, float]]]) -> tuple[int, float]:
    """Resolution of ONE word given its subwords' ranked (entity_id, p)
    lists — computes exactly the Spark window's sort keys, so it is the
    bit-exact twin of :func:`resolve_words` AND a behavioral twin of the
    reference cascade (span_annotation.py:77-121) up to the documented
    deterministic tie-breaks.  Returns (resolved_entity, confidence)."""
    n = len(top_k_lists)
    r = [tk[0][0] for tk in top_k_lists]  # top-1 per subword
    entities = {i for tk in top_k_lists for i, _ in tk}
    rows = []
    for c in sorted(entities):
        hits = sum(1 for tk in top_k_lists if any(i == c for i, _ in tk))
        # max p per subword (set semantics for duplicated ids in one top_k)
        sum_p = sum(
            max((p for i, p in tk if i == c), default=0.0) for tk in top_k_lists
        )
        votes = sum(1 for x in r if x == c)
        first_vote = next((k for k, x in enumerate(r) if x == c), None)
        avg_p = sum_p / n
        is_cand = hits == n
        rows.append((
            c, votes == n, is_cand, avg_p if is_cand else 0.0, votes,
            first_vote, avg_p,
        ))
    import math

    rows.sort(
        key=lambda t: (
            # floor(x*1e9+0.5) scaled-integer comparison, matching
            # resolve_words: summation-order ulps must not decide between
            # candidates, and floor-scaling has one behavior in Spark,
            # Python and DuckDB (round() has three)
            -int(t[1]), -int(t[2]), -math.floor(t[3] * 1e9 + 0.5), -t[4],
            t[5] if t[5] is not None else float("inf"), t[0],
        )
    )
    top = rows[0]
    return top[0], top[6]
