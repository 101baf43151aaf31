"""Span-level operators: BIOES tagging, phrase building, span alignment,
candidate filtering — the reference's token/span machinery re-expressed
set-based (SURVEY W1/A4/J6/J7/J8/X7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# BIOES label codes, matching the reference (span_annotation.py:17,139)
BIOES = {"B": 0, "I": 1, "O": 2, "E": 3, "S": 4}


def bioes_tags(tokens: DataFrame) -> DataFrame:
    """W1: BIOES labels from an in-mention bitmap via lag/lead.

    The reference derives B/I/O/E/S per token from neighbours with a
    sequential scan (src/spel/data_loader.py:232-240); here it is two
    window functions + a CASE cascade.

    tokens: (doc_id, token_idx, is_in_mention boolean); mention boundaries
    additionally need ``mention_break`` (true when this token starts a new
    mention even if the previous token was in one) — pass lit(False) for
    the reference's plain bitmap semantics.
    """
    w = Window.partitionBy("doc_id").orderBy("token_idx")
    prev = F.coalesce(F.lag("is_in_mention").over(w), F.lit(False))
    nxt = F.coalesce(F.lead("is_in_mention").over(w), F.lit(False))
    cur = F.col("is_in_mention")
    label = (
        F.when(~cur, F.lit("O"))
        .when(~prev & ~nxt, F.lit("S"))
        .when(~prev & nxt, F.lit("B"))
        .when(prev & nxt, F.lit("I"))
        .otherwise(F.lit("E"))
    )
    code = (
        F.when(label == "B", BIOES["B"])
        .when(label == "I", BIOES["I"])
        .when(label == "O", BIOES["O"])
        .when(label == "E", BIOES["E"])
        .otherwise(BIOES["S"])
    )
    return tokens.withColumn("bioes", label).withColumn("bioes_code", code)


def phrases_from_annotations(
    word_annotations: DataFrame, detokenize: bool = False
) -> DataFrame:
    """A4/W3: consecutive-run grouping — adjacent words with the same
    resolved annotation merge into one phrase (the PhraseAnnotation
    analogue; reference src/spel/utils.py:389-396).

    input: (doc_id, word_idx, resolved_annotation, begin_char, end_char,
    word, confidence); output one row per phrase.

    ``detokenize=True`` renders the phrase through the Moses-EN core
    rules (functions/detokenize.py) instead of space-joining — the
    reference's PhraseAnnotation.word_string (span_annotation.py:44-46).
    The default stays ``concat_ws(' ')``: X9's byte-identical turn-text
    round-trip depends on it, and evaluation-side comparison is
    space-insensitive anyway.
    """
    w = Window.partitionBy("doc_id").orderBy("word_idx")
    chg = F.when(
        F.lag("resolved_annotation").over(w).isNull()
        | (F.lag("resolved_annotation").over(w) != F.col("resolved_annotation")),
        1,
    ).otherwise(0)
    runs = word_annotations.withColumn("chg", chg).withColumn(
        "run_id", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    if detokenize:
        from spel_spark.functions.detokenize import moses_detokenize_col

        # order pinned explicitly (collect_list order is only incidentally
        # sorted); sort by word_idx, then detokenize the word array
        ordered = F.transform(
            F.array_sort(F.collect_list(F.struct("word_idx", "word"))),
            lambda s: s["word"],
        )
        phrase = moses_detokenize_col(ordered)
    else:
        # X9: turn-text reconstruction must round-trip byte-identically
        phrase = F.concat_ws(" ", F.collect_list("word"))
    return (
        runs.groupBy("doc_id", "run_id", "resolved_annotation")
        .agg(
            F.min("begin_char").alias("begin_char"),
            F.max("end_char").alias("end_char"),
            phrase.alias("phrase"),
            F.avg("confidence").alias("confidence"),  # A11 mean-of-words
            F.count(F.lit(1)).alias("n_words"),
        )
    )


def span_overlap_join(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """J6: gold<->predicted span alignment as an interval join.

    The reference aligns the two phrase streams with a 97-line two-pointer
    merge that re-segments spans (src/spel/utils.py:425-521 — "the
    hairiest code in the repo").  Set-based: join on doc_id + overlap
    predicate, resolve one-to-many by largest overlap (row_number).

    gold/pred: (doc_id, begin, end, entity).  Output: one row per gold
    span with its best-overlapping prediction (or nulls).
    """
    # rename BOTH sides' doc_id before the join: when pred derives from
    # gold (shared lineage), g["doc_id"] == p["doc_id"] resolves to a
    # trivially-true predicate and the join silently goes cross-document
    g = gold.select(
        F.col("doc_id").alias("g_doc"),
        F.col("begin").alias("g_begin"), F.col("end").alias("g_end"),
        F.col("entity").alias("g_entity"),
    )
    p = pred.select(
        F.col("doc_id").alias("p_doc"),
        F.col("begin").alias("p_begin"), F.col("end").alias("p_end"),
        F.col("entity").alias("p_entity"),
    )
    joined = g.join(
        p,
        (F.col("g_doc") == F.col("p_doc"))
        & (F.col("p_begin") < F.col("g_end"))
        & (F.col("g_begin") < F.col("p_end")),
        "left",
    ).withColumn("doc_id", F.col("g_doc")).drop("g_doc", "p_doc")
    overlap = F.least("g_end", "p_end") - F.greatest("g_begin", "p_begin")
    w = Window.partitionBy("doc_id", "g_begin", "g_end").orderBy(
        F.desc_nulls_last(overlap), F.col("p_begin")
    )
    return (
        joined.withColumn("overlap", overlap)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


def span_align_resegment(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """J6 full fidelity: re-segment both phrase streams at the union of
    their span boundaries and compare aligned segments with the
    reference's space-insensitive surface equality.

    The reference aligns the gold and predicted phrase streams with a
    stateful two-pointer merge that re-segments the longer span whenever
    boundaries disagree (src/spel/utils.py:425-521 — the split/merge
    branches build a ``new_phrase`` from the longer side's words until it
    matches the shorter side) and treats two surfaces as the same span
    when they are equal after removing spaces (utils.py:436-438 —
    tokenizer drift like "U. S." vs "U.S.").

    Set-based re-expression: both streams partition each document into
    contiguous char intervals (O-runs are phrases too), so the merge's
    emitted comparison pairs are exactly the nonempty pairwise
    intersections of the two interval sets — an interval join, no
    sequential state.  Each side's surface is sliced to the intersection
    (offset arithmetic into its own surface string) so split/merge cases
    compare the right text; the space-stripped comparison then absorbs
    pure spacing drift between the slices.

    Word-granular fallback (ref utils.py:486-497, the "re-alignment not
    helpful" branch): when a segment's slices disagree even space-
    insensitively, the reference walks both spans' WORD lists in
    lockstep, emits the longest pairwise-equal word prefix as an aligned
    comparison pair (dropping the first differing word), and continues
    on the remainders.  Re-expressed set-based: an UNALIGNED segment
    whose slices share a >= 1-word pairwise-equal prefix splits into an
    ALIGNED prefix segment (status recomputed from the entities, exactly
    get_correct_status on the prefix phrases) plus an UNALIGNED
    remainder segment.  Documented residual deviation: the reference
    would loop again on the remainders, but past the first divergence
    its loop only terminates for inputs that re-enter the solvable
    branches — on the genuinely divergent tail it does not terminate at
    all (utils.py:487 builds an empty phrase and re-advances by zero),
    so the remainder is reported UNALIGNED rather than re-aligned.

    This is an EVALUATION operator (gold sets are small); it is not on
    the 100-TB extract/cluster hot path.

    gold/pred: (doc_id, begin, end, entity, surface); entity NULL or 0
    means O.  Output: one row per aligned segment —
    (doc_id, seg_begin, seg_end, g_entity, p_entity, g_slice, p_slice,
    span_match, status) with status one of the reference's
    ComparisonResult names (utils.py:400-404) or 'UNALIGNED' where the
    reference would raise.
    """
    g = gold.select(
        F.col("doc_id").alias("g_doc"),
        F.col("begin").alias("g_begin"), F.col("end").alias("g_end"),
        F.coalesce(F.col("entity"), F.lit(0)).alias("g_entity"),
        F.col("surface").alias("g_surface"),
    )
    p = pred.select(
        F.col("doc_id").alias("p_doc"),
        F.col("begin").alias("p_begin"), F.col("end").alias("p_end"),
        F.coalesce(F.col("entity"), F.lit(0)).alias("p_entity"),
        F.col("surface").alias("p_surface"),
    )
    joined = g.join(
        p,
        (F.col("g_doc") == F.col("p_doc"))
        & (F.col("p_begin") < F.col("g_end"))
        & (F.col("g_begin") < F.col("p_end")),
        "full",
    )
    seg_begin = F.greatest("g_begin", "p_begin")
    seg_end = F.least("g_end", "p_end")

    # A segment covering its WHOLE span takes the span's surface verbatim:
    # a detokenized surface may be longer than (end - begin) — e.g. the
    # possessive split renders "kamora's" as "kamora 's" — and offset
    # slicing would truncate it.  This is exactly the reference's
    # special_condition case (utils.py:436-438): 1:1-aligned spans whose
    # surfaces differ only in spacing.  Partial overlaps slice by char
    # offsets (exact when the surface is a text slice, as NIF gold is).
    def sliced(surface, span_begin, span_end):
        whole = (seg_begin == F.col(span_begin)) & (seg_end == F.col(span_end))
        return F.when(whole, F.col(surface)).otherwise(
            F.substring(
                F.col(surface), seg_begin - F.col(span_begin) + 1, seg_end - seg_begin
            )
        )

    g_slice = sliced("g_surface", "g_begin", "g_end")
    p_slice = sliced("p_surface", "p_begin", "p_end")
    strip = lambda c: F.replace(c, F.lit(" "), F.lit(""))  # noqa: E731
    span_match = strip(g_slice) == strip(p_slice)
    g_is_o = F.col("g_entity") == 0
    ann_right = F.col("g_entity") == F.col("p_entity")
    status = (
        F.when(F.col("g_doc").isNull() | F.col("p_doc").isNull(), F.lit("UNALIGNED"))
        .when(~span_match, F.lit("UNALIGNED"))
        .when(ann_right & g_is_o, F.lit("CORRECTLY_IGNORED_O"))
        .when(ann_right, F.lit("CORRECTLY_FOUND_BOTH_SPAN_AND_ANNOTATION"))
        .when(~g_is_o, F.lit("CORRECTLY_FOUND_SPAN_BUT_NOT_ANNOTATION"))
        .otherwise(F.lit("OVER_GENERATED_ANNOTATION"))
    )
    base = joined.select(
        F.coalesce("g_doc", "p_doc").alias("doc_id"),
        F.coalesce(seg_begin, F.col("g_begin"), F.col("p_begin")).alias("seg_begin"),
        F.coalesce(seg_end, F.col("g_end"), F.col("p_end")).alias("seg_end"),
        F.coalesce("g_entity", F.lit(0)).alias("g_entity"),
        F.coalesce("p_entity", F.lit(0)).alias("p_entity"),
        g_slice.alias("g_slice"),
        p_slice.alias("p_slice"),
        F.coalesce(span_match, F.lit(False)).alias("span_match"),
        status.alias("status"),
    )

    # ---- word-granular common-prefix fallback (utils.py:486-497) ----
    gw, pw = F.split("g_slice", " "), F.split("p_slice", " ")
    eqs = F.zip_with(gw, pw, lambda a, b: F.coalesce(a == b, F.lit(False)))
    first_false = F.array_position(eqs, F.lit(False))  # 0 when all equal
    kw = (
        F.when(first_false > 0, first_false - 1)
        .otherwise(F.least(F.size(gw), F.size(pw)))
        .cast("int")
    )
    prefix = F.concat_ws(" ", F.slice(gw, 1, kw))
    plen = F.length(prefix)
    eligible = (
        (F.col("status") == "UNALIGNED")
        & F.col("g_slice").isNotNull()
        & F.col("p_slice").isNotNull()
        & (kw >= 1)
        # F.split keeps ""-tokens (boundary-adjacent spaces in a partial
        # slice), and the reference's whitespace word lists can never
        # contain an empty word — a prefix with no visible text must not
        # become a zero-width ALIGNED segment scoring a phantom tp
        & (F.length(F.trim(prefix)) > 0)
    )
    gz = F.col("g_entity") == 0
    prefix_status = (
        F.when((F.col("g_entity") == F.col("p_entity")) & gz, F.lit("CORRECTLY_IGNORED_O"))
        .when(F.col("g_entity") == F.col("p_entity"),
              F.lit("CORRECTLY_FOUND_BOTH_SPAN_AND_ANNOTATION"))
        .when(~gz, F.lit("CORRECTLY_FOUND_SPAN_BUT_NOT_ANNOTATION"))
        .otherwise(F.lit("OVER_GENERATED_ANNOTATION"))
    )

    def seg(b, e, gs, ps, sm, st):
        # every member cast + aliased: array() requires the two branches'
        # struct types (names AND types) to agree BEFORE the outer cast
        return F.struct(
            b.cast("int").alias("seg_begin"),
            e.cast("int").alias("seg_end"),
            F.col("g_entity").cast("int").alias("g_entity"),
            F.col("p_entity").cast("int").alias("p_entity"),
            gs.cast("string").alias("g_slice"),
            ps.cast("string").alias("p_slice"),
            sm.cast("boolean").alias("span_match"),
            st.cast("string").alias("status"),
        )

    rest = lambda c: F.col(c).substr(plen + 2, F.length(c))  # noqa: E731
    seg_schema = (
        "array<struct<seg_begin:int,seg_end:int,g_entity:int,p_entity:int,"
        "g_slice:string,p_slice:string,span_match:boolean,status:string>>"
    )
    rows = (
        F.when(
            eligible,
            F.array(
                seg(F.col("seg_begin"), F.col("seg_begin") + plen,
                    prefix, prefix, F.lit(True), prefix_status),
                seg(F.col("seg_begin") + plen + 1, F.col("seg_end"),
                    rest("g_slice"), rest("p_slice"),
                    F.lit(False), F.lit("UNALIGNED")),
            ),
        )
        .otherwise(
            F.array(
                seg(F.col("seg_begin"), F.col("seg_end"), F.col("g_slice"),
                    F.col("p_slice"), F.col("span_match"), F.col("status"))
            )
        )
        .cast(seg_schema)  # cast pins struct field names (CASE members
        # silently become col1/col2 otherwise)
    )
    return base.select("doc_id", F.explode(rows).alias("r")).select("doc_id", "r.*")


def span_eval_from_alignment(
    segments: DataFrame, ignore_over_generated: bool = False
) -> DataFrame:
    """MD + EL micro P/R/F1 from aligned segments — the reference's set
    bookkeeping (src/spel/evaluate_local.py:98-109: g_ed/p_ed keyed by the
    predicted segment's char interval, g_el/p_el additionally by entity)
    as ONE aggregation.

    ``ignore_over_generated`` mirrors the reference's evaluation mode
    (utils.py:522-528): an OVER_GENERATED_ANNOTATION pair has its
    prediction reset to O and is rescored CORRECTLY_IGNORED_O — spurious
    predictions over gold-O text stop counting as false positives.  (The
    reference's companion mode, ignore_predictions_outside_candidate_list
    at utils.py:530-543, is this engine's ``candidate_rerank`` applied to
    the predicted stream: both re-resolve to the best-ranked allowed
    alternative, falling back to O.)

    Returns one row:
    (md_tp, md_fp, md_fn, md_precision, md_recall, md_f1,
     el_tp, el_fp, el_fn, el_precision, el_recall, el_f1,
     n_unaligned_entities).

    True positives are GATED on ``span_match``: the reference never scores
    a pair whose aligned surfaces disagree — it raises inside
    compare_gold_and_predicted_annotation_documents instead (round-3
    advice #2).  A segment where both sides carry an entity but the
    sliced surfaces mismatch therefore counts as BOTH an fp (spurious
    prediction) and an fn (missed gold), never a tp; the
    ``n_unaligned_entities`` column surfaces how many such segments
    existed so a genuinely misaligned stream is visible in the output
    row rather than silently rescored."""
    if ignore_over_generated:
        og = F.col("status") == "OVER_GENERATED_ANNOTATION"
        segments = segments.withColumn(
            "p_entity", F.when(og, F.lit(0)).otherwise(F.col("p_entity"))
        ).withColumn(
            "status", F.when(og, F.lit("CORRECTLY_IGNORED_O")).otherwise(F.col("status"))
        )
    g_in = F.col("g_entity") != 0
    p_in = F.col("p_entity") != 0
    aligned = F.col("span_match")
    agg = segments.agg(
        F.sum((g_in & p_in & aligned).cast("long")).alias("md_tp"),
        F.sum((p_in & ~(g_in & aligned)).cast("long")).alias("md_fp"),
        F.sum((g_in & ~(p_in & aligned)).cast("long")).alias("md_fn"),
        F.sum(
            (g_in & p_in & aligned & (F.col("g_entity") == F.col("p_entity"))).cast("long")
        ).alias("el_tp"),
        F.sum(p_in.cast("long")).alias("n_p"),
        F.sum(g_in.cast("long")).alias("n_g"),
        F.sum((~aligned & (g_in | p_in)).cast("long")).alias("n_unaligned_entities"),
    )

    def prf(tp, fp, fn, prefix):
        prec = tp / F.greatest(tp + fp, F.lit(1))
        rec = tp / F.greatest(tp + fn, F.lit(1))
        f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(F.lit(0.0))
        return [
            prec.alias(f"{prefix}_precision"),
            rec.alias(f"{prefix}_recall"),
            f1.alias(f"{prefix}_f1"),
        ]

    md_tp, md_fp, md_fn = F.col("md_tp"), F.col("md_fp"), F.col("md_fn")
    el_tp = F.col("el_tp")
    el_fp = F.col("n_p") - el_tp
    el_fn = F.col("n_g") - el_tp
    return agg.select(
        "md_tp", "md_fp", "md_fn",
        *prf(md_tp, md_fp, md_fn, "md"),
        el_tp.alias("el_tp"),
        el_fp.alias("el_fp"),
        el_fn.alias("el_fn"),
        *prf(el_tp, el_fp, el_fn, "el"),
        "n_unaligned_entities",
    )


def span_metric_counts(gold: DataFrame, pred: DataFrame, match_entity: bool = True) -> DataFrame:
    """J7/A5: micro MD/EL counters — |g∩p| via inner join + one agg
    (reference: src/spel/decao_eval.py:1185-1202)."""
    keys = ["doc_id", "begin", "end"] + (["entity"] if match_entity else [])
    tp = gold.join(pred, keys, "inner").count()
    n_gold = gold.count()
    n_pred = pred.count()
    spark = gold.sparkSession
    prec = tp / max(n_pred, 1)
    rec = tp / max(n_gold, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-12)
    return spark.createDataFrame(
        [(tp, n_pred, n_gold, prec, rec, f1)],
        "tp long, n_pred long, n_gold long, precision double, recall double, f1 double",
    )


def candidate_filter(
    predictions: DataFrame, candidate_sets: DataFrame, null_entity: int = 0
) -> DataFrame:
    """J8: restrict predictions to the mention's candidate allow-list; a
    prediction outside it falls back to the null entity (reference:
    src/spel/candidate_manager.py:76-103).

    predictions: (block_key, entity_id, ...); candidate_sets:
    (block_key, entity_id) allow-list.
    """
    # rename BOTH allow-list columns before the join: when candidate_sets
    # derives from predictions (same lineage), df["col"] references resolve
    # ambiguously and drop() can keep the null-filled side (observed: all
    # non-allowed rows got block_key NULL)
    allowed = candidate_sets.select(
        F.col("block_key").alias("_allow_key"),
        F.col("entity_id").alias("allowed_entity"),
    ).distinct()
    return (
        predictions.join(
            F.broadcast(allowed),
            (predictions["block_key"] == F.col("_allow_key"))
            & (predictions["entity_id"] == F.col("allowed_entity")),
            "left",
        )
        .withColumn(
            "entity_id",
            F.when(F.col("allowed_entity").isNotNull(), F.col("entity_id")).otherwise(
                F.lit(null_entity)
            ),
        )
        .drop("_allow_key", "allowed_entity")
    )


def candidate_rerank(
    predictions: DataFrame,
    candidate_sets: DataFrame,
    null_entity: int = 0,
) -> DataFrame:
    """J8 FULL semantics: re-resolve to the best allowed alternative.

    ``candidate_filter`` above nulls disallowed predictions; the
    reference is richer (src/spel/candidate_manager.py:76-103):

    * an already-null prediction passes through (:83-84);
    * a mention with NO candidate list (or an empty one) resolves to the
      null entity (:86-88);
    * otherwise the prediction's own rank-ordered alternative list is
      filtered to the allow-set and the BEST surviving alternative wins
      (:99-103, ``sorted(..., reverse=True)[0]``); none surviving -> null.

    predictions: (..., block_key, entity_id,
    alternatives ARRAY<STRUCT<entity_id INT, p DOUBLE>>) with
    ``alternatives`` rank-ordered best-first (the reference's
    all_possible_annotations contract, span_annotation.py:26-30; stable
    ties keep list order, exactly like Python's stable sort).

    Zero-shuffle: the allow-lists aggregate to one array per block key
    and broadcast; selection is an array filter — no explode, no
    per-row Python.
    """
    allow_sets = candidate_sets.groupBy("block_key").agg(
        F.array_distinct(F.collect_list("entity_id")).alias("_allow")
    )
    surviving = F.filter(
        F.col("alternatives"),
        lambda a: F.array_contains(F.col("_allow"), a["entity_id"]),
    )
    new_entity = (
        F.when(F.col("entity_id") == null_entity, F.col("entity_id"))
        .when(F.col("_allow").isNull() | (F.size("_allow") == 0), F.lit(null_entity))
        .when(F.size(surviving) > 0, surviving.getItem(0)["entity_id"])
        .otherwise(F.lit(null_entity))
    )
    return (
        predictions.join(F.broadcast(allow_sets), "block_key", "left")
        .withColumn("entity_id", new_entity)
        .drop("_allow")
    )


def softmax_over_window(df: DataFrame, value_col: str, part_cols: list[str]) -> DataFrame:
    """X7: numerically-stable softmax of a column within a partition —
    exp(x - max) / sum(exp(x - max)) via window aggregates (the reference
    softmaxes logits per token, src/spel/model.py:54,179)."""
    w = Window.partitionBy(*part_cols)
    shifted = F.exp(F.col(value_col) - F.max(value_col).over(w))
    return df.withColumn("_e", shifted).withColumn(
        "softmax", F.col("_e") / F.sum("_e").over(w)
    ).drop("_e")
