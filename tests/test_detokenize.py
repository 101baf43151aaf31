"""Moses-EN core detokenizer (X2): hand cases mirroring MosesDetokenizer
behavior (ref span_annotation.py:44-46), Spark expression == Python twin."""

import random

from pyspark.sql import functions as F

from spel_spark.functions.detokenize import moses_detokenize_col, moses_detokenize_py

CASES = [
    (["Hello", ",", "world", "!"], "Hello, world!"),
    (["He", "said", '"', "hi", '"', "."], 'He said "hi".'),
    (["(", "a", ")"], "(a)"),
    (["it", "'s", "fine"], "it's fine"),
    (["do", "n't", "stop"], "don't stop"),
    (["$", "5", "bill"], "$5 bill"),
    (["a", ":", "b", ";", "c"], "a: b; c"),
    (["50", "%", "done"], "50% done"),
    (["we", "'ll", "see", "..."], "we'll see..."),
    (["[", "sic", "]", ","], "[sic],"),
    ([], ""),
    (["one"], "one"),
    (['"', "a", '"', '"', "b", '"'], '"a" "b"'),  # quote parity resets
    # ---- long-tail rules (round-3 verdict #6) ----
    # PTB multi-char quotes: `` opens, '' closes
    (["``", "quoted", "''", "here"], "``quoted'' here"),
    (["he", "said", "``", "go", "''", "."], "he said ``go''."),
    # unicode curly quotes, double and single families independent
    (["“", "a", "”", "and", "‘", "b", "’"], "“a” and ‘b’"),
    # low-9 German-style opening counts in the double family
    (["„", "zitat", "”"], "„zitat”"),
    # lone straight single quote alternates by parity
    (["'", "a", "'", "'", "b", "'"], "'a' 'b'"),
    # generalized apostrophe contractions (perl ^'[[:alpha:]])
    (["they", "'d", "go"], "they'd go"),
    (["rock", "'em", "hard"], "rock'em hard"),
    (["'Twas", "night"], "'Twas night"),  # sentence-initial: no_space glue
    # Spanish inverted marks attach right
    (["¿", "qué", "?"], "¿qué?"),
    (["¡", "hola", "!"], "¡hola!"),
    # abbreviation periods: glued tokens pass through, lone '.' attaches
    (["Mr.", "Smith", "of", "U.S."], "Mr. Smith of U.S."),
    (["etc", ".", "and", "so", "on"], "etc. and so on"),
    # families don't interfere: ' inside "..." stays a contraction
    (['"', "it", "'s", "ok", '"'], '"it\'s ok"'),
    # EN possessive: lone ' after s-final word attaches left and does NOT
    # count toward single-quote parity (detokenizer.perl special case)
    (["the", "Jones", "'", "house"], "the Jones' house"),
    (["Jones", "'", "then", "'", "q", "'"], "Jones' then 'q'"),
]


def test_python_twin_hand_cases():
    for words, want in CASES:
        assert moses_detokenize_py(words) == want, words


def test_spark_matches_python_twin(spark):
    rng = random.Random(3)
    vocab = ["word", ",", ".", '"', "(", ")", "'s", "n't", "$", "x", "!", "?",
             "``", "''", "“", "”", "'", "‘", "’", "`", "„", "¿", "'em", "Mr.",
             "Jones", "cats"]
    seqs = [w for w, _ in CASES] + [
        [rng.choice(vocab) for _ in range(rng.randint(0, 12))] for _ in range(200)
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(seqs)],
                               "id int, words array<string>")
    got = {
        r.id: r.out
        for r in df.select("id", moses_detokenize_col(F.col("words")).alias("out")).collect()
    }
    for i, s in enumerate(seqs):
        assert got[i] == moses_detokenize_py(s), s


def test_phrases_detokenized_end_to_end(spark):
    """phrases_from_annotations(detokenize=True): the possessive-split
    tokens render back as the reference's PhraseAnnotation.word_string."""
    from spel_spark.operators.spans import phrases_from_annotations

    rows = [
        # doc, word_idx, annotation, begin, end, word, confidence
        (1, 0, 7, 0, 6, "kamora", 0.9),
        (1, 1, 7, 6, 8, "'s", 0.9),
        (1, 2, 7, 9, 15, "ledger", 0.9),
        (1, 3, 0, 16, 17, ",", 0.5),
        (1, 4, 0, 18, 21, "see", 0.5),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id int, word_idx int, resolved_annotation int, "
        "begin_char int, end_char int, word string, confidence double",
    )
    out = {r.resolved_annotation: r.phrase
           for r in phrases_from_annotations(df, detokenize=True).collect()}
    assert out[7] == "kamora's ledger"
    assert out[0] == ", see"
    # default stays the byte-round-trip space join
    plain = {r.resolved_annotation: r.phrase
             for r in phrases_from_annotations(df).collect()}
    assert plain[7] == "kamora 's ledger"
