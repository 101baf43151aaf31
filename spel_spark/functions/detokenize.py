"""Moses-style English detokenization (X2) as a pure Spark expression.

The reference renders each phrase's ``word_string`` through
``MosesDetokenizer('en')`` (src/spel/span_annotation.py:5-6,44-46) — the
``mosestokenizer`` wrapper around Moses ``detokenizer.perl``.  This module
re-expresses the detokenizer's English rules as ONE ``F.aggregate`` over
the word array — JVM-side, no UDF:

* attach-LEFT tokens join without a preceding space: closing punctuation
  (``. , ! ? : ; % ) ] }``), apostrophe contractions (any ``'`` +
  letters: ``'s 'll 'd 'em …`` — the perl rule is ``^'[[:alpha:]]`` —
  plus PTB's ``n't``), and closing quotes;
* attach-RIGHT tokens suppress the following space: opening brackets,
  currency signs, Spanish inverted marks (``( [ { $ £ € ¿ ¡``) and
  opening quotes;
* quotes alternate open/close by PER-FAMILY parity, exactly like the
  perl ``$quoteCount`` state: the double-quote family is ``"``, PTB
  ``````/``''`` and the curly/low marks ``“ ” „``;
  the single-quote family is a lone ``'``, backtick and curly
  ``‘ ’`` — except the English possessive: a lone ``'`` after a word
  ending in ``s`` attaches left WITHOUT counting toward quote parity
  (detokenizer.perl's ``$words[$i-1] =~ /[s]$/`` special case before
  its $quoteCount branch: "the Jones ' house" -> "the Jones' house").

Non-breaking prefixes (``Mr.``, ``U.S.`` …) are deliberately NOT a rule
here: they exist only in the Moses TOKENIZER (deciding whether a period
ends a sentence); ``detokenizer.perl`` has no prefix table — abbreviation
periods either arrive glued to their token (``Mr.`` is one token, passes
through) or as a lone ``.`` (attach-left rule).  The tests pin both
shapes.  Mojibake repair is a separate pre-pass:
normalize.fold_unicode_col mirrors the reference's inline ``.replace``
chain (span_annotation.py:45-46).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_ATTACH_LEFT_RE = r"^[\.,!\?:;%\)\]\}]+$"
_CONTRACTION_RE = r"^'[A-Za-z]+$"  # perl: ^'[[:alpha:]] (English branch)
_NT = ["n't", "N'T", "N't"]
_ATTACH_RIGHT_RE = "^[\\(\\[\\{\\$£€¿¡]$"
# quote families, normalized like detokenizer.perl's $normalized_quo
_DQ = ['"', "``", "''", "“", "”", "„"]
_SQ = ["'", "`", "‘", "’"]


def moses_detokenize_col(words: Column) -> Column:
    """array<string> of tokens -> one detokenized string (Moses EN core)."""
    init = F.struct(
        F.lit("").alias("text"),
        F.lit(True).alias("no_space"),  # no leading space before the first word
        F.lit(0).alias("dq"),
        F.lit(0).alias("sq"),
        F.lit("").alias("prev"),  # previous token (possessive rule)
    )

    def step(acc, w):
        is_dq = w.isin(_DQ)
        possessive = (w == "'") & acc["prev"].rlike("[sS]$")
        is_sq = w.isin(_SQ) & ~possessive  # possessive ' skips quote parity
        dq_open = is_dq & (F.pmod(acc["dq"], F.lit(2)) == 0)
        sq_open = is_sq & (F.pmod(acc["sq"], F.lit(2)) == 0)
        attach_left = (
            w.rlike(_ATTACH_LEFT_RE)
            | (w.rlike(_CONTRACTION_RE) & ~is_sq)
            | w.isin(_NT)
            | possessive
            | (is_dq & ~dq_open)
            | (is_sq & ~sq_open)
        )
        glue = attach_left | acc["no_space"]
        new_text = F.when(glue, F.concat(acc["text"], w)).otherwise(
            F.concat(acc["text"], F.lit(" "), w)
        )
        new_no_space = w.rlike(_ATTACH_RIGHT_RE) | dq_open | sq_open
        return F.struct(
            new_text.alias("text"),
            new_no_space.alias("no_space"),
            (acc["dq"] + is_dq.cast("int")).alias("dq"),
            (acc["sq"] + is_sq.cast("int")).alias("sq"),
            w.alias("prev"),
        )

    return F.aggregate(words, init, step, lambda acc: acc["text"])


# --------------------------------------------------------------------------
# pure-Python twin (same rules, for tests and driver-side use)
# --------------------------------------------------------------------------

_PY_LEFT = re.compile(_ATTACH_LEFT_RE)
_PY_CONTR = re.compile(_CONTRACTION_RE)
_PY_RIGHT = re.compile(_ATTACH_RIGHT_RE)
_PY_NT = set(_NT)
_PY_DQ = set(_DQ)
_PY_SQ = set(_SQ)


def moses_detokenize_py(words: list[str]) -> str:
    text = ""
    no_space = True
    dq = sq = 0
    prev = ""
    for w in words:
        is_dq = w in _PY_DQ
        possessive = w == "'" and bool(prev) and prev[-1] in "sS"
        is_sq = w in _PY_SQ and not possessive
        dq_open = is_dq and dq % 2 == 0
        sq_open = is_sq and sq % 2 == 0
        attach_left = (
            bool(_PY_LEFT.match(w))
            or (bool(_PY_CONTR.match(w)) and not is_sq)
            or w in _PY_NT
            or possessive
            or (is_dq and not dq_open)
            or (is_sq and not sq_open)
        )
        text += w if (attach_left or no_space) else " " + w
        no_space = bool(_PY_RIGHT.match(w)) or dq_open or sq_open
        dq += int(is_dq)
        sq += int(is_sq)
        prev = w
    return text
