"""Moses-style English detokenization (X2) as a pure Spark expression.

The reference renders each phrase's ``word_string`` through
``MosesDetokenizer('en')`` (src/spel/span_annotation.py:5-6,44-46) after a
mojibake repair.  This module re-expresses the detokenizer's core English
rules as ONE ``F.aggregate`` over the word array — JVM-side, no UDF:

* attach-LEFT tokens join without a preceding space: closing punctuation
  (``. , ! ? : ; % ) ] }``), contraction suffixes (``'s 'm 're 've 'll
  'd n't``), and closing double quotes;
* attach-RIGHT tokens suppress the following space: opening brackets and
  currency signs (``( [ { $ £ €``) and opening double quotes;
* double quotes alternate open/close by count, exactly like Moses'
  quote-parity state.

Scope (documented): this is the deterministic core of Moses EN — the
long tail (multi-char quote styles, language-specific aposthrophe
splitting, non-breaking prefixes) is out of scope; surfaces that hit it
still compare correctly at evaluation time because span alignment is
space-insensitive (spans.span_align_resegment, ref utils.py:436-438).
Mojibake repair is a separate pre-pass: normalize.fold_unicode_col
mirrors the reference's inline ``.replace`` chain.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_ATTACH_LEFT_RE = r"^[\.,!\?:;%\)\]\}]+$"
_CONTRACTIONS = [
    "'s", "'S", "'m", "'M", "'re", "'RE", "'ve", "'VE",
    "'ll", "'LL", "'d", "'D", "n't", "N'T",
]
_ATTACH_RIGHT_RE = r"^[\(\[\{\$£€]$"


def moses_detokenize_col(words: Column) -> Column:
    """array<string> of tokens -> one detokenized string (Moses EN core)."""
    init = F.struct(
        F.lit("").alias("text"),
        F.lit(True).alias("no_space"),  # no leading space before the first word
        F.lit(0).alias("quotes"),
    )

    def step(acc, w):
        is_quote = w == '"'
        quote_open = is_quote & (F.pmod(acc["quotes"], F.lit(2)) == 0)
        attach_left = (
            w.rlike(_ATTACH_LEFT_RE) | w.isin(_CONTRACTIONS) | (is_quote & ~quote_open)
        )
        glue = attach_left | acc["no_space"]
        new_text = F.when(glue, F.concat(acc["text"], w)).otherwise(
            F.concat(acc["text"], F.lit(" "), w)
        )
        new_no_space = w.rlike(_ATTACH_RIGHT_RE) | quote_open
        return F.struct(
            new_text.alias("text"),
            new_no_space.alias("no_space"),
            (acc["quotes"] + is_quote.cast("int")).alias("quotes"),
        )

    return F.aggregate(words, init, step, lambda acc: acc["text"])


# --------------------------------------------------------------------------
# pure-Python twin (same rules, for tests and driver-side use)
# --------------------------------------------------------------------------

_PY_LEFT = re.compile(_ATTACH_LEFT_RE)
_PY_RIGHT = re.compile(_ATTACH_RIGHT_RE)
_PY_CONTRACTIONS = set(_CONTRACTIONS)


def moses_detokenize_py(words: list[str]) -> str:
    text = ""
    no_space = True
    quotes = 0
    for w in words:
        is_quote = w == '"'
        quote_open = is_quote and quotes % 2 == 0
        attach_left = (
            bool(_PY_LEFT.match(w))
            or w in _PY_CONTRACTIONS
            or (is_quote and not quote_open)
        )
        text += w if (attach_left or no_space) else " " + w
        no_space = bool(_PY_RIGHT.match(w)) or quote_open
        quotes += int(is_quote)
    return text
