"""Punctuation-aware token splitting with exact char offsets (F2).

The reference splits leading/trailing punctuation runs off each
whitespace word into separate tokens and splits a trailing possessive
's/'S from punctuation-free words (reference: src/spel/utils.py:22-59,
``get_punc_tokenized_words_list``).  That implementation destroys offsets;
this one EMITS (token, begin_char, end_char) so downstream span work can
slice the original text (the round-1 gap: the normalizer collapsed
punctuation instead of splitting it).

Zero-shuffle: word offsets are in-row aggregate prefix sums (same idiom
as operators/mentions.py); sub-token splitting is pure regexp arithmetic;
one flatten + posexplode emits the global token index.

Branch semantics preserved exactly:
* word bounded by non-punctuation on BOTH ends -> kept whole, except a
  trailing 's/'S which becomes its own token;
* otherwise -> up to three tokens: leading punct run, core, trailing
  punct run (the possessive split does NOT apply in this branch —
  utils.py:36-56 keeps the core intact);
* an all-punctuation word is consumed entirely by the leading run.
"""

from __future__ import annotations

import re
import string

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# string.punctuation as a regex char class (4 contiguous ascii ranges)
_PUNCT_CLASS = r"[!-/:-@\[-`{-~]"

TOKEN_STRUCT = "struct<tok:string,begin:int,end:int>"


def _subtokens(word: Column, begin: Column) -> Column:
    """array<struct<tok,begin,end>> for one whitespace word."""
    n = F.length(word)
    end = begin + n
    lstripped = F.regexp_replace(word, f"^{_PUNCT_CLASS}+", "")
    nb = n - F.length(lstripped)
    core = F.regexp_replace(lstripped, f"{_PUNCT_CLASS}+$", "")
    na = F.length(lstripped) - F.length(core)

    def tok(t, b, e):
        return F.struct(
            t.alias("tok"), b.cast("int").alias("begin"), e.cast("int").alias("end")
        )

    clean = (nb == 0) & (na == 0)
    poss = clean & (F.endswith(word, F.lit("'s")) | F.endswith(word, F.lit("'S")))
    possessive_arr = F.array(
        tok(F.substring(word, 1, n - 2), begin, end - 2),
        tok(F.substring(word, n - 1, 2), end - 2, end),
    )
    clean_arr = F.array(tok(word, begin, end))
    split_arr = F.filter(
        F.array(
            tok(F.substring(word, 1, nb), begin, begin + nb),
            tok(core, begin + nb, end - na),
            tok(F.substring(word, n - na + 1, na), end - na, end),
        ),
        lambda t: F.length(t["tok"]) > 0,
    )
    return F.when(poss, possessive_arr).when(clean, clean_arr).otherwise(split_arr)


def punct_tokenize(
    df: DataFrame, text_col: str = "text", id_cols: tuple = ("conv_id", "turn_idx")
) -> DataFrame:
    """One row per token: (*id_cols, token_idx, tok, begin_char, end_char).

    Narrow map (no shuffle); the round-trip invariant
    ``substring(text, begin_char+1, end_char-begin_char) == tok`` holds for
    every emitted token.
    """
    words = F.split(F.col(text_col), " ")
    begins = F.aggregate(
        words,
        F.struct(
            F.lit(0).cast("int").alias("pos"),
            F.array().cast("array<int>").alias("begins"),
        ),
        lambda acc, w: F.struct(
            (acc["pos"] + F.length(w) + 1).cast("int").alias("pos"),
            F.concat(acc["begins"], F.array(acc["pos"])).alias("begins"),
        ),
        lambda acc: acc["begins"],
    )
    toks = F.flatten(
        F.transform(
            F.filter(
                F.arrays_zip(words.alias("w"), begins.alias("b")),
                lambda z: F.length(z["w"]) > 0,
            ),
            lambda z: _subtokens(z["w"], z["b"]),
        )
    )
    return df.select(
        *id_cols, F.posexplode(toks).alias("token_idx", "t")
    ).select(
        *id_cols,
        "token_idx",
        F.col("t.tok").alias("tok"),
        F.col("t.begin").alias("begin_char"),
        F.col("t.end").alias("end_char"),
    )


# pure-Python twin (reference-faithful, plus offsets) for tests
_P = set(string.punctuation)


def punct_tokenize_py(text: str) -> list[tuple[str, int, int]]:
    out: list[tuple[str, int, int]] = []
    pos = 0
    for w in text.split(" "):
        b, e = pos, pos + len(w)
        pos = e + 1
        if not w:
            continue
        if w[0] not in _P and w[-1] not in _P:
            if w.endswith("'s") or w.endswith("'S"):
                out.append((w[:-2], b, e - 2))
                out.append((w[-2:], e - 2, e))
            else:
                out.append((w, b, e))
            continue
        m = re.match(r"^([!-/:-@\[-`{-~]*)(.*?)([!-/:-@\[-`{-~]*)$", w)
        lead, core, trail = m.group(1), m.group(2), m.group(3)
        if lead:
            out.append((lead, b, b + len(lead)))
        if core:
            out.append((core, b + len(lead), e - len(trail)))
        if trail:
            out.append((trail, e - len(trail), e))
    return out
