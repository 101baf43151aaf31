"""Surface-form normalization — the engine's alias/identity kernel.

Analogue of the reference's mention postprocessing + unicode table +
canonical-redirect normalization (reference: src/spel/utils.py:140-171
boundary trim & possessive strip; src/spel/utils.py:254-277 unicode
substitutions; src/spel/span_annotation.py:44-46 mojibake fixes;
src/spel/candidate_manager.py:61 lower/underscore normalization;
src/spel/configuration.py:39-53 redirects).

Three implementations that MUST agree byte-for-byte (tested in
tests/test_normalize.py, including non-ASCII inputs):

* :func:`norm_surface_col` — pure Spark column expression (JVM-side,
  whole-stage codegen; zero Python on the hot path);
* :func:`norm_surface_py` — pure-Python twin used by the deterministic
  data generator and tests;
* :func:`norm_surface_sql` — the same chain as a DuckDB SQL snippet for
  the oracle queries.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# 1:1 unicode fold table — behavioral parity with the reference's Moses
# normalization (src/spel/utils.py:254-277): curly quotes/dashes -> ascii,
# ellipsis/bullet -> '.', common accents -> base letter, NBSP/BOM -> space,
# Euro -> 'E', the AIDA-specific CJK name characters -> space; plus ascii
# folds for the accents produced by the mojibake fixes below.  The
# reference's '\n' -> 'Ċ' entry is a Moses tokenizer artifact and is
# deliberately not reproduced (newlines fall to the non-alnum strip).
_UNI_PAIRS = [
    ("‘", "'"), ("’", "'"), ("“", '"'), ("”", '"'),
    ("„", '"'), ("–", "-"), ("—", "-"), ("…", "."),
    ("•", "."), (" ", " "), ("﻿", " "), ("€", "E"),
    ("ö", "o"), ("á", "a"), ("è", "e"), ("É", "E"),
    ("ō", "o"), ("ș", "s"), ("ć", "c"), ("ž", "z"),
    ("č", "c"), ("é", "e"), ("ü", "u"), ("í", "i"),
    # AIDA CJK name characters the reference blanks (utils.py:256-258)
    ("楊", " "), ("鈴", " "), ("林", " "), ("昶", " "),
    ("佐", " "), ("王", " "), ("宜", " "), ("正", " "),
    ("全", " "), ("勝", " "), ("胡", " "), ("志", " "),
    ("博", " "), ("陳", " "), ("美", " "),
]
_UNI_SRC = "".join(k for k, _ in _UNI_PAIRS)
_UNI_DST = "".join(v for _, v in _UNI_PAIRS)

# multi-char mojibake fixes (reference: src/spel/span_annotation.py:44-46)
# — must run BEFORE the 1:1 fold so e.g. 'Ã©' -> 'é' -> 'e'
_MOJIBAKE = [
    ("Â£", "£"),          # Â£ -> £
    ("âĦ¢", "™"),    # âĦ¢ -> ™
    ("Ã¼", "ü"),          # Ã¼ -> ü
    ("Ã©", "é"),          # Ã© -> é
    ("ÃŃ", "í"),          # ÃŃ -> í
]


def fold_unicode_col(col: Column) -> Column:
    """X2/X3: mojibake repair + 1:1 unicode fold, all JVM-side builtins."""
    c = col
    for src, dst in _MOJIBAKE:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return F.translate(c, _UNI_SRC, _UNI_DST)


def norm_surface_col(col: Column) -> Column:
    """Normalized surface key as a Spark column expression.

    Steps: mojibake fix -> unicode fold -> lowercase -> strip possessive
    's -> underscores to spaces -> strip non-alphanumerics -> collapse
    whitespace -> trim.

    Documented deviation (consecutive possessives): the capture form
    ``'s([^a-z0-9_]|$)`` CONSUMES the boundary character, so a global
    replace skips overlapping matches — "bob's's" normalizes to "bob s"
    here (all three twins agree) where the reference's ``'s\\b`` would
    give "bob".  Nested possessives don't occur in entity surfaces; the
    capture form is kept because it is the only spelling with ONE
    behavior across Java regex / RE2 / Python re (see boundary note
    below).
    """
    c = fold_unicode_col(col)
    c = F.lower(c)
    # explicit ASCII boundary class instead of \b: Java regex \b here is
    # unicode-aware while RE2 (DuckDB) and re.ASCII (Python twin) are not —
    # "bob'sñx" would normalize three different ways.  After lower() the
    # only word chars are [a-z0-9_], so 's([^a-z0-9_]|$) == ASCII 's\b.
    c = F.regexp_replace(c, r"'s([^a-z0-9_]|$)", "$1")
    c = F.regexp_replace(c, r"_+", " ")
    c = F.regexp_replace(c, r"[^a-z0-9 ]+", " ")
    c = F.regexp_replace(c, r" +", " ")
    return F.trim(c)


_UNI_TABLE = str.maketrans(_UNI_SRC, _UNI_DST)
# explicit ASCII boundary (see norm_surface_col): \b is unicode-aware in
# Python and Java but ASCII in RE2 — the capture form means one behavior
_RE_POSS = re.compile(r"'s([^a-z0-9_]|$)")
_RE_UND = re.compile(r"_+")
_RE_NONALNUM = re.compile(r"[^a-z0-9 ]+")
_RE_WS = re.compile(r" +")


def fold_unicode_py(s: str) -> str:
    """Pure-Python twin of :func:`fold_unicode_col`."""
    for src, dst in _MOJIBAKE:
        s = s.replace(src, dst)
    return s.translate(_UNI_TABLE)


def norm_surface_py(s: str) -> str:
    """Pure-Python twin of :func:`norm_surface_col` (same steps, same order)."""
    c = fold_unicode_py(s)
    c = c.lower()
    c = _RE_POSS.sub(r"\1", c)
    c = _RE_UND.sub(" ", c)
    c = _RE_NONALNUM.sub(" ", c)
    c = _RE_WS.sub(" ", c)
    return c.strip()


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def norm_surface_sql(expr: str) -> str:
    """The same chain as a DuckDB SQL snippet (oracle twin).

    Includes the mojibake + unicode-fold steps so the twins stay
    byte-identical on non-ASCII input (round-1 divergence: the SQL twin
    skipped the fold, and parity held only because TPC-H p_name is ASCII).
    """
    folded = expr
    for src, dst in _MOJIBAKE:
        folded = f"replace({folded}, {_sql_str(src)}, {_sql_str(dst)})"
    folded = f"translate({folded}, {_sql_str(_UNI_SRC)}, {_sql_str(_UNI_DST)})"
    return (
        "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"lower({folded}), '''s([^a-z0-9_]|$)', '\\1', 'g'), '_+', ' ', 'g'), "
        "'[^a-z0-9 ]+', ' ', 'g'), ' +', ' ', 'g'))"
    )


def unicode_unescape_udf():
    """X4: YAGO-style unicode-escape decode (reference: src/spel/utils.py:
    190 — ``s.encode('ascii').decode('unicode-escape')``) as an
    Arrow-batched pandas UDF; Spark has no builtin for \\uXXXX unescaping.

    Non-ascii-encodable or malformed inputs pass through unchanged (the
    reference only ever feeds it YAGO identifiers, which are ascii).

    NOTE: ``from __future__ import annotations`` stringifies type hints,
    and pyspark resolves them via get_type_hints against the *defining*
    module's globals — so the ``pd.Series -> pd.Series`` hints must be
    spelled as real (non-local) names.  We build the UDF without hints
    and pass the eval type explicitly instead."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.functions import PandasUDFType

    def _kernel(s):
        def dec(x):
            if not isinstance(x, str):
                return x
            try:
                return x.encode("ascii").decode("unicode-escape")
            except (UnicodeEncodeError, UnicodeDecodeError):
                return x

        return s.map(dec)

    return F.pandas_udf(_kernel, T.StringType(), PandasUDFType.SCALAR)
