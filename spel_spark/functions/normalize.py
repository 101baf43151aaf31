"""Surface-form normalization — the engine's alias/identity kernel.

Analogue of the reference's mention postprocessing + unicode table +
canonical-redirect normalization (reference: src/spel/utils.py:140-171
boundary trim & possessive strip; src/spel/utils.py:254-277 unicode
substitutions; src/spel/candidate_manager.py:61 lower/underscore
normalization; src/spel/configuration.py:39-53 redirects).

Two implementations that MUST agree byte-for-byte (tested in
tests/test_normalize.py):

* :func:`norm_surface_col` — pure Spark column expression (JVM-side,
  whole-stage codegen; zero Python on the hot path);
* :func:`norm_surface_py` — pure-Python twin used by the deterministic
  data generator and by oracle SQL construction.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# unicode codepoints the reference folds to ascii (utils.py:254-277 keeps a
# 40+ entry table; we normalize the subset our corpus can contain)
_UNI_SRC = "’‘“”–— "
_UNI_DST = "''\"\"--" + " "


def norm_surface_col(col: Column) -> Column:
    """Normalized surface key as a Spark column expression.

    Steps: unicode fold -> lowercase -> strip possessive 's -> underscores
    to spaces -> strip non-alphanumerics -> collapse whitespace -> trim.
    """
    c = F.translate(col, _UNI_SRC, _UNI_DST)
    c = F.lower(c)
    c = F.regexp_replace(c, r"'s\b", "")
    c = F.regexp_replace(c, r"_+", " ")
    c = F.regexp_replace(c, r"[^a-z0-9 ]+", " ")
    c = F.regexp_replace(c, r" +", " ")
    return F.trim(c)


_UNI_TABLE = str.maketrans(_UNI_SRC, _UNI_DST)
_RE_POSS = re.compile(r"'s\b")
_RE_UND = re.compile(r"_+")
_RE_NONALNUM = re.compile(r"[^a-z0-9 ]+")
_RE_WS = re.compile(r" +")


def norm_surface_py(s: str) -> str:
    """Pure-Python twin of :func:`norm_surface_col` (same steps, same order)."""
    c = s.translate(_UNI_TABLE)
    c = c.lower()
    c = _RE_POSS.sub("", c)
    c = _RE_UND.sub(" ", c)
    c = _RE_NONALNUM.sub(" ", c)
    c = _RE_WS.sub(" ", c)
    return c.strip()


# the same normalization as a SQL snippet (ANSI-ish; used to build DuckDB
# oracle queries so Spark and the oracle share one definition)
def norm_surface_sql(expr: str) -> str:
    return (
        "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"lower({expr}), '''s\\b', '', 'g'), '_+', ' ', 'g'), "
        "'[^a-z0-9 ]+', ' ', 'g'), ' +', ' ', 'g'))"
    )
