"""Pairwise string/set/vector similarity kernels.

The reference scores mention-entity affinity with a neural head
(reference: src/spel/model.py:169-192, hidden·outᵀ matmul).  This engine
replaces it with classical record-linkage similarities (SURVEY.md §2.8
X11-X14), JVM-side builtins wherever Spark has one:

* token-set Jaccard           — pure builtins (X13)
* character k-shingles        — pure builtins (X11)
* Levenshtein similarity      — ``F.levenshtein`` builtin
* Jaro-Winkler                — Arrow-batched pandas UDF (X12; Spark has
                                no builtin; rapidfuzz absent from image)
* hashing-trick n-gram cosine — pure builtins via xxhash64 buckets (X14)
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --------------------------------------------------------------------------
# JVM-side kernels (whole-stage codegen / HOFs; zero Python)
# --------------------------------------------------------------------------

def tokens_col(col: Column) -> Column:
    """Whitespace tokens of a normalized surface."""
    return F.split(col, " ")


def token_jaccard(a: Column, b: Column) -> Column:
    """|A∩B| / |A∪B| over whitespace token sets (SURVEY X13)."""
    ta, tb = F.array_distinct(tokens_col(a)), F.array_distinct(tokens_col(b))
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(F.array_union(ta, tb))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def shingles_col(col: Column, k: int = 3) -> Column:
    """Distinct character k-grams via transform(sequence(...)) — no UDF (X11).

    Strings shorter than k yield the whole (padded-by-truncation) string as
    a single shingle.
    """
    n = F.length(col)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substr(col, i, F.lit(k))))


def array_jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def levenshtein_sim(a: Column, b: Column) -> Column:
    """1 - lev(a,b)/max(|a|,|b|) — JVM builtin edit distance."""
    mx = F.greatest(F.length(a), F.length(b))
    return F.when(mx > 0, 1.0 - F.levenshtein(a, b) / mx).otherwise(F.lit(1.0))


def _hashed_vec(col: Column, k: int, buckets: int) -> Column:
    """Signed hashing-trick vector of shingle counts (dim = buckets)."""
    entries = F.transform(
        shingles_col(col, k),
        lambda s: F.struct(
            F.pmod(F.xxhash64(s, F.lit(42)), F.lit(buckets)).alias("b"),
            F.when(F.pmod(F.xxhash64(s, F.lit(43)), F.lit(2)) == 0, F.lit(1.0))
            .otherwise(F.lit(-1.0))
            .alias("v"),
        ),
    )
    zero = F.array_repeat(F.lit(0.0).cast("double"), buckets)
    return F.aggregate(
        entries,
        zero,
        lambda acc, x: F.transform(
            acc, lambda a, i: F.when(i.cast("long") == x["b"], a + x["v"]).otherwise(a)
        ),
    )


def hashed_ngram_cosine(a: Column, b: Column, k: int = 3, buckets: int = 64) -> Column:
    """Mean-pooled hashing-trick n-gram cosine, all JVM-side (X14).

    Deterministic (xxhash64, fixed seeds 42/43) — the no-model stand-in for
    embedding cosine; the same zip_with/aggregate dot-product kernel serves
    real ``array<float>`` embedding columns (operators/ann.py).
    """
    va, vb = _hashed_vec(a, k, buckets), _hashed_vec(b, k, buckets)
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0).cast("double"), lambda s, x: s + x
    )
    na = F.sqrt(F.aggregate(va, F.lit(0.0).cast("double"), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(vb, F.lit(0.0).cast("double"), lambda s, x: s + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine of two array<float|double> columns — zip_with/aggregate, no UDF."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0).cast("double"), lambda s, x: s + x
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0).cast("double"), lambda s, x: s + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


# --------------------------------------------------------------------------
# Jaro-Winkler — Arrow-batched pandas UDF (the only Python scorer kernel)
# --------------------------------------------------------------------------

def _jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    f1 = [False] * l1
    f2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        lo = i - window if i > window else 0
        hi = i + window + 1
        if hi > l2:
            hi = l2
        for j in range(lo, hi):
            if not f2[j] and s2[j] == c:
                f1[i] = True
                f2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(l1):
        if f1[i]:
            while not f2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    return (m / l1 + m / l2 + (m - t) / m) / 3.0


def jaro_winkler_py(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Pure-Python Jaro-Winkler (standard definition, prefix cap 4)."""
    j = _jaro(s1, s2)
    if j > 0.7:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        j += prefix * prefix_weight * (1.0 - j)
    return j


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched JW — vectorized transfer, C-level string inner loop.

    Runs only on the (deduplicated, blocked) candidate-pair table, never on
    raw turns, so volume is bounded by distinct-surface pairs — the same
    containment the reference gets from candidate sets
    (src/spel/candidate_manager.py:76-103).
    """
    return pd.Series(
        [jaro_winkler_py(x, y) if isinstance(x, str) and isinstance(y, str) else 0.0
         for x, y in zip(a, b)],
        dtype="float64",
    )
