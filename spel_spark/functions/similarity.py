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


# -- native batch kernel ----------------------------------------------------
# The per-pair greedy window matching is irreducibly sequential *within* a
# pair, so numpy row-vectorization loses to plain Python on short surfaces
# (measured 0.4x).  A 40-line C kernel, compiled once per host with the
# system cc and loaded via ctypes, runs the exact same algorithm ~100x
# faster than the Python row loop.  Deterministic, offline, dependency-free;
# falls back to the pure-Python row loop when no C compiler is available
# (e.g. a locked-down cluster image — the kernel is an optimization, never
# a requirement).

_JW_C_SRC = r"""
#include <stdint.h>
#include <string.h>

static double jaro(const uint32_t* s1, int l1, const uint32_t* s2, int l2,
                   uint8_t* f1, uint8_t* f2) {
    if (l1 == l2 && memcmp(s1, s2, (size_t)l1 * sizeof(uint32_t)) == 0) return 1.0;
    if (l1 == 0 || l2 == 0) return 0.0;
    int w = (l1 > l2 ? l1 : l2) / 2 - 1;
    if (w < 0) w = 0;
    memset(f1, 0, (size_t)l1); memset(f2, 0, (size_t)l2);
    int m = 0;
    for (int i = 0; i < l1; i++) {
        int lo = i - w; if (lo < 0) lo = 0;
        int hi = i + w + 1; if (hi > l2) hi = l2;
        for (int j = lo; j < hi; j++) {
            if (!f2[j] && s2[j] == s1[i]) { f1[i] = 1; f2[j] = 1; m++; break; }
        }
    }
    if (m == 0) return 0.0;
    int t = 0, j = 0;
    for (int i = 0; i < l1; i++) {
        if (f1[i]) {
            while (!f2[j]) j++;
            if (s1[i] != s2[j]) t++;
            j++;
        }
    }
    t /= 2;
    return ((double)m / l1 + (double)m / l2 + (double)(m - t) / m) / 3.0;
}

void jw_batch(const uint32_t* A, const int64_t* la, int64_t wa,
              const uint32_t* B, const int64_t* lb, int64_t wb,
              double* out, int64_t n, double prefix_weight) {
    uint8_t f1[65536], f2[65536];
    for (int64_t r = 0; r < n; r++) {
        int l1 = (int)la[r], l2 = (int)lb[r];
        if (l1 > 65536) l1 = 65536; if (l2 > 65536) l2 = 65536;
        const uint32_t* s1 = A + r * wa;
        const uint32_t* s2 = B + r * wb;
        double jv = jaro(s1, l1, s2, l2, f1, f2);
        if (jv > 0.7) {
            int pmax = 4; if (l1 < pmax) pmax = l1; if (l2 < pmax) pmax = l2;
            int p = 0;
            for (int i = 0; i < pmax && s1[i] == s2[i]; i++) p++;
            jv += p * prefix_weight * (1.0 - jv);
        }
        out[r] = jv;
    }
}
"""

_jw_native = None  # ctypes fn, False after a failed probe, None before probe


def _load_jw_native():
    """Compile (once per host, atomic rename) + ctypes-load the JW kernel."""
    global _jw_native
    if _jw_native is not None:
        return _jw_native or None
    try:
        import ctypes
        import hashlib
        import os
        import subprocess
        import tempfile

        tag = hashlib.md5(_JW_C_SRC.encode()).hexdigest()[:12]
        so_path = os.path.join(tempfile.gettempdir(), f"spel_jw_{tag}.so")
        if not os.path.exists(so_path):
            with tempfile.TemporaryDirectory() as td:
                c_path = os.path.join(td, "jw.c")
                tmp_so = os.path.join(td, "jw.so")
                with open(c_path, "w") as f:
                    f.write(_JW_C_SRC)
                subprocess.run(
                    ["cc", "-O2", "-shared", "-fPIC", "-o", tmp_so, c_path],
                    check=True, capture_output=True, timeout=60,
                )
                os.replace(tmp_so, so_path)  # atomic: concurrent workers race safely
        lib = ctypes.CDLL(so_path)
        fn = lib.jw_batch
        fn.restype = None
        fn.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_double,
        ]
        _jw_native = fn
        return fn
    except Exception:
        _jw_native = False
        return None


def _char_matrix(strs: list):
    """(n, width) uint32 codepoint matrix (0-padded) + length vector.

    numpy's fixed-width unicode dtype IS a 0-padded UCS-4 matrix, so the
    conversion is one C-level ``np.array`` call — no per-row Python (the
    marshalling, not the kernel, dominated the first cut of this batch).
    """
    import numpy as np

    arr_u = np.array(strs, dtype="U")
    if arr_u.dtype.itemsize == 0:  # all-empty batch -> dtype U0, not viewable
        arr_u = arr_u.astype("U1")
    mat = arr_u.view(np.uint32).reshape(len(strs), -1)
    lens = np.char.str_len(arr_u).astype(np.int64)
    return mat, lens


def jaro_winkler_batch(sa: list, sb: list, prefix_weight: float = 0.1):
    """Batch JW: C kernel when available, else the pure-Python row loop.

    Same results bit-for-bit either way (tests/test_similarity.py checks
    kernel == jaro_winkler_py on randomized inputs).
    """
    import numpy as np

    n = len(sa)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    fn = _load_jw_native()
    # rows beyond the kernel's 64Ki flag-buffer cap go to the Python twin:
    # the kernel would silently TRUNCATE them (diverging from hosts without
    # a C compiler), and the padded char matrix would be n x maxlen anyway.
    # Rows containing NUL go with them: numpy's 0-padded 'U' matrix cannot
    # distinguish a trailing '\x00' from padding (np.char.str_len would
    # under-count), so only the Python twin scores them bit-identically
    long_rows = [
        i for i, (x, y) in enumerate(zip(sa, sb))
        if len(x or "") > 65536 or len(y or "") > 65536
        or "\x00" in (x or "") or "\x00" in (y or "")
    ]
    if fn is None or long_rows:
        if fn is None or len(long_rows) == n:
            return np.array(
                [jaro_winkler_py(x, y, prefix_weight) for x, y in zip(sa, sb)],
                dtype=np.float64,
            )
        keep = np.ones(n, dtype=bool)
        keep[long_rows] = False
        out = np.zeros(n, dtype=np.float64)
        out[~keep] = [jaro_winkler_py(sa[i], sb[i], prefix_weight) for i in long_rows]
        short = jaro_winkler_batch(
            [sa[i] for i in range(n) if keep[i]],
            [sb[i] for i in range(n) if keep[i]],
            prefix_weight,
        )
        out[keep] = short
        return out
    A, la = _char_matrix(sa)
    B, lb = _char_matrix(sb)
    out = np.zeros(n, dtype=np.float64)
    fn(
        A.ctypes.data, la.ctypes.data, A.shape[1],
        B.ctypes.data, lb.ctypes.data, B.shape[1],
        out.ctypes.data, n, prefix_weight,
    )
    return out


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched JW over the whole batch (native kernel, Python fallback).

    Runs only on the (deduplicated, blocked) candidate-pair table, never on
    raw turns, so volume is bounded by distinct-surface pairs — the same
    containment the reference gets from candidate sets
    (src/spel/candidate_manager.py:76-103).  Nulls/non-strings score 0.0.
    """
    import numpy as np

    sa = ["" if not isinstance(x, str) else x for x in a]
    sb = ["" if not isinstance(x, str) else x for x in b]
    ok = np.array(
        [isinstance(x, str) and isinstance(y, str) for x, y in zip(a, b)], dtype=bool
    )
    vals = jaro_winkler_batch(sa, sb)
    return pd.Series(np.where(ok, vals, 0.0), dtype="float64")
