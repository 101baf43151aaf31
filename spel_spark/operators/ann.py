"""Approximate nearest-neighbor search over embedding columns.

Brute-force cosine top-k is the exactness baseline (queries.py
q_ann_topk_cosine, DuckDB-verified); this module adds the scale path:
random-hyperplane LSH bucketing so each query only scores candidates in
colliding buckets.  Hyperplanes are seeded (numpy PCG64) — deterministic
across runs and engines.

All vector math is JVM-side (zip_with/aggregate); the hyperplane matrix is
a broadcast literal (dims x n_bits doubles — tiny).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spel_spark.functions.similarity import cosine_sim


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_bits, dim)).tolist()


def with_lsh_signature(
    vecs: DataFrame, vec_col: str = "v", n_bits: int = 16, seed: int = 42
) -> DataFrame:
    """Add sign-projection bits packed into a BIGINT ``lsh_sig``."""
    dim = len(vecs.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_bits, seed)
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit_plane, lambda a, b: a * b),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(
            F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return vecs.withColumn("lsh_sig", sig)


def ann_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """LSH-bucketed cosine top-k: candidates = rows sharing any band of the
    sign signature; verify with exact cosine; row_number <= k.

    Returns (q_id, nbr_id, rk, cos).  Recall vs brute force is measured in
    tests (tests/test_ann.py) — raise n_bits/bands for higher recall.
    """
    r = n_bits // bands
    mask = (1 << r) - 1

    def banded(df: DataFrame, id_alias: str) -> DataFrame:
        sig = with_lsh_signature(df, vec_col, n_bits)
        band_cols = [
            F.concat(
                F.lit(f"{j}:"),
                F.shiftright(F.col("lsh_sig"), j * r).bitwiseAND(F.lit(mask)).cast("string"),
            )
            for j in range(bands)
        ]
        return sig.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(f"{id_alias}_v"),
            F.explode(F.array(*band_cols)).alias("band"),
        )

    q = banded(queries, "q_id")
    e = banded(embeddings, "nbr_id")
    cands = (
        q.join(e, "band")
        .filter(F.col("q_id") != F.col("nbr_id"))
        .select("q_id", "q_id_v", "nbr_id", "nbr_id_v")
        .distinct()
    )
    scored = cands.select(
        "q_id", "nbr_id", cosine_sim(F.col("q_id_v"), F.col("nbr_id_v")).alias("cos_raw")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.col("cos_raw").desc(), F.col("nbr_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "nbr_id", "rk", F.round("cos_raw", 6).cast("double").alias("cos"))
    )
