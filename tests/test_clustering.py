"""Connected components: equivalence with a union-find oracle on seeded
random graphs; convergence; partition-count invariance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spel_spark.operators.clustering import connected_components


def _uf_components(edges):
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    nodes = set()
    for a, b in edges:
        nodes.update((a, b))
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


@pytest.mark.parametrize("backend", ["driver", "distributed"])
@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 50, 40), (2, 200, 150), (3, 500, 700)])
def test_cc_matches_union_find(spark, seed, n_nodes, n_edges, backend):
    """Both backends against the union-find oracle: the distributed
    large-star/small-star path is the production-scale path and must not
    ship untested just because auto picks driver below 5M edges."""
    rng = np.random.Generator(np.random.PCG64(seed))
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, n_nodes, size=(n_edges, 2))
        if a != b
    ]
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {
        r.node: r.component
        for r in connected_components(df, backend=backend).collect()
    }
    want = _uf_components(edges)
    # every edge endpoint maps to its component min (roots may be implicit)
    for n, c in want.items():
        assert got.get(n, n) == c
    # nothing extra or wrong in the spark result
    for n, c in got.items():
        assert want[n] == c


def test_cc_chain_and_star(spark):
    # chain 1-2-3-4-5 plus star 10-(11,12,13)
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (10, 13)]
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    for n in [2, 3, 4, 5]:
        assert got[n] == 1
    for n in [11, 12, 13, 10]:
        assert got.get(n, n) == 10


def test_cc_partition_invariance(spark):
    rng = np.random.Generator(np.random.PCG64(7))
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 300, size=(250, 2)) if a != b]
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    r2 = {
        (r.node, r.component)
        for r in connected_components(df.repartition(2)).collect()
    }
    r8 = {
        (r.node, r.component)
        for r in connected_components(df.repartition(8)).collect()
    }
    assert r2 == r8
