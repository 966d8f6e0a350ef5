"""connected_components vs a local union-find oracle on seeded random
graphs — shape-independent equivalence for the pointer-jumping
implementation (paths/stars are covered by targeted tests; this sweeps
mixed component shapes, duplicate edges, self-loops and skewed ids)."""

import numpy as np
import pytest

from equi7grid_spark.dedup import connected_components


def _union_find(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id label per component, only nodes that appear in an edge
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 60, 40), (2, 200, 260), (3, 40, 400)])
def test_connected_components_matches_union_find(spark, seed, n_nodes, n_edges):
    rng = np.random.default_rng(seed)
    # skew ids into a sparse range so label ordering isn't 0..n-1 dense
    ids = sorted(int(x) for x in rng.choice(10**6, size=n_nodes, replace=False))
    edges = [
        (ids[int(rng.integers(n_nodes))], ids[int(rng.integers(n_nodes))])
        for _ in range(n_edges)
    ]  # includes self-loops and duplicates by construction
    expect = _union_find(n_nodes, edges)

    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.id: r.lab for r in connected_components(df, max_iter=20).collect()}
    assert got == expect
