"""PageRank operator (functions/components.py) vs a driver-side numpy
power-iteration reference, including dangling nodes and sink-only
nodes."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pandas_expr_spark import get_spark
from pandas_expr_spark.functions.components import pagerank


def _np_pagerank(edges, n, damping=0.85, iters=10):
    deg = np.zeros(n)
    for u, _ in edges:
        deg[u] += 1
    r = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    for _ in range(iters):
        s = np.zeros(n)
        for u, v in edges:
            s[v] += r[u] / deg[u]
        dangling = r[deg == 0].sum()
        r = base + damping * (s + dangling / n)
    return r


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def test_pagerank_matches_power_iteration(spark):
    # graph with a hub (0), a chain, a dangling node (5), and a
    # sink-only node (6)
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 0), (3, 4), (4, 0),
             (1, 6), (4, 6)]
    n = 7
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    # node 5 never appears — add an edge INTO it so it's a known node
    e2 = e.unionByName(spark.createDataFrame(
        pd.DataFrame([(3, 5)], columns=["src", "dst"])))
    got = {r["node"]: r["rank"]
           for r in pagerank(e2, iters=10).collect()}
    all_edges = edges + [(3, 5)]
    want = _np_pagerank(all_edges, n, iters=10)
    for v in range(n):
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])
    # probability mass is conserved (dangling mass redistributed)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_uniform_on_cycle(spark):
    n = 5
    e = spark.createDataFrame(
        pd.DataFrame([(i, (i + 1) % n) for i in range(n)],
                     columns=["src", "dst"]))
    got = [r["rank"] for r in pagerank(e, iters=7).collect()]
    assert np.allclose(got, 1.0 / n)
