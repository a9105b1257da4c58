"""Connected components (functions/components.py) vs a pure-Python
union-find ground truth, including adversarial shapes (long paths — the
case naive one-hop label propagation fails)."""

from __future__ import annotations

import random

import pytest

from pandas_expr_spark.functions.components import connected_components, dup_clusters


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min-id per component
    comp_min = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


def _run(spark, edges):
    sdf = spark.createDataFrame(edges, "src: long, dst: long")
    got = {r.node: r.component for r in connected_components(sdf).collect()}
    # self-loop-only nodes never form a real edge -> excluded, mirror that
    real = [e for e in edges if e[0] != e[1]]
    nodes = sorted({u for e in real for u in e})
    expect = _union_find(real, nodes)
    assert got == expect


def test_cc_basic_shapes(spark):
    _run(spark, [(1, 2), (2, 3), (3, 4), (4, 5),          # path
                 (10, 11), (11, 12), (10, 12),            # triangle
                 (20, 21),                                # pair
                 (30, 30),                                # self loop (dropped)
                 (2, 1)])                                 # dup reversed edge


def test_cc_long_path(spark):
    # 150-node path: needs O(log n) star rounds, not one-hop propagation
    _run(spark, [(i, i + 1) for i in range(150)])


def test_cc_star_and_random(spark):
    rng = random.Random(7)
    edges = [(0, i) for i in range(1, 40)]                       # hub star
    edges += [(rng.randrange(100, 200), rng.randrange(100, 200))
              for _ in range(120)]                               # random clumps
    _run(spark, edges)


def test_dup_clusters_canonical(spark):
    pairs = spark.createDataFrame([(5, 9), (9, 2), (7, 8)], "id_a: long, id_b: long")
    rows = {r.doc_id: (r.cluster_id, r.is_canonical)
            for r in dup_clusters(pairs).collect()}
    assert rows == {2: (2, True), 5: (2, False), 9: (2, False),
                    7: (7, True), 8: (7, False)}


def test_cc_empty(spark):
    sdf = spark.createDataFrame([], "src: long, dst: long")
    assert connected_components(sdf).count() == 0
