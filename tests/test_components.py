"""connected_components vs a pure-Python union-find mirror."""

from __future__ import annotations

import random

from kgforge.components import connected_components


def uf_mirror(edges, nodes):
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
    # component label = min node in the component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for ms in comp.values() for members in [ms] for n in ms}


def _check(spark, edges, nodes):
    e = spark.createDataFrame(edges, "a long, b long")
    n = spark.createDataFrame([(x,) for x in nodes], "node long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(e, n).collect()
    }
    assert got == uf_mirror(edges, nodes)


def test_two_clusters_and_singleton(spark):
    _check(spark, [(1, 2), (2, 3), (10, 11)], [1, 2, 3, 10, 11, 99])


def test_chain_needs_pointer_jumping(spark):
    # a 40-node path: naive neighbor propagation needs 40 rounds, the
    # pointer jump contracts it inside the 30-round bound
    edges = [(i, i + 1) for i in range(1, 40)]
    _check(spark, edges, list(range(1, 41)))


def test_cycle_and_cross_links(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (7, 8), (8, 9), (9, 7)]
    _check(spark, edges, [1, 2, 3, 4, 7, 8, 9])


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(100))
    edges = [(rng.randrange(100), rng.randrange(100)) for _ in range(60)]
    edges = [(u, v) for u, v in edges if u != v]
    _check(spark, edges, nodes)


def test_edges_only_universe(spark):
    e = spark.createDataFrame([(5, 6), (6, 7)], "a long, b long")
    got = {r["node"]: r["component"] for r in connected_components(e).collect()}
    assert got == {5: 5, 6: 5, 7: 5}
