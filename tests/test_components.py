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


# ---------------------------------------------------------------------------
# pagerank vs a pure-Python power-iteration mirror
# ---------------------------------------------------------------------------

def pr_mirror(edges, nodes, iterations=5, damping=0.85):
    from collections import Counter

    deg = Counter(u for u, _ in edges)
    universe = set(nodes) | {x for e in edges for x in e}
    r = {n: 1.0 for n in universe}
    for _ in range(iterations):
        contrib = Counter()
        for u, v in edges:
            contrib[v] += r[u] / deg[u]
        r = {n: (1 - damping) + damping * contrib.get(n, 0.0) for n in universe}
    return r


def test_pagerank_matches_mirror(spark):
    import random

    from kgforge.components import pagerank

    rng = random.Random(5)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(80)]
    e = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["rank"] for r in pagerank(e, iterations=5).collect()}
    want = pr_mirror(edges, [])
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, n


def test_pagerank_sink_and_source_shapes(spark):
    from kgforge.components import pagerank

    # 1 -> 2 -> 3 (3 dangling), isolated 9 via nodes
    e = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    n = spark.createDataFrame([(9,)], "node long")
    got = {r["node"]: round(r["rank"], 6) for r in pagerank(e, nodes=n).collect()}
    want = pr_mirror([(1, 2), (2, 3)], [9])
    assert got == {k: round(v, 6) for k, v in want.items()}
    assert got[9] == 0.15  # no in-links: base rank only
    assert got[3] > got[2] > got[1]  # downstream accumulates


def test_reliable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir= routes per-round truncation through RELIABLE
    checkpoints (cluster executor-loss safety) with identical results."""
    import os

    from kgforge.components import connected_components, pagerank

    d = str(tmp_path / "ckpt")
    e = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "a long, b long")
    base = {r["node"]: r["component"] for r in connected_components(e).collect()}
    reli = {r["node"]: r["component"]
            for r in connected_components(e, checkpoint_dir=d).collect()}
    assert base == reli == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}
    # the reliable path actually wrote checkpoint data to the dir
    files = [os.path.join(dp, f) for dp, _, fs in os.walk(d) for f in fs]
    assert files, "no reliable checkpoint files written"

    pr_base = {r["node"]: round(r["rank"], 9) for r in pagerank(e).collect()}
    pr_reli = {r["node"]: round(r["rank"], 9)
               for r in pagerank(e, checkpoint_dir=d).collect()}
    assert pr_base == pr_reli
