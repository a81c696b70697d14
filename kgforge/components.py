"""Connected components for dedup-cluster assignment (training-data op).

Not a reference port: this is part of the beyond-reference LLM-pipeline
operator set (exact/MinHash/SimHash dedup live in the driver contract).
Near-duplicate PAIRS alone don't dedup a corpus — transitive matches
(A~B, B~C) must collapse into one cluster with one canonical survivor, and
at 100 TB that's a distributed connected-components problem, not a driver
union-find.

Algorithm: min-label propagation with a pointer-jumping step per round
(label(n) ← min(label(n), min_neighbor(label), label(label(n)))), the
classic Spark CC shape — neighbor hops alone need diameter rounds; the
pointer jump contracts chains logarithmically.  Near-dup clusters are
small-diameter in practice; ``max_rounds`` is a safety valve with a
convergence check per round (count of changed labels), never a silent cap.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, functions as F

from .caching import truncate_lineage


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    *,
    max_rounds: int = 30,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, component) with component = min node id in the component.

    ``edges``: two-column DataFrame of undirected pairs (any column names);
    ``nodes``: optional one-column universe of ADDITIONAL nodes — isolated
    nodes come out as their own singleton component (dedup keep-list
    semantics: every doc gets a cluster).  Edge endpoints are always part
    of the universe, so a ``nodes`` list that misses an intermediate node
    cannot silently split a component.  Node ids must be orderable (the
    min id is the label).  ``checkpoint_dir``: reliable per-round
    checkpoints for cluster runs (see caching.truncate_lineage).
    """
    _t = lambda df, eager: truncate_lineage(df, eager=eager, checkpoint_dir=checkpoint_dir)
    a, b = edges.columns[:2]
    # row-block checkpoint + SHUFFLE_HASH hints on the narrow label tables
    # below (r6, same measured trade as pagerank: no columnar cache build,
    # no per-round sorts; label tables are (node, label) rows — spillable)
    # r6: the undirected edge table is checkpointed ALREADY partitioned by
    # the join key "u" (the distinct's own exchange is keyed (u, v), which
    # the per-round join on u cannot reuse; an explicit u-keyed partitioning
    # survives the row-block checkpoint, so no round ever re-shuffles the
    # edge table — guide §2.4)
    und = _t(
        edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .unionByName(edges.select(F.col(b).alias("u"), F.col(a).alias("v")))
        .distinct()
        .repartition("u"),
        True,
    )
    universe = und.select(F.col("u").alias("node"))
    if nodes is not None:
        universe = universe.unionByName(
            nodes.select(F.col(nodes.columns[0]).alias("node"))
        )
    universe = universe.distinct()
    labels = _t(universe.withColumn("label", F.col("node")), True)

    converged = False
    for _ in range(max_rounds):
        nb = (
            und.join(labels.hint("SHUFFLE_HASH"), und["u"] == labels["node"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("label").alias("nb_label"))
        )
        stepped = (
            labels.join(nb.hint("SHUFFLE_HASH"), "node", "left")
            # carry the round-start label through as "old": the convergence
            # check below compares it in-row, replacing the r5 full
            # jumped⋈labels join per round (guide §2.4 — one 8-byte column
            # in flight buys a whole join + shuffle back)
            .select(
                "node",
                F.col("label").alias("old"),
                F.least("label", F.coalesce("nb_label", "label")).alias("label"),
            )
            # materialize: the pointer-jump self-join below references this
            # plan twice — unmaterialized, the neighbor join executes once
            # per join side every round
        )
        stepped = _t(stepped, True)
        # pointer jump: label <- label(label) — contracts label chains so
        # convergence is ~log(diameter), not diameter
        as_map = stepped.select(
            F.col("node").alias("m_node"), F.col("label").alias("m_label")
        )
        jumped = (
            stepped.join(
                as_map.hint("SHUFFLE_HASH"), stepped["label"] == as_map["m_node"], "left"
            )
            .select(
                "node",
                "old",
                F.least("label", F.coalesce("m_label", "label")).alias("label"),
            )
            # lazy: the convergence count below materializes it (one job)
        )
        jumped = _t(jumped, False)
        changed = jumped.filter(F.col("label") != F.col("old")).limit(1).count()
        labels = jumped.select("node", "label")
        if changed == 0:
            converged = True
            break
    if not converged:
        warnings.warn(
            f"connected_components: labels still changing after {max_rounds} "
            f"rounds — raise max_rounds (graph diameter exceeds the bound)"
        )
    return labels.select("node", F.col("label").alias("component"))


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = 5,
    damping: float = 0.85,
    nodes: DataFrame | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-iteration power-method PageRank over (src, dst) edges.

    The unnormalized per-node form r(v) = (1-d) + d·Σ_{u→v} r(u)/deg(u)
    with ranks initialized to 1.0 and dangling mass NOT redistributed —
    deterministic for a fixed iteration count, so an oracle can replay it
    as chained SQL passes.  One key-partitioned shuffle per iteration
    (contributions grouped by dst) plus the broadcast-size degree join;
    per-round lineage checkpoints keep the plan linear in iterations
    (reliable when ``checkpoint_dir`` is set — cluster runs survive
    executor loss).
    """
    _t = lambda df, eager: truncate_lineage(df, eager=eager, checkpoint_dir=checkpoint_dir)
    a, b = edges.columns[:2]
    e = edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # row-block checkpoint over columnar persist + a SHUFFLE_HASH hint on
    # the (narrow, spillable) rank table below: measured 4.6 s → 2.3 s for
    # the 5-iteration run at sf1.0 (r6; persist paid a columnar cache
    # build, and the per-round sort-merge paid two sorts of the edge side)
    # r6: checkpoint the edge+degree table ALREADY partitioned by src — the
    # per-iteration contribution join is keyed on src, so the edge side is
    # never re-shuffled (only the narrow rank table moves each round);
    # partitioning survives the row-block checkpoint (guide §2.4)
    ed = _t(e.join(deg, "src").repartition("src"), True)
    # derive the universe from the persisted edge table, not the source
    # (two extra source scans otherwise — the source may be an expensive
    # filter over a large cached graph)
    universe = ed.select(F.col("src").alias("node")).unionByName(
        ed.select(F.col("dst").alias("node"))
    )
    if nodes is not None:
        universe = universe.unionByName(
            nodes.select(F.col(nodes.columns[0]).alias("node"))
        )
    universe = universe.distinct()
    base = float(1.0 - damping)
    # the iterated ranks table covers IN-LINK nodes only: a node with no
    # in-links holds the constant rank 1.0 before the first iteration and
    # (1 - d) after it, so carrying the full universe through every round
    # (an extra exchange per iteration) buys nothing — the constant rides
    # the contribution join as a coalesce default, and the universe is
    # joined back exactly once at the end
    ranks = None  # None ⇒ every node at the uniform init rank 1.0
    missing_rank = 1.0
    for _ in range(iterations):
        if ranks is None:
            contrib = ed.groupBy(F.col("dst").alias("node")).agg(
                F.sum(F.lit(1.0) / F.col("deg")).alias("c")
            )
        else:
            contrib = (
                ed.join(ranks.hint("SHUFFLE_HASH"), ed["src"] == ranks["node"], "left")
                .groupBy(F.col("dst").alias("node"))
                .agg(
                    F.sum(
                        F.coalesce(F.col("rank"), F.lit(missing_rank)) / F.col("deg")
                    ).alias("c")
                )
            )
        ranks = _t(contrib.select(
            "node", (F.lit(base) + F.lit(damping) * F.col("c")).alias("rank")
        ), False)
        missing_rank = base
    out = universe.join(ranks, "node", "left").select(
        "node", F.coalesce("rank", F.lit(base)).alias("rank")
    ) if ranks is not None else universe.withColumn("rank", F.lit(1.0))
    out = _t(out, True)
    return out
