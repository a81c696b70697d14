"""ANN quality + plan-shape tests for the similarity-search operators.

Three paths exist over the embeddings table (``__spark_entry__.py``):

* ``embedding_topk`` — brute-force cosine top-3 (exactness baseline; the
  documented 20-query crossJoin, not the scale path);
* ``ann_bucketed_topk`` — data-independent hyperplane-LSH buckets;
* ``ann_ivf_topk`` — IVF: a 16-centroid codebook, Voronoi cell
  assignment, nprobe=2 probing (the data-adaptive scale path).

This file pins (a) IVF recall@3 against the exact baseline — measured
0.88 at sf0.001 (the LSH variant's data-independent buckets give ~0.12 on
the same gaussian data, which is exactly WHY the IVF path exists), and
(b) the plan shape: the codebook side of every IVF join is a broadcast,
so assignment adds no all-pairs shuffle.
"""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def results(spark):
    exact = {(r.vec_id, r.neighbor_id) for r in entry.queries()["embedding_topk"](spark, SF_DIR).collect()}
    ivf = {(r.vec_id, r.neighbor_id) for r in entry.queries()["ann_ivf_topk"](spark, SF_DIR).collect()}
    return exact, ivf


def test_ivf_returns_topk_per_query(spark):
    df = entry.queries()["ann_ivf_topk"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == 60  # 20 queries x top-3
    per_q = {}
    for r in rows:
        per_q.setdefault(r.vec_id, []).append(r.rnk)
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())


def test_ivf_recall_beats_floor(results):
    exact, ivf = results
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.80, f"IVF recall@3 regressed: {recall:.3f}"


def test_ivf_codebook_joins_are_broadcast(spark):
    plan = entry.queries()["ann_ivf_topk"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    # the 16-row codebook must arrive via broadcast on every use —
    # assignment and probing never shuffle the full vector table against it
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the final cell-restricted search is a hash join on the cell id
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
