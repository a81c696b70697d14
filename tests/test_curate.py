"""The staged curation job (jobs/curate.py): composition of the oracled
curation ops into a resumable keep/reject + manifest pipeline.

Each underlying op is value-verified by its own DuckDB oracle; these
tests pin what composition adds — the intersection semantics of the
keep decision, the checkpoint/resume contract, and the manifest's
internal consistency over the SURVIVING corpus (shuffle positions and
packs are computed post-filter, so they must form a permutation of the
survivors, not of the raw table)."""

import time

import pytest
from pyspark.sql import functions as F

from jobs.curate import keep_signals, run_curation

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("curate"))


@pytest.fixture(scope="module")
def metrics(spark, workdir):
    return run_curation(spark, SF_DIR, workdir)


def test_stage_counts_consistent(spark, metrics):
    import __spark_entry__ as E

    n_docs = E._t(spark, SF_DIR, "documents").count()
    assert metrics["signals"]["n_docs"] == n_docs
    n_kept = metrics["signals"]["n_kept"]
    assert 0 < n_kept < n_docs
    assert metrics["survivors"]["n_docs"] == n_kept
    assert metrics["manifest"]["n_docs"] == n_kept
    # every rejection carries a reason and the tallies add up
    assert sum(metrics["signals"]["rejects"].values()) == n_docs - n_kept


def test_survivors_have_no_exact_duplicates(spark, metrics, workdir):
    surv = spark.read.parquet(f"{workdir}/survivors/documents.parquet")
    n = surv.count()
    assert surv.select(F.md5("text")).distinct().count() == n


def test_keep_reasons_priority(spark):
    sig = keep_signals(spark, SF_DIR)
    rows = sig.collect()
    for r in rows:
        assert r.kept == (r.reason is None)
    reasons = {r.reason for r in rows if r.reason}
    assert reasons <= {
        "exact_duplicate", "near_duplicate", "low_quality",
        "c4_lines", "classifier_lowscore", "benchmark_doc", "contaminated",
    }
    # the synthetic corpus plants near-dup pairs and low-quality docs
    # (no byte-exact dups at sf0.001 — those fall out as near-dups)
    assert {"near_duplicate", "low_quality"} <= reasons
    # the held-out benchmark slice (doc_id % 97 == 0) must NEVER be
    # trained on: no keeper in it, and the ones passing every other
    # gate are rejected for exactly that reason
    for r in rows:
        if r.doc_id % 97 == 0:
            assert not r.kept
    assert "benchmark_doc" in reasons


def test_manifest_is_permutation_of_survivors(spark, metrics, workdir):
    man = spark.read.parquet(f"{workdir}/manifest")
    rows = man.collect()
    surv_ids = {
        r.doc_id
        for r in spark.read.parquet(
            f"{workdir}/survivors/documents.parquet"
        ).collect()
    }
    assert {r.doc_id for r in rows} == surv_ids
    by_shard = {}
    for r in rows:
        assert r.weight > 0 and r.epochs > 0
        by_shard.setdefault(r.shard, []).append(r.pos)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_rerun_resumes_from_checkpoints(spark, metrics, workdir):
    t0 = time.time()
    again = run_curation(spark, SF_DIR, workdir)
    assert time.time() - t0 < 2  # all three stages skipped
    assert again == metrics
