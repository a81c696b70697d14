"""Pipeline: checkpoint resume, N-Triples round-trip, lineage."""

import os
import tempfile

from pyspark.sql import functions as F

from kgforge import corpus as C
from kgforge.compare import quad_pr
from kgforge.emit import read_ntriples, write_ntriples
from kgforge.pipeline import run_pipeline


def test_resume_and_lineage(spark):
    wd = tempfile.mkdtemp(prefix="kgforge_pipe_")
    corpus = C.generate_corpus_df(spark, 100, partitions=2)
    g1 = run_pipeline(spark, corpus, workdir=wd)
    n1 = g1.count()
    lineage = spark.read.parquet(wd + "/_lineage")
    stages = {r.stage for r in lineage.collect()}
    assert {"parsed", "quads", "transitive_redirects", "type_consistency", "entity_links", "graph"} <= stages
    assert lineage.filter(~F.col("content_sha_ok")).count() == 0
    # resume: same workdir → all stages skipped, identical output
    g2 = run_pipeline(spark, corpus, workdir=wd)
    assert g2.count() == n1
    # partial resume: drop the final stage, rerun → recomputed identically
    import shutil

    shutil.rmtree(wd + "/graph")
    g3 = run_pipeline(spark, corpus, workdir=wd)
    assert g3.count() == n1


def test_ntriples_round_trip(spark):
    wd = tempfile.mkdtemp(prefix="kgforge_nt_")
    graph = run_pipeline(spark, C.generate_corpus_df(spark, 100, partitions=2)).cache()
    write_ntriples(graph, wd + "/nt")
    back = read_ntriples(spark, wd + "/nt")
    pr = quad_pr(back, graph)
    assert pr.precision == 1.0 and pr.recall == 1.0, str(pr)


def test_arrow_parse_equals_pandas_parse(spark):
    """The mapInArrow parse path (production) and the legacy pandas path must
    produce identical feature columns (the cross-check parse_corpus_pandas
    exists for)."""
    from kgforge import corpus as C
    from kgforge.parse import derive_page_columns, parse_corpus, parse_corpus_pandas

    df = derive_page_columns(C.generate_corpus_df(spark, 80, partitions=2))
    cols = ["subject", "page_iri", "redirect_target", "links", "external_links",
            "templates", "param_decls", "sections", "tables", "coord_lat",
            "coord_lon", "n_tables", "plain_text", "abstract", "parse_errors"]
    a = {r["subject"]: r for r in parse_corpus(df).select(*cols).collect()}
    b = {r["subject"]: r for r in parse_corpus_pandas(df).select(*cols).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], k


def test_pipeline_iceberg_flag_falls_back_without_jar(spark, tmp_path):
    """fmt='iceberg' (SURVEY §1.3 target): with no Iceberg runtime jar the
    pipeline warns and falls back to parquet — same layout, same resume
    contract. With the jar present it writes real Iceberg tables (skipped
    here when absent)."""
    import warnings

    import pytest

    from kgforge import corpus as C
    from kgforge.pipeline import Pipeline, iceberg_available, run_pipeline

    if iceberg_available(spark):
        pytest.skip("jar present — fallback path not exercised; covered by real path")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        p = Pipeline(spark, str(tmp_path / "wd"), fmt="iceberg")
        assert p.fmt == "parquet" and any("falling back" in str(x.message) for x in w)
    graph = run_pipeline(spark, C.generate_corpus_df(spark, 40, partitions=2),
                         workdir=str(tmp_path / "wd2"), fmt="iceberg")
    assert graph.count() > 0
    assert (tmp_path / "wd2" / "graph" / "_SUCCESS").exists()


def test_pipeline_iceberg_real(spark, tmp_path):
    """Real Iceberg write path (runs only when the runtime jar + catalog are
    configured)."""
    import pytest

    from kgforge.pipeline import iceberg_available

    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime jar absent in this environment")
    from kgforge import corpus as C
    from kgforge.pipeline import run_pipeline

    graph = run_pipeline(spark, C.generate_corpus_df(spark, 40, partitions=2),
                         workdir=str(tmp_path / "wd"), fmt="iceberg")
    assert graph.count() > 0


def test_pipeline_with_wikidata_corpus(spark):
    """A second entity-JSON corpus routes through the full wikidata
    extractor group as its own checkpointed, resumable stage — the
    reference's separate wikidata-dump run folded into one job."""
    wd = tempfile.mkdtemp(prefix="kgforge_pipe_wd_")
    corpus = C.generate_corpus_df(spark, 50, partitions=2)
    wd_corpus = spark.read.parquet("tests/fixtures/minidump/wikidata_corpus.parquet")
    g1 = run_pipeline(spark, corpus, workdir=wd, wikidata_corpus=wd_corpus)
    datasets = {r.dataset for r in g1.select("dataset").distinct().collect()}
    # wikitext AND wikidata datasets land in one deduped graph
    assert "labels" in datasets
    assert {"wikidata_labels", "wikidata_property", "wikidata_reference",
            "wikidata_lexeme", "wikidata_namespace_same_as"} <= datasets
    n1 = g1.count()
    lineage = spark.read.parquet(wd + "/_lineage")
    assert "wikidata_quads" in {r.stage for r in lineage.collect()}
    # resume: identical output, wikidata stage skipped
    g2 = run_pipeline(spark, corpus, workdir=wd, wikidata_corpus=wd_corpus)
    assert g2.count() == n1
