"""spark-submit entry point for the training-data curation pipeline.

Chains the engine's oracled curation operators into the standard
corpus-assembly flow a large-scale training-data pipeline runs:

    stage 1  signals    exact dedup + MinHash-LSH near-dup clusters +
                        quality gate + C4 line filter + benchmark
                        n-gram decontamination → one keep/reject
                        decision per document (with the reject reason)
    stage 2  survivors  the kept documents, re-materialized as a
                        documents table (the checkpoint later stages
                        and reruns read)
    stage 3  manifest   per-surviving-doc training manifest: domain
                        mixture weight (temperature-scaled), epoch
                        shuffle position (shard, pos), and sequence
                        packing (pack_id, seq_off, n_tok)

Cluster usage (same deployment shape as jobs/extract.py):

    zip -r kgforge.zip kgforge
    spark-submit --master <cluster> --py-files kgforge.zip \\
        jobs/curate.py --input <dir with documents.parquet> \\
        --workdir <checkpoint dir>

Every stage writes a parquet checkpoint under --workdir and is skipped
on rerun when its _SUCCESS marker exists (same resume contract as
run_pipeline); per-stage row counts and reject-reason tallies land in
<workdir>/metrics.json. All heavy lifting reuses the DuckDB-oracled
query functions from __spark_entry__ verbatim — this job only composes
them, so the correctness signal carries over unchanged.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def keep_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keep decision: every signal is the corresponding
    oracled __spark_entry__ query, intersected. A document survives iff
    it is the canonical representative of its exact-duplicate group AND
    of its near-duplicate cluster, passes the quality and C4 line
    gates, and is not benchmark-contaminated. `reason` holds the first
    failed gate (priority order below) for the reject tally."""
    import __spark_entry__ as E

    d = E._t(spark, sf_dir, "documents")
    exact = E._dedup_exact(spark, sf_dir)  # doc_hash → canonical_doc_id
    clusters = E._dedup_clusters(spark, sf_dir)  # doc_id → is_canonical
    quality = E._quality_score(spark, sf_dir).select("doc_id", "keep")
    c4 = E._c4_line_filter(spark, sf_dir).select("doc_id", "kept_doc")
    contam = E._contamination_ngrams(spark, sf_dir).select("doc_id", "flagged")

    sig = (
        d.withColumn("doc_hash", F.md5("text"))
        .join(exact.select("doc_hash", "canonical_doc_id"), "doc_hash")
        .join(clusters.select("doc_id", "is_canonical"), "doc_id", "left")
        .join(quality, "doc_id", "left")
        .join(c4, "doc_id", "left")
        .join(contam, "doc_id", "left")
    )
    exact_ok = F.col("doc_id") == F.col("canonical_doc_id")
    # docs that never entered a near-dup pair are absent from the
    # cluster table: absent == canonical of a singleton cluster
    near_ok = F.coalesce(F.col("is_canonical"), F.lit(True))
    qual_ok = F.coalesce(F.col("keep"), F.lit(False))
    c4_ok = F.coalesce(F.col("kept_doc"), F.lit(False))
    clean = ~F.coalesce(F.col("flagged"), F.lit(False))
    reason = (
        F.when(~exact_ok, "exact_duplicate")
        .when(~near_ok, "near_duplicate")
        .when(~qual_ok, "low_quality")
        .when(~c4_ok, "c4_lines")
        .when(~clean, "contaminated")
    )
    return sig.select(
        "doc_id",
        "lang",
        "source",
        (exact_ok & near_ok & qual_ok & c4_ok & clean).alias("kept"),
        reason.alias("reason"),
    )


def run_curation(spark: SparkSession, sf_dir: str, workdir: str) -> dict:
    """Run (or resume) the staged pipeline; returns the metrics dict."""
    import __spark_entry__ as E

    os.makedirs(workdir, exist_ok=True)
    metrics_path = os.path.join(workdir, "metrics.json")
    metrics: dict = (
        json.load(open(metrics_path)) if os.path.exists(metrics_path) else {}
    )

    sig_dir = os.path.join(workdir, "signals")
    if not _done(sig_dir):
        t0 = time.time()
        keep_signals(spark, sf_dir).write.mode("overwrite").parquet(sig_dir)
        sig = spark.read.parquet(sig_dir)
        rejects = {
            r.reason: r.n
            for r in sig.where(~F.col("kept"))
            .groupBy("reason")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        metrics["signals"] = {
            "n_docs": sig.count(),
            "n_kept": sig.where("kept").count(),
            "rejects": rejects,
            "sec": round(time.time() - t0, 2),
        }
        json.dump(metrics, open(metrics_path, "w"), indent=1)

    surv_dir = os.path.join(workdir, "survivors")
    surv_table = os.path.join(surv_dir, "documents.parquet")
    if not _done(surv_table):
        t0 = time.time()
        d = E._t(spark, sf_dir, "documents")
        kept = spark.read.parquet(sig_dir).where("kept").select("doc_id")
        d.join(kept, "doc_id").write.mode("overwrite").parquet(surv_table)
        metrics["survivors"] = {
            "n_docs": spark.read.parquet(surv_table).count(),
            "sec": round(time.time() - t0, 2),
        }
        json.dump(metrics, open(metrics_path, "w"), indent=1)

    man_dir = os.path.join(workdir, "manifest")
    if not _done(man_dir):
        t0 = time.time()
        # later stages read the survivors checkpoint as their table dir,
        # so the oracled ops run verbatim over the filtered corpus
        mix = E._domain_mixture(spark, surv_dir).select(
            "lang", "source", "weight", "epochs"
        )
        shuf = E._corpus_shuffle(spark, surv_dir)
        pack = E._seq_pack(spark, surv_dir).select(
            "doc_id", "bucket", "pack_id", "seq_off", "n_tok"
        )
        d = E._t(spark, surv_dir, "documents").select("doc_id", "lang", "source")
        (
            d.join(F.broadcast(mix), ["lang", "source"])
            .join(shuf, "doc_id")
            .join(pack, "doc_id")
            .write.mode("overwrite")
            .parquet(man_dir)
        )
        man = spark.read.parquet(man_dir)
        metrics["manifest"] = {
            "n_docs": man.count(),
            "n_packs": man.select("bucket", "pack_id").distinct().count(),
            "sec": round(time.time() - t0, 2),
        }
        json.dump(metrics, open(metrics_path, "w"), indent=1)

    return json.load(open(metrics_path))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="directory holding documents.parquet")
    ap.add_argument("--workdir", required=True,
                    help="checkpoint/metrics directory")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from kgforge.session import build_session

    spark = build_session(app="kgforge-curate", master=args.master)
    metrics = run_curation(spark, args.input, args.workdir)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
