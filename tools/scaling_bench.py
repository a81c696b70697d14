"""Two-parallelism scaling evidence (the sandbox stand-in for the north
rule's N → 4N executor requirement; see BASELINE.md).

Stages a deterministic corpus to parquet once, then runs the identical
parse → extract → count job at local[8] and local[32] from disk, so the
measured work is the engine itself (one Python stage + JVM expressions),
not corpus generation. Prints one JSON line; paste results into BASELINE.md.

Usage: python tools/scaling_bench.py [n_pages] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgforge.session import build_session  # noqa: E402


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    corpus_dir = f"/tmp/kgforge_scale_corpus_{n_pages}"

    full = os.environ.get("SPARK_GRAFT_SCALE_FULL") == "1"

    from kgforge import corpus as C
    from kgforge.extractors import fused_quads
    from kgforge.parse import prepare
    from kgforge.pipeline import run_pipeline

    if not os.path.exists(corpus_dir + "/_SUCCESS"):
        shutil.rmtree(corpus_dir, ignore_errors=True)
        s = build_session(app="scale-stage", master="local[32]", shuffle_partitions=64)
        C.generate_corpus_df(s, n_pages, partitions=64).write.mode("overwrite").parquet(corpus_dir)
        s.stop()

    # N vs 4N without saturating the 32-core host: a python-stage task
    # burns ~2 CPUs (JVM thread + python worker), so local[8] already uses
    # ~16 cores; local[32] would oversubscribe and understate scaling.
    levels = tuple(int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "2,8").split(","))
    results = {}
    for c in levels:
        s = build_session(app=f"scale-{c}", master=f"local[{c}]", shuffle_partitions=2 * c)
        corpus = s.read.parquet(corpus_dir)
        # warm-up: JIT/codegen + python worker spawn (not part of steady-state
        # throughput on a long-running cluster)
        fused_quads(prepare(corpus.limit(2000))).count()
        # best-of-N (default 2): the sandbox host carries background load;
        # min wall time is the closest estimate of the engine's own cost
        runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "2"))
        wall = float("inf")
        for _ in range(runs):
            t0 = time.time()
            if full:
                # entire pipeline: parse, fused+mapping extract, closure,
                # consistency, linking, dedup (in-memory stages)
                n_quads = run_pipeline(s, corpus).count()
            else:
                n_quads = fused_quads(prepare(corpus)).count()
            wall = min(wall, time.time() - t0)
        results[f"local[{c}]"] = {
            "pages": n_pages,
            "quads": n_quads,
            "sec": round(wall, 2),
            "pages_per_sec": round(n_pages / wall, 1),
            "quads_per_sec": round(n_quads / wall, 1),
        }
        s.stop()
    lo, hi = f"local[{levels[0]}]", f"local[{levels[-1]}]"
    ratio = levels[-1] / levels[0]
    rlo = results[lo]["pages_per_sec"]
    rhi = results[hi]["pages_per_sec"]
    results["speedup"] = round(rhi / rlo, 2)
    results["efficiency"] = round((rhi / rlo) / ratio, 3)
    results["levels"] = [lo, hi]
    line = json.dumps(results)
    print(line)
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
