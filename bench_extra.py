"""Per-query isolation bench + plan capture (guide §1.4/§1.5).

`bench.py` is frozen for measurement, so every extra probe lives here:

    python bench_extra.py --sf /root/testdata/sf1.0 --reps 2 semdedup kg_sd_types
    python bench_extra.py --sf /root/testdata/sf1.0 --explain plans/r06 --tag before semdedup
    python bench_extra.py --sf /root/testdata/sf1.0 --phases engine

Each query is timed with the noop sink (computes every column, discards the
result) under a setJobDescription label, best-of-`--reps`.  `--explain DIR`
additionally writes `DIR/<query>_<tag>.txt` with .explain("formatted").
`--phases engine|wikidata` times the build phases of the two one-time corpus
builds individually (fresh session per phase set).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kgforge.session import build_session  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default=None, help="dir to write plans into")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--phases", default=None, choices=["engine", "wikidata"])
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app="kgforge-bench-extra", master=f"local[{cpus}]",
                          shuffle_partitions=2 * cpus)

    import __spark_entry__ as entry

    if not args.no_warm:
        from bench import warm_python_workers

        warm_python_workers(spark)
        spark.catalog.clearCache()

    out: dict[str, float] = {}

    if args.phases == "engine":
        t0 = time.time()
        entry._engine_quads(spark, args.sf).count()
        out["engine_build_total"] = round(time.time() - t0, 3)
    elif args.phases == "wikidata":
        t0 = time.time()
        entry._wd_quads(spark, args.sf).count()
        out["wikidata_build_total"] = round(time.time() - t0, 3)

    qs = entry.queries()
    for name in args.queries:
        df = qs[name](spark, args.sf)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.explain, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        best = float("inf")
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            _force(qs[name](spark, args.sf))
            best = min(best, time.time() - t0)
            spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)

    print(json.dumps({"sf": args.sf, "cpus": cpus, "queries": out}))


if __name__ == "__main__":
    main()
