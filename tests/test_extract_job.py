"""jobs/extract.py — the spark-submit entry point, driven in-process.

The pipeline itself is covered by test_pipeline/test_end_to_end; this
pins the CLI contract: arg parsing, synthetic mode, N-Triples export,
the JSON result line, and checkpoint resume through the entry point.
"""

import json
import os
import sys
import tempfile

import pytest


def _run_main(capsys, argv):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs.extract import main

    old = sys.argv
    sys.argv = ["extract.py"] + argv
    try:
        main()
    finally:
        sys.argv = old
    out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    return json.loads(out[-1])

def test_extract_job_synthetic_resume_and_ntriples(spark, capsys):
    wd = tempfile.mkdtemp(prefix="kgforge_extract_job_")
    nt = wd + "/nt"
    res = _run_main(capsys, ["--synthetic", "60", "--workdir", wd, "--ntriples", nt])
    assert res["quads"] > 0 and res["workdir"] == wd
    # N-Triples export landed, partitioned by dataset, parseable lines
    datasets = [d for d in os.listdir(nt) if d.startswith("dataset=")]
    assert "dataset=labels" in datasets
    lines = []
    for root, _, files in os.walk(os.path.join(nt, "dataset=labels")):
        for f in files:
            if not f.startswith(("_", ".")):
                lines += open(os.path.join(root, f)).read().splitlines()
    assert lines and all(l.startswith("<") and l.endswith(" .") for l in lines)
    # resume: same workdir returns the same quad count WITHOUT rewriting
    # the graph stage (checkpoint skip — file mtimes untouched)
    graph_dir = os.path.join(wd, "graph")
    before = {
        f: os.path.getmtime(os.path.join(graph_dir, f)) for f in os.listdir(graph_dir)
    }
    res2 = _run_main(capsys, ["--synthetic", "60", "--workdir", wd])
    assert res2["quads"] == res["quads"]
    after = {
        f: os.path.getmtime(os.path.join(graph_dir, f)) for f in os.listdir(graph_dir)
    }
    assert after == before


def test_extract_job_requires_input(spark, capsys):
    with pytest.raises(SystemExit):
        _run_main(capsys, ["--workdir", tempfile.mkdtemp()])
