"""Convert the reference's minidump regression corpus into the engine's
tabular corpus fixture.

The reference validates its extractors against 125 curated real-wiki page
samples (``dump/src/test/resources/minidumps/<lang>/wiki.xml.bz2``, harness
``dump/src/test/scala/.../MinidumpTests.scala:12-18``). This tool streams
those MediaWiki XML exports (stdlib bz2 + ElementTree, offline) and emits
one parquet table in the engine's corpus schema
``(repo, path, commit, lang, content)`` —
``tests/fixtures/minidump/corpus.parquet`` — so the SAME real wikitext pages
flow through the PySpark pipeline in tests (tests/test_minidump.py).

Title ↔ path contract (kgforge/parse.py derive_page_columns): path =
``pages/<Canonical:Title>.wiki`` with spaces→``_`` and ``/``→``%2F``; the
namespace prefix is rewritten to its canonical English name from the dump's
``<ns>`` code so page-level namespace derivation is language-independent
(localized prefixes inside LINKS are handled by the i18n alias table,
kgforge/fixtures/namespace_aliases.json).

Usage: python tools/minidump_to_corpus.py [--langs en,ja,ar | --all] [--out DIR]
"""

from __future__ import annotations

import argparse
import bz2
import sys
import xml.etree.ElementTree as ET
from pathlib import Path

MINIDUMPS = Path("/root/reference/dump/src/test/resources/minidumps")
DEFAULT_OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "minidump"

# pipeline-gated namespaces (kgforge/parse.py prepare default)
CANONICAL_PREFIX = {0: "", 6: "File:", 10: "Template:", 14: "Category:"}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def pages_of(xml_bz2: Path):
    """Yield (title, ns, rev_id, text) for each page, streaming."""
    with bz2.open(xml_bz2, "rb") as fh:
        page = {}
        in_rev = False
        for event, el in ET.iterparse(fh, events=("start", "end")):
            tag = _local(el.tag)
            if event == "start":
                if tag == "page":
                    page = {"ns": 0, "rev_id": 0, "text": ""}
                    in_rev = False
                elif tag == "revision":
                    in_rev = True
                continue
            if tag == "title" and not in_rev:
                page["title"] = el.text or ""
            elif tag == "ns" and not in_rev:
                page["ns"] = int(el.text or 0)
            elif tag == "id" and in_rev and not page.get("rev_id"):
                page["rev_id"] = int(el.text or 0)
            elif tag == "text":
                page["text"] = el.text or ""
            elif tag == "model":
                page["model"] = el.text or ""
            elif tag == "page":
                if page.get("model", "wikitext") == "wikitext":
                    yield page["title"], page["ns"], page["rev_id"], page["text"]
                el.clear()


def title_to_path(title: str, ns: int) -> str | None:
    prefix = CANONICAL_PREFIX.get(ns)
    if prefix is None:
        return None
    rest = title.split(":", 1)[1] if ns != 0 and ":" in title else title
    stem = (prefix + rest.strip()).replace(" ", "_").replace("/", "%2F")
    if not stem:
        return None
    return f"pages/{stem}.wiki"


def write_wikidata_corpus(out_dir: Path) -> None:
    """The wikidata minidump's 47 entity pages (13 wikibase-item, 5
    wikibase-property, 29 wikibase-lexeme — real Wikidata JSON) as a second
    fixture, ``wikidata_corpus.parquet``, for the wikidata extractor group
    (terms/raw/reified/R2R + property/reference/lexeme/ns-sameAs)."""
    rows = []
    with bz2.open(MINIDUMPS / "wikidata" / "wiki.xml.bz2", "rb") as fh:
        page = {}
        in_rev = False
        for event, el in ET.iterparse(fh, events=("start", "end")):
            tag = _local(el.tag)
            if event == "start":
                if tag == "page":
                    page = {"rev_id": 0}
                    in_rev = False
                elif tag == "revision":
                    in_rev = True
                continue
            if tag == "title" and not in_rev:
                page["title"] = el.text or ""
            elif tag == "id" and in_rev and not page.get("rev_id"):
                page["rev_id"] = int(el.text or 0)
            elif tag == "text":
                page["text"] = el.text or ""
            elif tag == "model":
                page["model"] = el.text or ""
            elif tag == "page":
                if page.get("model", "").startswith("wikibase-"):
                    entity_id = page["title"].rsplit(":", 1)[-1]
                    rows.append(
                        {
                            "repo": "minidumps/wikidata.org",
                            "path": f"entities/{entity_id}.json",
                            "commit": f"rev{page['rev_id']}",
                            "lang": "wikidata",
                            "content": page["text"],
                        }
                    )
                el.clear()

    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [(c, pa.string()) for c in ("repo", "path", "commit", "lang", "content")]
        ),
    )
    dest = out_dir / "wikidata_corpus.parquet"
    pq.write_table(table, dest, compression="zstd")
    print(f"wrote {dest}: {len(rows)} entities, {dest.stat().st_size} bytes")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--langs", default="all",
                    help="comma-separated minidump dirs, or 'all'")
    ap.add_argument("--out", default=str(DEFAULT_OUT))
    ap.add_argument("--wikidata", action="store_true",
                    help="also write wikidata_corpus.parquet (entity JSON)")
    args = ap.parse_args()
    if args.wikidata:
        out = Path(args.out)
        out.mkdir(parents=True, exist_ok=True)
        write_wikidata_corpus(out)
        return

    if args.langs == "all":
        langs = sorted(d.name for d in MINIDUMPS.iterdir() if (d / "wiki.xml.bz2").exists())
    else:
        langs = args.langs.split(",")

    rows = []
    for d in langs:
        lang = {"wikidata.org": "wikidata"}.get(d, d)
        seen: set[str] = set()
        n = 0
        for title, ns, rev_id, text in pages_of(MINIDUMPS / d / "wiki.xml.bz2"):
            path = title_to_path(title, ns)
            if path is None or not text or path in seen:
                continue
            seen.add(path)
            rows.append(
                {
                    "repo": f"minidumps/{d}",
                    "path": path,
                    "commit": f"rev{rev_id}",
                    "lang": lang,
                    "content": text,
                }
            )
            n += 1
        print(f"{d}: {n} pages", file=sys.stderr)

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [(c, pa.string()) for c in ("repo", "path", "commit", "lang", "content")]
        ),
    )
    dest = out / "corpus.parquet"
    pq.write_table(table, dest, compression="zstd")
    print(f"wrote {dest}: {len(rows)} pages, {dest.stat().st_size} bytes")


if __name__ == "__main__":
    main()
