"""Harvest the real community template-mapping dumps into a JSON fixture.

The reference ships the mappings-wiki exports its ConfigLoader consumes
(``/root/reference/mappings/Mapping_<lang>.xml`` — 51 languages, the REAL
community mapping rules, e.g. en {{Infobox person}} → Person with ~100
PropertyMappings). This tool extracts every ``Mapping xx:<Template>`` page's
wikitext into ``kgforge/fixtures/mappings_dump/<lang>.json.gz``:

    {"Infobox person": "{{TemplateMapping\n| mapToClass = Person\n...", ...}

consumed by ``mappings_loader.load_dump_mappings(lang)`` — the engine's OWN
wikitext parser turns each page into rule objects, exactly like the curated
fixture pages.

Usage: python tools/harvest_mappings.py [lang ...]   (default: all)
"""

from __future__ import annotations

import gzip
import json
import re
import sys
import xml.etree.ElementTree as ET
from pathlib import Path

SRC_DIR = Path("/root/reference/mappings")
OUT_DIR = Path(__file__).resolve().parent.parent / "kgforge" / "fixtures" / "mappings_dump"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def harvest(lang: str) -> int:
    src = SRC_DIR / f"Mapping_{lang}.xml"
    pages: dict[str, str] = {}
    title = None
    in_rev = False
    for event, el in ET.iterparse(str(src), events=("start", "end")):
        tag = _local(el.tag)
        if event == "start":
            if tag == "page":
                title, in_rev = None, False
            elif tag == "revision":
                in_rev = True
            continue
        if tag == "title" and not in_rev:
            title = el.text or ""
        elif tag == "text" and title:
            # "Mapping en:Infobox person" → "Infobox person"
            m = re.match(r"^Mapping(?:\s+[a-z-]+)?:(.+)$", title)
            if m and el.text:
                pages[m.group(1).strip()] = el.text
        elif tag == "page":
            el.clear()
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    out = OUT_DIR / f"{lang}.json.gz"
    with gzip.open(out, "wt", encoding="utf-8") as fh:
        json.dump(pages, fh, ensure_ascii=False, sort_keys=True, separators=(",", ":"))
    print(f"{lang}: {len(pages)} mapping pages → {out} ({out.stat().st_size} bytes)")
    return len(pages)


def main() -> None:
    langs = sys.argv[1:] or sorted(
        p.stem.split("_", 1)[1] for p in SRC_DIR.glob("Mapping_*.xml")
    )
    total = sum(harvest(lg) for lg in langs)
    print(f"total: {total} pages across {len(langs)} languages")


if __name__ == "__main__":
    main()
