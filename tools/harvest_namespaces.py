"""Harvest per-language MediaWiki namespace names into a JSON fixture.

The reference ships the MediaWiki i18n namespace tables as generated Scala
data (wikiparser/impl/wikipedia/Namespaces.scala — one ``LinkedHashMap`` per
language, itself generated from the public MediaWiki API per the file
header). This tool re-expresses that DATA (not code) as
``kgforge/fixtures/namespace_aliases.json``:

    {"ar": {"تصنيف": 14, "ملف": 6, ...}, ...}

keyed by language code, names lower-cased (namespace match is
case-insensitive, WikiTitle.scala:114-184). Only content-relevant codes are
kept (>= -2); talk pages ride along so links classify correctly.

Usage: python tools/harvest_namespaces.py [path-to-Namespaces.scala]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

DEFAULT_SRC = (
    "/root/reference/core/src/main/scala/org/dbpedia/extraction/"
    "wikiparser/impl/wikipedia/Namespaces.scala"
)
OUT = Path(__file__).resolve().parent.parent / "kgforge" / "fixtures" / "namespace_aliases.json"

_DEF_RE = re.compile(r"private def (\w+)_namespaces = LinkedHashMap\((.*)\)\s*$", re.M)
_ENTRY_RE = re.compile(r'"((?:[^"\\]|\\.)*)"\s*->\s*(-?\s*\d+)')
_MAP_RE = re.compile(r'"([^"]+)"\s*->\s*(\w+)_namespaces')


def main() -> None:
    src = Path(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC)
    text = src.read_text(encoding="utf-8")

    # def-name -> language code (bat_smg_namespaces -> "bat-smg")
    def_to_lang = {d: lang for lang, d in _MAP_RE.findall(text)}

    tables: dict[str, dict[str, int]] = {}
    for m in _DEF_RE.finditer(text.replace("\r", "")):
        def_name, body = m.group(1), m.group(2)
        lang = def_to_lang.get(def_name, def_name.replace("_", "-"))
        table: dict[str, int] = {}
        for name, code in _ENTRY_RE.findall(body):
            code = int(code.replace(" ", ""))
            name = name.strip().lower()
            if not name or code < 0:
                continue
            table[name] = code
        if table:
            tables[lang] = table

    OUT.parent.mkdir(parents=True, exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as fh:
        json.dump(tables, fh, ensure_ascii=False, sort_keys=True, separators=(",", ":"))
    sizes = sorted(len(t) for t in tables.values())
    print(f"wrote {OUT}: {len(tables)} languages, "
          f"{sum(sizes)} aliases (median {sizes[len(sizes)//2]}/lang)")


if __name__ == "__main__":
    main()
