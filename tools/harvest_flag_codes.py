"""Harvest the per-language flag-template country-code tables into a JSON
fixture.

The reference ships ISO3-code → localized-country-name maps for 10
languages as generated Scala data
(config/dataparser/FlagTemplateParserConfig.scala:44-2875 ``baseLangCodeMap``
— country names from the public CLDR/Wikipedia data). This tool re-expresses
that DATA as ``kgforge/fixtures/flag_codes.json``:

    {"fr": {"FRA": "France", ...}, ...}

For languages without a table the reference falls back to Java Locale
display names; the engine keeps its small built-in en map + the
capitalize-passthrough fallback instead (documented divergence — the JDK
locale data is not available here).

Usage: python tools/harvest_flag_codes.py
"""

from __future__ import annotations

import json
import re
from pathlib import Path

SRC = Path(
    "/root/reference/core/src/main/scala/org/dbpedia/extraction/config/"
    "dataparser/FlagTemplateParserConfig.scala"
)
OUT = Path(__file__).resolve().parent.parent / "kgforge" / "fixtures" / "flag_codes.json"


def main() -> None:
    text = SRC.read_text(encoding="utf-8")
    m = re.search(r"baseLangCodeMap = Map\((.*?)\n\s*private lazy val iocToIsoMap", text, re.S)
    block = m.group(1)
    tables: dict[str, dict[str, str]] = {}
    for lm in re.finditer(r'"([a-z-]+)"\s*->\s*\n?\s*Map\(\s*\n(.*?)\n\s*\)', block, re.S):
        lang, body = lm.group(1), lm.group(2)
        entries = dict(re.findall(r'"([^"]+)"\s*->\s*"([^"]+)"', body))
        if entries:
            tables[lang] = entries
    OUT.parent.mkdir(parents=True, exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as fh:
        json.dump(tables, fh, ensure_ascii=False, sort_keys=True, separators=(",", ":"))
    print(f"wrote {OUT}: {len(tables)} languages, "
          f"{sum(len(t) for t in tables.values())} codes")


if __name__ == "__main__":
    main()
