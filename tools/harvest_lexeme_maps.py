"""Harvest the WikidataLexemeExtractor's config maps into a JSON fixture.

The reference ships two Q-id → local-name maps as Scala config
(config/mappings/wikidata/WikidataMappingConfig.scala:5-164
``lexicalCategoryMap``, :166-873 ``languagesMap``) used by
WikidataLexemeExtractor.scala:169-207 to mint
``http://lex.dbpedia.org/<name>`` IRIs for a lexeme's lexical category and
language. This tool re-expresses that DATA as
``kgforge/fixtures/wikidata_lexeme_maps.json``:

    {"lexical_category": {"Q1084": "noun", ...},
     "language": {"Q1860": "English", ...}}

Usage: python tools/harvest_lexeme_maps.py
"""

from __future__ import annotations

import json
import re
from pathlib import Path

SRC = Path(
    "/root/reference/core/src/main/scala/org/dbpedia/extraction/config/"
    "mappings/wikidata/WikidataMappingConfig.scala"
)
OUT = (
    Path(__file__).resolve().parent.parent
    / "kgforge"
    / "fixtures"
    / "wikidata_lexeme_maps.json"
)


def _grab(text: str, name: str) -> dict[str, str]:
    m = re.search(rf"val {name} = Map\s*\((.*?)\n\s*\)", text, re.S)
    body = m.group(1)
    return dict(re.findall(r'"([^"]+)"\s*->\s*"([^"]+)"', body))


def main() -> None:
    text = SRC.read_text(encoding="utf-8")
    out = {
        "lexical_category": _grab(text, "lexicalCategoryMap"),
        "language": _grab(text, "languagesMap"),
    }
    OUT.write_text(json.dumps(out, indent=1, ensure_ascii=False, sort_keys=True) + "\n")
    print(
        f"wrote {OUT}: {len(out['lexical_category'])} lexical categories, "
        f"{len(out['language'])} languages"
    )


if __name__ == "__main__":
    main()
