"""Harvest the full DBpedia ontology into a JSON fixture.

The reference ships the complete generated ontology (``/root/reference/
ontology.owl``, ~790 classes / ~3000 properties, generated from the public
mappings wiki — the same artifact its OntologyReader consumes). This tool
parses the OWL/RDF-XML with stdlib ElementTree and emits
``kgforge/fixtures/ontology_full.json``:

    {"classes": {iri: {"sub": first-dbo-super-or-null,
                       "disjoint": [iris...]}},
     "properties": {iri: {"kind": "object"|"datatype",
                          "range": iri-or-null, "domain": iri-or-null}}}

Loaded by ``kgforge.ontology.full_ontology()``. The small hand-curated
fixture (``fixtures/ontology.wiki``) stays the default for the synthetic
corpora and their SQL oracles; the full ontology is the real-dump /
production configuration.

Usage: python tools/harvest_ontology.py
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET
from pathlib import Path

SRC = Path("/root/reference/ontology.owl")
OUT = Path(__file__).resolve().parent.parent / "kgforge" / "fixtures" / "ontology_full.json"

RDF = "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}"
RDFS = "{http://www.w3.org/2000/01/rdf-schema#}"
OWL = "{http://www.w3.org/2002/07/owl#}"
DBO = "http://dbpedia.org/ontology/"
OWL_THING = "http://www.w3.org/2002/07/owl#Thing"


def main() -> None:
    root = ET.parse(SRC).getroot()
    classes: dict[str, dict] = {}
    properties: dict[str, dict] = {}

    for el in root:
        about = el.get(RDF + "about")
        if not about:
            continue
        tag = el.tag
        if tag == OWL + "Class":
            supers = [s.get(RDF + "resource") for s in el.findall(RDFS + "subClassOf")]
            supers = [s for s in supers if s]
            # prefer a dbo: parent (external DUL/schema parents exist too);
            # a dbo class whose only parents are external roots at owl:Thing
            dbo_super = next((s for s in supers if s.startswith(DBO)), None)
            if dbo_super is None and any(s == OWL_THING for s in supers):
                dbo_super = None
            elif dbo_super is None and supers:
                dbo_super = None  # external-only parent → treat as root
            disjoint = [d.get(RDF + "resource") for d in el.findall(OWL + "disjointWith")]
            classes[about] = {
                "sub": dbo_super,
                "disjoint": sorted(d for d in disjoint if d),
            }
        elif tag in (OWL + "ObjectProperty", OWL + "DatatypeProperty"):
            rng = el.find(RDFS + "range")
            dom = el.find(RDFS + "domain")
            properties[about] = {
                "kind": "object" if tag == OWL + "ObjectProperty" else "datatype",
                "range": rng.get(RDF + "resource") if rng is not None else None,
                "domain": dom.get(RDF + "resource") if dom is not None else None,
            }

    OUT.parent.mkdir(parents=True, exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as fh:
        json.dump({"classes": classes, "properties": properties}, fh,
                  ensure_ascii=False, sort_keys=True, separators=(",", ":"))
    n_dis = sum(len(c["disjoint"]) for c in classes.values())
    print(f"wrote {OUT}: {len(classes)} classes, {len(properties)} properties, "
          f"{n_dis} disjointWith edges")


if __name__ == "__main__":
    main()
