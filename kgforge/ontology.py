"""Ontology: class tree, property definitions, unit specializations,
disjointness (ontology/Ontology.scala:14-21; loaded in the reference from
mappings-wiki pages via OntologyReader, ConfigLoader.scala:375-389).

Ours is a plain-data fixture (config, not code): classes map to supers,
properties carry kind + range + domain, specializations give the
class-scoped unit predicates (SimplePropertyMapping.scala:239-279). Small
enough to broadcast; the closure is precomputed driver-side.
"""

from __future__ import annotations

from dataclasses import dataclass, field

DBO = "http://dbpedia.org/ontology/"
OWL_THING = "http://www.w3.org/2002/07/owl#Thing"
DBPEDIA_DT = "http://dbpedia.org/datatype/"


@dataclass
class Property:
    iri: str
    kind: str                 # "object" | "datatype" | "unit"
    range: str | None = None  # class IRI (object) / xsd datatype / dimension
    domain: str | None = None
    # EnumerationDatatype allowed values: lowercased lexical → canonical
    # (EnumerationParser, dataparser/EnumerationParser.scala)
    enum: dict[str, str] | None = None


@dataclass
class Ontology:
    # class IRI → direct superclass IRI (None for owl:Thing roots)
    classes: dict[str, str | None] = field(default_factory=dict)
    properties: dict[str, Property] = field(default_factory=dict)
    # unordered disjoint class pairs (owl:disjointWith)
    disjoint: set[tuple[str, str]] = field(default_factory=set)
    # (class IRI, property IRI) → (unit_label, to_specific_factor_from_SI, datatype IRI)
    specializations: dict[tuple[str, str], tuple[str, float, str]] = field(default_factory=dict)

    def closure(self, cls: str) -> list[str]:
        """cls + all supers up to owl:Thing (cycle-safe)."""
        out, seen = [], set()
        cur: str | None = cls
        while cur is not None and cur not in seen:
            out.append(cur)
            seen.add(cur)
            cur = self.classes.get(cur)
        if OWL_THING not in seen:
            out.append(OWL_THING)
        return out

    def is_disjoint(self, a: str, b: str) -> bool:
        """True iff any ancestor pair is declared disjoint
        (TypeConsistencyCheck isDisjoined semantics)."""
        ca, cb = self.closure(a), self.closure(b)
        for x in ca:
            for y in cb:
                if (x, y) in self.disjoint or (y, x) in self.disjoint:
                    return True
        return False


def default_ontology() -> Ontology:
    """Ontology covering the synthetic + driver corpora, loaded from the
    data file ``kgforge/fixtures/ontology.wiki`` (OntologyReader analog —
    class/property changes are data edits, not code edits)."""
    from .mappings_loader import cached_ontology

    return cached_ontology()


def _legacy_ontology() -> Ontology:
    """Pre-loader hard-coded fixture, kept ONLY as the equivalence pin for
    tests/test_mappings_loader.py (proves the data files reproduce it)."""
    c = {
        DBO + "Place": None,
        DBO + "PopulatedPlace": DBO + "Place",
        DBO + "Settlement": DBO + "PopulatedPlace",
        DBO + "City": DBO + "Settlement",
        DBO + "Agent": None,
        DBO + "Person": DBO + "Agent",
        DBO + "Organisation": DBO + "Agent",
        DBO + "Work": None,
        DBO + "Document": DBO + "Work",
        DBO + "Government": None,
    }
    props = {
        DBO + "populationTotal": Property(DBO + "populationTotal", "datatype",
                                          "http://www.w3.org/2001/XMLSchema#nonNegativeInteger",
                                          DBO + "PopulatedPlace"),
        DBO + "areaTotal": Property(DBO + "areaTotal", "unit", "Area", DBO + "Place"),
        DBO + "foundingDate": Property(DBO + "foundingDate", "datatype",
                                       "http://www.w3.org/2001/XMLSchema#date", None),
        DBO + "birthDate": Property(DBO + "birthDate", "datatype",
                                    "http://www.w3.org/2001/XMLSchema#date", DBO + "Person"),
        DBO + "deathDate": Property(DBO + "deathDate", "datatype",
                                    "http://www.w3.org/2001/XMLSchema#date", DBO + "Person"),
        DBO + "leader": Property(DBO + "leader", "object", DBO + "Person", DBO + "Place"),
        DBO + "successor": Property(DBO + "successor", "object", OWL_THING, None),
        DBO + "motto": Property(DBO + "motto", "datatype",
                                "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", None),
        DBO + "numberOfCharacters": Property(DBO + "numberOfCharacters", "datatype",
                                             "http://www.w3.org/2001/XMLSchema#nonNegativeInteger", None),
        DBO + "publicationDate": Property(DBO + "publicationDate", "datatype",
                                          "http://www.w3.org/2001/XMLSchema#date", None),
        "http://xmlns.com/foaf/0.1/name": Property("http://xmlns.com/foaf/0.1/name", "datatype",
                                                   "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
                                                   None),
        DBO + "government": Property(DBO + "government", "object", DBO + "Government", DBO + "Place"),
        DBO + "seat": Property(DBO + "seat", "object", None, DBO + "Government"),
        DBO + "governmentType": Property(DBO + "governmentType", "datatype",
                                         "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", None),
        DBO + "activeYearsStartYear": Property(DBO + "activeYearsStartYear", "datatype",
                                               "http://www.w3.org/2001/XMLSchema#gYear", None),
        DBO + "activeYearsEndYear": Property(DBO + "activeYearsEndYear", "datatype",
                                             "http://www.w3.org/2001/XMLSchema#gYear", None),
        DBO + "country": Property(DBO + "country", "object", None, None),
        DBO + "twinCountry": Property(DBO + "twinCountry", "object", None, None),
        DBO + "genderCode": Property(DBO + "genderCode", "datatype",
                                     "http://www.w3.org/2001/XMLSchema#string", None,
                                     enum={"m": "male", "f": "female"}),
    }
    o = Ontology(classes=c, properties=props)
    o.disjoint.add((DBO + "Place", DBO + "Agent"))
    o.disjoint.add((DBO + "Work", DBO + "Agent"))
    # Settlement/areaTotal reported in km² (specific property,
    # SimplePropertyMapping.scala:239-279)
    o.specializations[(DBO + "Settlement", DBO + "areaTotal")] = (
        "km2", 1.0 / 1e6, DBPEDIA_DT + "squareKilometre"
    )
    return o


_FULL_CACHE: dict = {}  # caches the default-base result only (ADVICE r5 fix:
# a custom ``base`` is never cached — id()-keying could alias a GC'd object)


def full_ontology(base: Ontology | None = None) -> Ontology:
    """The COMPLETE DBpedia ontology (790 classes / 3,024 properties /
    disjointness), loaded from ``fixtures/ontology_full.json`` — harvested
    by tools/harvest_ontology.py from the generated artifact the reference
    ships (``/root/reference/ontology.owl``, the OntologyReader input).

    The small hand-curated fixture (``default_ontology``) remains the
    default for the synthetic corpora and their SQL oracles; this is the
    real-dump / production configuration. The curated entries win on
    conflict (they carry unit specializations + enum values the OWL dump
    does not)."""
    default_base = base is None
    if default_base and None in _FULL_CACHE:
        return _FULL_CACHE[None]
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "fixtures", "ontology_full.json")
    with open(path, encoding="utf-8") as fh:
        raw = json.load(fh)
    base = base or default_ontology()
    classes: dict[str, str | None] = {
        iri: spec["sub"] for iri, spec in raw["classes"].items()
    }
    classes.update(base.classes)
    props = {
        iri: Property(iri=iri, kind=spec["kind"], range=spec["range"], domain=spec["domain"])
        for iri, spec in raw["properties"].items()
    }
    props.update(base.properties)
    disjoint = set(base.disjoint)
    for iri, spec in raw["classes"].items():
        for d in spec["disjoint"]:
            disjoint.add((iri, d))
    o = Ontology(
        classes=classes,
        properties=props,
        disjoint=disjoint,
        specializations=dict(base.specializations),
    )
    if default_base:
        _FULL_CACHE[None] = o
    return o
