"""Wikidata-JSON extractor core (mappings/wikidata group): labels,
descriptions, aliases, sitelink sameAs, entity-valued claims — pure
from_json/explode plan."""

import json

from kgforge.wikidata import (
    WIKIDATA_ALIASES,
    WIKIDATA_DESCRIPTIONS,
    WIKIDATA_LABELS,
    WIKIDATA_RAW,
    WIKIDATA_SAME_AS,
    wikidata_quads,
)

ENTITY = {
    "id": "Q42",
    "labels": {
        "en": {"language": "en", "value": "Douglas Adams"},
        "de": {"language": "de", "value": "Douglas Adams"},
    },
    "descriptions": {"en": {"language": "en", "value": "English writer"}},
    "aliases": {"en": [{"language": "en", "value": "DNA"}]},
    "sitelinks": {
        "enwiki": {"site": "enwiki", "title": "Douglas Adams"},
        "dewiki": {"site": "dewiki", "title": "Douglas Adams"},
        "commonswiki": {"site": "commonswiki", "title": "Douglas Adams"},
    },
    "claims": {
        "P31": [{"mainsnak": {"snaktype": "value",
                              "datavalue": {"value": {"id": "Q5"}, "type": "wikibase-entityid"}}}],
        # string-valued snak: fixed-schema mismatch → dropped (documented)
        "P18": [{"mainsnak": {"snaktype": "value",
                              "datavalue": {"value": "photo.jpg", "type": "string"}}}],
    },
}


def test_wikidata_entity_quads(spark):
    rows = [
        ("r", "wd/Q42.json", "c", "wikidata", json.dumps(ENTITY)),
        ("r", "wd/garbage.json", "c", "wikidata", "not json at all"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    quads = wikidata_quads(df)
    got = {(r.dataset, r.language, r.predicate, r.value) for r in quads.collect()}
    s = "http://wikidata.dbpedia.org/resource/Q42"
    assert (WIKIDATA_LABELS, "en", "http://www.w3.org/2000/01/rdf-schema#label",
            "Douglas Adams") in got
    assert sum(1 for d, *_ in got if d == WIKIDATA_LABELS) == 2
    assert (WIKIDATA_DESCRIPTIONS, "en", "http://dbpedia.org/ontology/description",
            "English writer") in got
    assert (WIKIDATA_ALIASES, "en", "http://www.w3.org/2004/02/skos/core#altLabel", "DNA") in got
    assert (WIKIDATA_SAME_AS, "en", "http://www.w3.org/2002/07/owl#sameAs",
            "http://dbpedia.org/resource/Douglas_Adams") in got
    assert (WIKIDATA_SAME_AS, "de", "http://www.w3.org/2002/07/owl#sameAs",
            "http://de.dbpedia.org/resource/Douglas_Adams") in got
    assert (WIKIDATA_RAW, "wikidata", "http://www.wikidata.org/prop/direct/P31",
            "http://wikidata.dbpedia.org/resource/Q5") in got
    # commonswiki is 'commonswiki' -> lang 'commons' sitelink: still emitted
    # as a sameAs target by the xxwiki rule; string-valued P18 dropped
    assert not any(v.endswith("photo.jpg") for *_x, v in got)
    subjects = {r.subject for r in quads.collect() if r.dataset == WIKIDATA_LABELS}
    assert subjects == {s}


def test_wikidata_plan_is_jvm_only(spark):
    rows = [("r", "wd/Q1.json", "c", "wikidata", json.dumps(ENTITY))]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    plan = wikidata_quads(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
