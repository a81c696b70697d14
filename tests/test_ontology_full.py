"""The complete harvested DBpedia ontology (fixtures/ontology_full.json —
790 classes / 3,024 properties from the artifact the reference ships)."""

from kgforge.ontology import DBO, OWL_THING, default_ontology, full_ontology


def test_full_ontology_shape():
    o = full_ontology()
    assert len(o.classes) >= 790
    assert len(o.properties) >= 3000
    # deep real chains resolve through the tree
    assert o.closure(DBO + "MilitaryPerson")[:3] == [
        DBO + "MilitaryPerson", DBO + "Person", DBO + "Agent",
    ]
    assert o.closure(DBO + "Village")[-1] == OWL_THING
    assert DBO + "PopulatedPlace" in o.closure(DBO + "City")
    # real properties with ranges
    assert o.properties[DBO + "populationTotal"].range.endswith("nonNegativeInteger")
    assert o.properties[DBO + "birthPlace"].kind == "object"
    # disjointness from the OWL dump propagates through closures
    assert o.is_disjoint(DBO + "MilitaryPerson", DBO + "TimePeriod")
    assert not o.is_disjoint(DBO + "City", DBO + "Settlement")


def test_curated_fixture_wins_on_conflict():
    base = default_ontology()
    o = full_ontology()
    # every curated class/property keeps its curated definition (the small
    # fixture carries unit specializations + enums the OWL dump lacks)
    for iri, sup in base.classes.items():
        assert o.classes[iri] == sup
    for iri in base.properties:
        assert o.properties[iri].range == base.properties[iri].range
    assert o.specializations == base.specializations


def test_full_ontology_drives_sd_types(spark):
    """SD-Type scoring runs with the full ontology (the real-dump config)."""
    from kgforge.sdtypes import sd_type_scores

    types = spark.createDataFrame(
        [(f"r:{i}", DBO + "MilitaryPerson") for i in range(10)]
        + [(f"p:{i}", DBO + "Village") for i in range(10)],
        "subject string, value string",
    )
    # u:* are UNTYPED targets of birthPlace edges whose other typed targets
    # are Villages — SD-Type should suggest a type for them
    objs = spark.createDataFrame(
        [(f"r:{i}", DBO + "birthPlace", f"p:{i}") for i in range(10)]
        + [(f"r:{i}", DBO + "birthPlace", f"u:{i}") for i in range(10)],
        "subject string, predicate string, object string",
    )
    out = sd_type_scores(types, objs, ontology=full_ontology(), threshold=0.01)
    rows = out.collect()
    assert rows and all(r.subject.startswith("u:") for r in rows)
    assert all(r.value == DBO + "Village" for r in rows)
