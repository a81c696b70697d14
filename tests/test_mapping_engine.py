"""Mapping engine: rule-driven typing, first-template-wins, consistency
split (mappings/MappingExtractor.scala, TemplateMapping.scala:40-53,
SimplePropertyMapping.scala, scripts/TypeConsistencyCheck.scala)."""

from kgforge.mapping_engine import type_by_range, type_consistency
from kgforge.namespaces import RDF_LANGSTRING, XSD_DATE
from kgforge.ontology import DBO, OWL_THING, default_ontology


def test_type_by_range_object():
    v, dt, si = type_by_range("en", "[[Some Place]]", "object", DBO + "Person")
    assert v == "http://dbpedia.org/resource/Some_Place" and dt is None


def test_type_by_range_scalars():
    assert type_by_range("en", "12,345", "datatype", "http://www.w3.org/2001/XMLSchema#nonNegativeInteger")[0] == "12345"
    assert type_by_range("en", "-5", "datatype", "http://www.w3.org/2001/XMLSchema#nonNegativeInteger") is None
    v, dt, _ = type_by_range("en", "3 June 1981", "datatype", "http://www.w3.org/2001/XMLSchema#date")
    assert (v, dt) == ("1981-06-03", XSD_DATE)
    v, dt, _ = type_by_range("en", "free text", "datatype", RDF_LANGSTRING)
    assert (v, dt) == ("free text", RDF_LANGSTRING)


def test_type_by_range_unit_si():
    v, dt, si = type_by_range("en", "33.5 km2", "unit", "Area")
    assert v == repr(33.5e6) and dt.endswith("#double") and si == 33.5e6


def test_ontology_disjointness():
    o = default_ontology()
    assert o.is_disjoint(DBO + "Settlement", DBO + "Person")
    assert not o.is_disjoint(DBO + "Settlement", DBO + "PopulatedPlace")
    assert o.closure(DBO + "Settlement")[-1] == OWL_THING


def test_type_consistency_routing(spark):
    schema = (
        "language string, dataset string, subject string, predicate string, "
        "value string, context string, datatype string"
    )
    leader = DBO + "leader"
    succ = DBO + "successor"
    rows = [
        # s1 typed Settlement; leader→o1 (typed Settlement → disjoint range)
        ("en", "instance_types", "s1", "t", DBO + "Settlement", None, None),
        ("en", "instance_types", "o1", "t", DBO + "Settlement", None, None),
        ("en", "mappingbased_objects_uncleaned", "s1", leader, "o1", None, None),
        # leader→o2 untyped → cleaned
        ("en", "mappingbased_objects_uncleaned", "s1", leader, "o2", None, None),
        # successor range owl:Thing → cleaned
        ("en", "mappingbased_objects_uncleaned", "s1", succ, "o1", None, None),
        # leader→p1 typed Person (subtype of range) → cleaned
        ("en", "instance_types", "p1", "t", DBO + "Person", None, None),
        ("en", "mappingbased_objects_uncleaned", "s1", leader, "p1", None, None),
    ]
    quads = spark.createDataFrame(rows, schema)
    out = {(r.value, r.dataset) for r in type_consistency(quads).collect()}
    assert ("o1", "mappingbased_objects_disjoint_range") in out
    assert ("o2", "mappingbased_objects") in out
    assert ("p1", "mappingbased_objects") in out
    assert ("o1", "mappingbased_objects") in out  # the successor quad
