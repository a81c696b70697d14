"""Data-driven MappingsLoader + OntologyReader (MappingsLoader.scala:24-160,
ontology/io/OntologyReader): the fixture data files must reproduce the
engine's rule set, and rule changes must require no code edits."""

from kgforge.mapping_engine import default_mappings
from kgforge.mappings_loader import load_mappings, load_ontology, parse_mapping_page
from kgforge.ontology import DBO, _legacy_ontology, default_ontology


def test_ontology_file_reproduces_legacy_fixture():
    a, b = default_ontology(), _legacy_ontology()
    assert a.classes == b.classes
    assert {k: (p.kind, p.range, p.domain) for k, p in a.properties.items()} == {
        k: (p.kind, p.range, p.domain) for k, p in b.properties.items()
    }
    assert {frozenset(x) for x in a.disjoint} == {frozenset(x) for x in b.disjoint}
    assert a.specializations == b.specializations


def test_mapping_files_loaded():
    mp = default_mappings()
    assert set(mp) == {"infobox settlement", "infobox person", "infobox document"}
    s = mp["infobox settlement"]
    assert s.map_to_class == DBO + "Settlement"
    assert [(r.template_property, r.ontology_property) for r in s.rules] == [
        ("population", DBO + "populationTotal"),
        ("area_km2", DBO + "areaTotal"),
        ("established", DBO + "foundingDate"),
        ("leader_name", DBO + "leader"),
        ("successor", DBO + "successor"),
        ("motto", DBO + "motto"),
        ("twin_country", DBO + "twinCountry"),
    ]
    assert [(c.template_property_1, c.template_property_2, c.ontology_property)
            for c in s.calculates] == [("area_land", "area_water", DBO + "areaTotal")]
    assert [(g.coordinates, g.latitude, g.longitude) for g in s.geo] == [("coords", None, None)]
    assert [(c.template_property, c.operator, c.value, c.map_to_class) for c in s.conditions] == [
        ("settlement_type", "equals", "City", DBO + "City")
    ]
    assert s.constants == [(DBO + "country", "http://dbpedia.org/resource/Example_Land", None)]
    assert [(i.template_property, i.start_property, i.end_property) for i in s.intervals] == [
        ("mayor_term", DBO + "activeYearsStartYear", DBO + "activeYearsEndYear")
    ]
    im = s.intermediates[0]
    assert im.node_class == DBO + "Government" and im.link_property == DBO + "government"
    assert [(r.template_property, r.ontology_property) for r in im.rules] == [
        ("gov_type", DBO + "governmentType"),
        ("gov_seat", DBO + "seat"),
    ]


def test_new_mapping_needs_no_code(tmp_path):
    """Adding a mapping = dropping a data file in the directory."""
    d = tmp_path / "mappings" / "en"
    d.mkdir(parents=True)
    (d / "Infobox ship.wiki").write_text(
        "{{TemplateMapping\n| mapToClass = Work\n| mappings =\n"
        "  {{PropertyMapping | templateProperty = name | ontologyProperty = foaf:name | select = first}}\n"
        "  {{PropertyMapping | templateProperty = callsign | ontologyProperty = motto "
        "| prefix = CS: | suffix = !}}\n}}\n"
    )
    mp = load_mappings("en", base_dir=tmp_path)
    ship = mp["infobox ship"]
    assert ship.map_to_class == DBO + "Work"
    assert ship.rules[0].select == "first"
    assert ship.rules[1].prefix == "CS:" and ship.rules[1].suffix == "!"


def test_select_and_transform_applied(spark):
    """select=first picks one of the <br>-split values; prefix/suffix wrap
    the literal (SimplePropertyMapping.scala:34-65)."""
    from kgforge.mapping_engine import TemplateMapping, PropertyRule, mapping_quads
    from kgforge.parse import prepare
    from kgforge.vocab import MAPPINGBASED_LITERALS

    rows = [("r", "a/Thing.wiki", "c", "en",
             "{{Infobox test\n| motto = alpha<br>beta\n| tag = x\n}}\n")]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    mp = {"infobox test": TemplateMapping("infobox test", DBO + "Work", [
        PropertyRule("motto", DBO + "motto", select="first"),
        PropertyRule("tag", DBO + "governmentType", prefix="pre-", suffix="-post"),
    ])}
    got = {(r.predicate, r.value) for r in
           mapping_quads(prepare(corpus), mappings=mp)
           .filter("dataset = '%s'" % MAPPINGBASED_LITERALS).collect()}
    assert (DBO + "motto", "alpha") in got
    assert (DBO + "motto", "beta") not in got
    assert (DBO + "governmentType", "pre-x-post") in got


def test_multivalue_split_without_select(spark):
    from kgforge.mapping_engine import TemplateMapping, PropertyRule, mapping_quads
    from kgforge.parse import prepare
    from kgforge.vocab import MAPPINGBASED_LITERALS

    rows = [("r", "a/Thing2.wiki", "c", "en",
             "{{Infobox test\n| motto = alpha<br>beta\n| pad = 1\n}}\n")]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    mp = {"infobox test": TemplateMapping("infobox test", DBO + "Work", [
        PropertyRule("motto", DBO + "motto"),
    ])}
    got = {r.value for r in mapping_quads(prepare(corpus), mappings=mp)
           .filter("dataset = '%s'" % MAPPINGBASED_LITERALS).collect()}
    assert {"alpha", "beta"} <= got


def test_parse_mapping_page_rejects_rootless():
    import pytest
    with pytest.raises(ValueError):
        parse_mapping_page("x", "no templates here")


def test_real_dump_mappings_load():
    """The shipped community mapping dumps parse into rule objects
    (tools/harvest_mappings.py fixture; 7,305 pages / 51 languages)."""
    from kgforge.mappings_loader import load_dump_mappings

    m, skipped = load_dump_mappings("en")
    assert len(m) >= 700 and skipped <= 5
    person = m["infobox person"]
    assert person.map_to_class.endswith("/Person")
    assert any(r.template_property == "birth_place" for r in person.rules)
    # ConditionalMapping-rooted page: branch classes come from the NESTED
    # TemplateMappings, default = the otherwise branch
    company = m["infobox company"]
    assert company.map_to_class.endswith("/Company")
    assert [(c.operator, c.map_to_class.rsplit("/", 1)[-1]) for c in company.conditions] == [
        ("contains", "Bank"), ("contains", "Bank"), ("otherwise", "Company"),
    ]
    # mapping-page redirects alias to the target's rules
    assert "infobox cyclist" in m or "infobox swimmer" in m  # redirect family exists
    de, _ = load_dump_mappings("de")
    assert len(de) >= 300


def test_validate_mapping_page_clean_fixture():
    """The shipped fixture pages validate clean (the server's Validate
    endpoint analog, Mappings.scala:228-281)."""
    from pathlib import Path

    from kgforge.mappings_loader import FIXTURES_DIR, validate_mapping_page

    text = (Path(FIXTURES_DIR) / "mappings" / "en" / "Infobox person.wiki").read_text()
    assert validate_mapping_page("Infobox person", text) == []


def test_validate_mapping_page_diagnostics():
    from kgforge.mappings_loader import validate_mapping_page

    # unknown class + unknown property → warnings, page still loads
    bad = """{{TemplateMapping
| mapToClass = Xenomorph
| mappings =
  {{PropertyMapping | templateProperty = name | ontologyProperty = foaf:name }}
  {{PropertyMapping | templateProperty = zap | ontologyProperty = zapCount }}
}}"""
    diags = validate_mapping_page("Infobox xeno", bad)
    msgs = " | ".join(d["message"] for d in diags)
    assert any(d["level"] == "warning" and "Xenomorph" in d["message"] for d in diags), msgs
    assert any("zapCount" in d["message"] for d in diags), msgs
    # a PropertyMapping without an ontologyProperty is severe
    sev = validate_mapping_page(
        "Infobox s",
        "{{TemplateMapping | mapToClass = Person | mappings = "
        "{{PropertyMapping | templateProperty = name }} }}",
    )
    assert any(d["level"] == "severe" for d in sev)
    # a class-only mapping (stub-template typing) is VALID
    assert validate_mapping_page(
        "Infobox e", "{{TemplateMapping | mapToClass = Person }}"
    ) == []
    # not a mapping page at all → severe parse error
    notmap = validate_mapping_page("X", "just some '''article''' text")
    assert notmap[0]["level"] == "severe"


def test_validate_community_dump_sample():
    """Real community pages validate without severe findings (warnings are
    allowed: the community references properties the shipped ontology
    artifact may lack)."""
    from kgforge.mappings_loader import load_dump_mappings_raw, validate_mapping_page

    pages = load_dump_mappings_raw("en")
    sample = [
        (n, t)
        for n, t in sorted(pages.items())
        if "TemplateMapping" in t and "#REDIRECT" not in t[:64]
    ][:25]
    assert len(sample) == 25
    for name, text in sample:
        diags = validate_mapping_page(name, text)
        assert not any(d["level"] == "severe" for d in diags), (name, diags)
