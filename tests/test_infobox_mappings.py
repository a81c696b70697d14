"""InfoboxMappings analysis extractors vs the reference's own test tables.

Conditional-expression cases ported from
InfoboxMappingsTemplateExtractorTest.scala:21-135 (compared as sets — the
reference materializes a Set before listing) and the tuple-miner cases from
InfoboxMappingsExtractorTest.scala:23-360 (compared as lists, document
order).
"""

from __future__ import annotations

import pytest

from kgforge.infobox_mappings import (
    analyze_page,
    extract_tuples,
    infobox_mappings_quads,
    mapping_suggestion_tuples,
    mine_conditional_row,
    parse_fragment,
)


def conditional(content: str, lang: str = "en") -> set:
    return set(analyze_page(content, lang)["conditional"])


def props(content: str) -> list:
    return analyze_page(content)["property_tuples"]


def invokes(content: str) -> list:
    return analyze_page(content)["invoke_tuples"]


def direct(content: str, lang: str = "en") -> list:
    return analyze_page(content, lang)["direct_tuples"]


# ---------------------------------------------------------------------------
# InfoboxMappingsTemplateExtractorTest (conditional expressions)
# ---------------------------------------------------------------------------

def test_conditional_basic_ifeq():
    got = conditional(
        """
        {{Infobox Test1

        | data37    = {{#ifeq: temp_string1 | temp_string2 | temp_string3 | temp_string4 }}
        | data38    = {{#ifeq: string1 | string2 |{{#property:P1082}} | string4 }}
        | website   = {{#invoke:Wikidata|property|p856}}

        }}
      """
    )
    assert got == {
        ("Infobox Test1", "string1", "P1082"),
        ("Infobox Test1", "string2", "P1082"),
        ("Infobox Test1", "string4", "P1082"),
    }


def test_conditional_conflicting_properties_dropped():
    got = conditional(
        """
        {{Infobox Test1

        | data37    = {{#ifeq: temp_string1 | temp_string2 | temp_string3 | temp_string4 }}
        | data38    = {{#ifeq: string1 | string2 |{{#property:P1082}} |  {{#invoke:Wikidata|property|p456}} }}
        }}
      """
    )
    assert got == set()


def test_conditional_one_nested_level():
    got = conditional(
        """
        {{Infobox Test1
        |data39   = {{#ifeq: string1 | string2 | {{#if: {{#property:p123}} | value if non-empty | value if empty }} | value if different }}
        }}
      """
    )
    assert got == {
        ("Infobox Test1", "string2", "p123"),
        ("Infobox Test1", "string1", "p123"),
        ("Infobox Test1", "value if different", "p123"),
        ("Infobox Test1", "value if non-empty", "p123"),
        ("Infobox Test1", "value if empty", "p123"),
    }


def test_conditional_multiple_nested_levels():
    got = conditional(
        """
        {{Infobox Test1
        |data40   = {{#ifeq: string1 | string2 | {{#if: test_string1 |  {{#ifexist: {{#property:p1243}} | test_string2 | test_string3 }}| test_string4 }} | test_string5 }}        }}
      """
    )
    assert got == {
        ("Infobox Test1", t, "p1243")
        for t in [
            "test_string4",
            "string1",
            "test_string5",
            "test_string3",
            "string2",
            "test_string1",
            "test_string2",
        ]
    }


def test_conditional_real_complex_1():
    got = conditional(
        """
        {{Infobox Test1

        | data37 = {{#if:{{{website|}}}
                          |{{#ifeq:{{{website|}}}|hide||{{{website|}}} }}
                          |{{#if:{{#property:P856}}
                             |{{URL|{{#property:P856}}}}
                           }}
                       }}
        | established_date        = {{#if: {{{established_date|}}} | {{{established_date}}} | {{#invoke:Wikidata|property|P765}} }}
        }}
      """
    )
    assert got == {
        ("Infobox Test1", "website", "P856"),
        ("Infobox Test1", "hide", "P856"),
        ("Infobox Test1", "established_date", "P765"),
        ("Infobox Test1", "URL", "P856"),
    }


def test_conditional_real_complex_2():
    got = conditional(
        """
        {{Infobox Test1
        |  data30 = {{#if:{{{ISBN|}}}
                     | {{#ifeq:{{{ISBN|}}}|FETCH_WIKIDATA
                       | {{#invoke:ISBNT|link|{{#property:P212}}}}
                       | {{ISBNT|1={{{ISBN|}}}}} {{{ISBN_note|}}}
                       }}
                     }}
        | data38    = {{{website|{{{homepage|{{{URL|{{#ifeq:{{{website|{{{homepage|{{{URL|}}}}}}}}}
            | FETCH_WIKIDATA
            | {{#if:{{#property:P856}}|{{Url|1={{#invoke:Wikidata|getValue|P856|FETCH_WIKIDATA}} }} }}
            |}}}}}}}}}}}

        | data40 = {{#if:{{both| {{{pushpin_map|}}} | {{both|{{{latd|}}}|{{{longd|}}}}} {{both|{{{coordinates_wikidata|{{{wikidata|}}}}}}|{{#property:P625}}}} }}| {{location map|{{{pushpin_map|}}} }}|{{#property:P625}} }}
        }}
      """
    )
    assert got == {
        ("Infobox Test1", "ISBN", "P212"),
        ("Infobox Test1", "website", "P856"),
        ("Infobox Test1", "ISBN_note", "P212"),
        ("Infobox Test1", "pushpin_map", "P625"),
        ("Infobox Test1", "ISBNT", "P212"),
        ("Infobox Test1", "URL", "P856"),
        ("Infobox Test1", "homepage", "P856"),
        ("Infobox Test1", "coordinates_wikidata", "P625"),
        ("Infobox Test1", "link", "P212"),
        ("Infobox Test1", "Url", "P856"),
        ("Infobox Test1", "location map", "P625"),
        ("Infobox Test1", "longd", "P625"),
        ("Infobox Test1", "latd", "P625"),
    }


# ---------------------------------------------------------------------------
# InfoboxMappingsExtractorTest (#property tuples)
# ---------------------------------------------------------------------------

def test_property_tuples_ym_infobox():
    got = props(
        """{{YM
            | |status                                 =
            | |azərbaycan dilində adı       = Telqte
            | |orijinal adı                          = Telgte
            | |ölkə                                    = {{#property:P17}}
            | |şəkil                                    ={{#property:P18}}
            | |gerb                                    = {{#property:P94}}
            | |bayraq                                = {{#property:P41}}
            | |bayraq yazısı                      =
            |  |lat_dir =N |lat_deg =51 |lat_min =58 |lat_sec =55
            |  |lon_dir =E |lon_deg =7 |lon_min =47 |lon_sec = 8
            | |ölkə xəritəsi                        = <!-- alternativ, eyni koordinatlı diyarlar -->
            | |statuslu                             =
            | |sahəsi                               = 90.6
            | |əhalisi                              = 19522
            | |saat qurşağı                    = +1
            | |telefon kodu                    = {{#property:P473}}
            | |nəqliyyat kodu                 = {{#property:P395}}
            | |sayt                                 = {{#property:P856}}
            | |saytın dili                         = de
            |}}
            |"""
    )
    assert got == [
        ("YM", "ölkə", "P17"),
        ("YM", "şəkil", "P18"),
        ("YM", "gerb", "P94"),
        ("YM", "bayraq", "P41"),
        ("YM", "telefon kodu", "P473"),
        ("YM", "nəqliyyat kodu", "P395"),
        ("YM", "sayt", "P856"),
    ]


def test_property_tuples_planet_links_and_nested_time():
    got = props(
        """{{Infobox planet
        | name = Uranus
        | symbol = [[File:{{#property:P367}}|25px]]
        | image = [[File:Uranus2.jpg|260px]]
        | discoverer = [[{{#property:P61}}]]
        | discovered =  {{#time:F j, Y|{{#property:P575}}}}
        | epoch = [[J2000]]
        }}"""
    )
    assert got == [
        ("Infobox planet", "symbol", "P367"),
        ("Infobox planet", "discoverer", "P61"),
    ]


def test_property_tuples_positional_key_with_duplicates():
    got = props(
        """
        * {{cite book|author = R. Prud'Homme Van Reine|title = Admiraal Zilvervloot}}
        {{Commons category|{{#property:P373}}}}
        {{Use dmy dates|date=September 2011}}
        {{Commons category|{{#property:P373}}}}
        }}"""
    )
    assert got == [
        ("Commons category", "1", "P373"),
        ("Commons category", "1", "P373"),
    ]


def test_property_tuples_politics():
    got = props(
        """{{Infobox Politics
         | seat                    = [[{{#property:P36}}]]
         | leader_title            = Governor
         | leader_name             = [[{{#property:P6}}]]
         | area_total_km2          = 4,443
         | population_total        = {{Metadata Population BE|80000}}
         }}"""
    )
    assert got == [
        ("Infobox Politics", "seat", "P36"),
        ("Infobox Politics", "leader_name", "P6"),
    ]


def test_property_tuples_nested_template():
    got = props(
        """|title=Philippine ZIP Codes Directory
        ||area_code              = 0
        ||website                = {{nowrap|{{URL|{{#property:P856}}}}}}"""
    )
    assert got == [("URL", "1", "P856")]


def test_property_tuples_expr_nested_excluded():
    got = props(
        """
         {{Infobox Test
         | population_total        = {{#property:P1082}}
         | population_as_of        = 2010
         | population_density_km2  = {{#expr: {{formatnum: {{#property:P1082}}|R}} / 0.67 round 0}}
         }}"""
    )
    assert got == [("Infobox Test", "population_total", "P1082")]


def test_property_tuples_inline_text():
    got = props(
        """{{Infobox Tourism
         | tourism_slogan         = Masaganang Maitum
         | image_map              = {{#property:P242}}
         | map_caption            = Map of {{#property:P131}} with Maitum highlighted
         }}"""
    )
    # inline {{#property}} between text still sits directly in the row
    assert got == [
        ("Infobox Tourism", "image_map", "P242"),
        ("Infobox Tourism", "map_caption", "P131"),
    ]


def test_property_tuples_lowercase_ids():
    got = props(
        """
         {{Infobox Test
         | surnom            = {{#property:p742}}
         | date de naissance = {{Date|18|septembre|1943|au cinéma|âge=oui}}
         | date de décès     = {{#property:p570}}
         | lieu de décès     = {{#property:p20}}
         }}"""
    )
    assert got == [
        ("Infobox Test", "surnom", "p742"),
        ("Infobox Test", "date de décès", "p570"),
        ("Infobox Test", "lieu de décès", "p20"),
    ]


def test_property_tuples_two_in_one_line():
    got = props(
        """
        {{Infobox Test
        | nom               = {{#property:P735}} {{#property:P734}}
        }}"""
    )
    assert got == [("Infobox Test", "nom", "P735"), ("Infobox Test", "nom", "P734")]


def test_property_tuples_multiple_infoboxes():
    got = props(
        """
        {{Infobox Test1
        | arg1   = {{#property:P1}}
        }}

        {{Infobox Test2
        | arg2 = {{#property:P2}}
        }}
      """
    )
    assert got == [("Infobox Test1", "arg1", "P1"), ("Infobox Test2", "arg2", "P2")]


# ---------------------------------------------------------------------------
# InfoboxMappingsExtractorTest (#invoke tuples)
# ---------------------------------------------------------------------------

def test_invoke_tuples_qualifier_join():
    got = invokes(
        """
        {{Infobox Test1
        | area_total_km2         = 54.84
        | population_as_of       = {{#invoke:Wikidata|getQualifierDateValue|P1082|P585|FETCH_WIKIDATA|dmy}}
        | population_total       = {{#property:P1082}}
        }}
      """
    )
    assert got == [("Infobox Test1", "population_as_of", "P1082/P585")]


def test_invoke_tuples_nested_params():
    got = invokes(
        """
        {{Infobox Test1
        | label2 = Organisation
        || data2  = {{#invoke:Wikidata|getValue|P137|{{{organization|{{{organisation|FETCH_WIKIDATA}}}}}}}}
        || label3 = Location(s)
        }}
      """
    )
    assert got == [("Infobox Test1", "data2", "P137")]


def test_invoke_tuples_multiple_infoboxes_unbalanced():
    got = invokes(
        """
        {{Infobox Test1
        | arg1  = {{#invoke:Wikidata|getValue|P729|{{{first_light|FETCH_WIKIDATA}}}}}
        }}

        | {{Infobox Test2
        | arg2  = {{#invoke:Wikidata|getValue|P87|{{{first_light|FETCH_WIKIDATA}}}}}
        }
      """
    )
    assert got == [
        ("Infobox Test1", "arg1", "P729"),
        ("Infobox Test2", "arg2", "P87"),
    ]


def test_invoke_tuples_module_allowlist():
    got = invokes(
        """
        {{Infobox Test1
        | operating system       = {{#invoke:PropertyLink|property|p306}}
        | license                = {{#invoke:PropertyLink|property|p275}}
        | website                = {{#invoke:Wikidata|property|p856}}
        | random                  = {{#invoke:Random|property|p456}}
        }}
      """
    )
    assert got == [
        ("Infobox Test1", "operating system", "p306"),
        ("Infobox Test1", "license", "p275"),
        ("Infobox Test1", "website", "p856"),
    ]


# ---------------------------------------------------------------------------
# direct website-template mappings (DTM)
# ---------------------------------------------------------------------------

def test_direct_template_mappings():
    got = direct(
        """
        {{Infobox Test1
        | website1                = {{Official URL}}
        | website2                = {{Official website}}
        | blog                    = {{Official blog}}
        }}
      """
    )
    assert got == [
        ("Infobox Test1", "website1", "P856"),
        ("Infobox Test1", "website2", "P856"),
        ("Infobox Test1", "blog", "P1581"),
    ]


def test_direct_template_mappings_multiple_infoboxes():
    got = direct(
        """
        {{Infobox Test1
        | website1                = {{Official website}}
        }}

        {{Infobox Test2
        | website2                = {{Official URL}}
        }}
      """
    )
    assert got == [
        ("Infobox Test1", "website1", "P856"),
        ("Infobox Test2", "website2", "P856"),
    ]


def test_direct_template_mappings_norwegian():
    got = direct(
        """
        {{Infoboks Test1
        | website1                = {{BetingetURL}}
        }}
      """,
        lang="no",
    )
    assert got == [("Infoboks Test1", "website1", "P856")]


# ---------------------------------------------------------------------------
# extract() surface: hints + param=>property mappings + incomplete tuples
# ---------------------------------------------------------------------------

PAGE = """{{Infobox settlement
| mast = {{#if:{{{mast|}}}|{{#property:P2043}}}}
| website = {{#if:{{{website|}}}|{{{website}}}|{{#property:P856}}}}
| operator = {{#invoke:Wikidata|getValue|P137|FETCH_WIKIDATA}}
| skip = {{#property:P1308|from=Q824910}}
}}
{{Wikidatacheck|p=856}}
"""


def test_hints_and_mappings():
    r = analyze_page(PAGE)
    assert r["mappings"] == ["mast=>P2043"]  # two {{{website}}} nodes -> no pair
    assert "{{#property:P2043}}" in r["hints"]
    assert "{{#property:P856}}" in r["hints"]
    assert "{{#invoke:Wikidata|getValue|P137|FETCH_WIKIDATA}}" in r["hints"]
    assert "{{Wikidatacheck|p=856}}" in r["hints"]
    # 'from' property functions emit no hint (InfoboxMappingsExtractor.scala:40)
    assert not any("P1308" in h for h in r["hints"])


def test_extract_tuples_includes_incomplete():
    rows = extract_tuples(PAGE)
    assert ("Infobox settlement", "?", "P2043") in rows
    assert ("Infobox settlement", "operator", "P137") in rows
    # direct/invoke/property precede the incomplete '?' rows
    kinds = [r[1] == "?" for r in rows]
    assert kinds == sorted(kinds)


def test_mine_conditional_row_string_api():
    assert mine_conditional_row(
        "{{#ifeq: a1 | b2 |{{#property:P99}} | c3 }}"
    ) == [("a1", "P99"), ("b2", "P99"), ("c3", "P99")]
    assert mine_conditional_row("{{#property:P99}}") == []  # no terms
    assert mine_conditional_row("plain text") == []  # no property


def test_parse_fragment_roundtrip_spans():
    nodes = parse_fragment(PAGE)
    from kgforge.infobox_mappings import _walk_funcs

    for f, _ in _walk_funcs(nodes):
        assert PAGE[f.start : f.end] == f.src


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def _corpus(spark):
    rows = [
        ("r", "t/Template:Box_1.wiki", "c1", "en", PAGE),
        ("r", "docs/Article_1.wiki", "c2", "en", "{{Infobox x\n| a = {{#property:P5}}\n}}\n"),
        ("r", "docs/Redir_1.wiki", "c3", "en", "#REDIRECT [[Article 1]]\n"),
        ("r", "p/Category:Skipped_1.wiki", "c4", "en", "{{#property:P7}}\n"),
    ]
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )


def test_spark_tuples_and_quads(spark):
    from kgforge.parse import prepare

    parsed = prepare(_corpus(spark))
    tuples = mapping_suggestion_tuples(parsed).collect()
    by_kind = {}
    for t in tuples:
        by_kind.setdefault(t["kind"], []).append(t)
    assert any(
        t["template"] == "Infobox settlement" and t["key"] == "mast" for t in by_kind["conditional"]
    )
    assert any(t["prop"] == "P5" for t in by_kind["property"])
    # redirects and non-Main/Template namespaces are gated out
    assert not any("Skipped" in t["subject"] or "Redir" in t["subject"] for t in tuples)

    quads = infobox_mappings_quads(parsed).collect()
    assert all(
        q["predicate"] == "http://dbpedia.org/property/templateUsesWikidataProperty"
        for q in quads
    )
    maps = [q for q in quads if q["dataset"] == "template_mappings"]
    assert [q["value"] for q in maps] == ["mast=>P2043"]
    hints = [q for q in quads if q["dataset"] == "template_mappings_hints"]
    assert "{{Wikidatacheck|p=856}}" in [q["value"] for q in hints]
    assert all(q["datatype"].endswith("#string") for q in quads)


def test_nesting_bomb_does_not_recurse_out():
    # '{{x|' * 2000 used to blow the Python recursion limit inside the UDF;
    # beyond _MAX_DEPTH the parser treats braces as plain text
    bomb = "{{x|" * 2000 + "}}" * 2000
    nodes = parse_fragment(bomb)
    assert nodes  # parsed without RecursionError
    r = analyze_page(bomb)
    assert r["property_tuples"] == [] and r["hints"] == []
    # a real page near the guard still parses its shallow structure
    deep = "{{Infobox x\n| a = " + "{{y|" * 35 + "{{#property:P5}}" + "}}" * 35 + "\n}}"
    assert analyze_page(deep)["incomplete"] == [("Infobox x", "?", "P5")]


# ---------------------------------------------------------------------------
# property-based robustness (same strategy class as tests/test_fuzz_parser.py)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_markup = st.sampled_from(
    ["{{", "}}", "{{{", "}}}", "|", "=", "[[", "]]", "#property:", "#invoke:",
     "#ifeq:", "#if:", "P856", "p12", "Wikidata", "Infobox ", "from=",
     "a", "x y", "ü", "\n", ":", "{{#property:P1}}", "{{{w|}}}"]
)
_chunks = st.lists(_markup, max_size=50).map("".join)


@given(_chunks)
@settings(max_examples=300, deadline=None)
def test_analyze_page_never_raises(text):
    r = analyze_page(text)
    for tpl, key, prop in r["property_tuples"]:
        assert prop and prop[0] in "pP"
    for tpl, term, prop in r["conditional"]:
        assert term.strip() == term and term != ""


@given(st.text(max_size=300))
@settings(max_examples=150, deadline=None)
def test_analyze_page_arbitrary_unicode(text):
    analyze_page(text)  # must not raise


@given(_chunks)
@settings(max_examples=200, deadline=None)
def test_func_spans_always_slice_back(text):
    from kgforge.infobox_mappings import _walk_funcs

    nodes = parse_fragment(text)
    for f, _ in _walk_funcs(nodes):
        assert text[f.start : f.end] == f.src
