"""Mappings-wiki template statistics (kgforge/mapping_stats.py — the
reference server's TemplateStatistics/PropertyStatistics pages,
server/.../stats/MappingStats.scala).

The DuckDB oracle (kg_mapping_stats) value-checks the derived corpus;
these tests pin the semantic corners over a crafted corpus: page-level
vs occurrence-level counting, empty values not counted as uses,
mapped-but-never-used properties (the InvalidTarget set), unmapped
templates, nested templates excluded, and template-redirect resolution.
"""

from pyspark.sql import functions as F  # noqa: F401

from kgforge.mapping_engine import PropertyRule, TemplateMapping
from kgforge.mapping_stats import mapped_template_properties, template_statistics
from kgforge.parse import prepare

SCHEMA = "repo string, path string, commit string, lang string, content string"

ROWS = [
    # two uses of Infobox alpha on ONE page: template_count counts the page
    # once, property uses count per occurrence; p2 is set empty (no use);
    # px is used but unmapped
    ("r", "a/One.wiki", "c1", "en",
     "{{Infobox alpha|p1=x|p2=|px=y}}\n\n{{Infobox alpha|p1=z}}\n"),
    # nested template inside a param must NOT appear as a root template
    ("r", "a/Two.wiki", "c2", "en",
     "{{Infobox alpha|p1={{Tiny|a=1}}}}\n"),
    # unmapped template
    ("r", "a/Three.wiki", "c3", "en", "{{Infobox beta|q=1}}\n"),
    # redirect page: contributes nothing
    ("r", "a/Four.wiki", "c4", "en", "#REDIRECT [[One]]\n"),
]

MAPPINGS = {
    "infobox alpha": TemplateMapping(
        "infobox alpha",
        "http://dbpedia.org/ontology/Thing",
        rules=[
            PropertyRule("p1", "http://dbpedia.org/ontology/a"),
            PropertyRule("p2", "http://dbpedia.org/ontology/b"),
            PropertyRule("p3", "http://dbpedia.org/ontology/c"),  # never used
        ],
    ),
}


def _stats(spark, rows=ROWS, **kw):
    parsed = prepare(spark.createDataFrame(rows, SCHEMA))
    df = template_statistics(parsed, mappings=MAPPINGS, **kw)
    return {r.template: r for r in df.collect()}


def test_counts_and_ratios(spark):
    s = _stats(spark)
    a = s["infobox alpha"]
    assert a.template_count == 2  # two pages, double-use counted once
    assert a.is_mapped
    # observed props: p1 (non-empty), px; p2's empty value is not a use
    assert a.property_count == 2
    assert a.mapped_property_count == 1  # p1
    # p1 used 3x (2 on page One + 1 on Two), px once
    assert a.property_use_count == 4
    assert a.mapped_property_use_count == 3
    # p2 and p3 are mapped but never set: the InvalidTarget set
    assert a.mapped_property_not_used == 2
    assert a.mapped_ratio == 0.5
    assert a.mapped_use_ratio == 0.75

    b = s["infobox beta"]
    assert not b.is_mapped
    assert b.template_count == 1
    assert b.property_count == 1 and b.mapped_property_count == 0
    assert b.mapped_property_not_used == 0

    assert "tiny" not in s  # nested, not a root template


def test_template_redirect_resolution(spark):
    rows = ROWS + [
        ("r", "a/Five.wiki", "c5", "en", "{{Alpha box|p1=w}}\n"),
    ]
    s = _stats(spark, rows=rows,
               template_redirects={"alpha box": "infobox alpha"})
    a = s["infobox alpha"]
    assert a.template_count == 3
    assert a.property_use_count == 5
    assert "alpha box" not in s


def test_mapped_template_properties_covers_rule_kinds():
    assert mapped_template_properties(MAPPINGS["infobox alpha"]) == {
        "p1", "p2", "p3"
    }


def test_language_statistics_rollup(spark):
    from kgforge.mapping_stats import language_statistics

    parsed = prepare(spark.createDataFrame(ROWS, SCHEMA))
    row = language_statistics(
        template_statistics(parsed, mappings=MAPPINGS)
    ).collect()[0]
    assert row.template_count == 2 and row.mapped_template_count == 1
    # alpha on 2 pages + beta on 1 page
    assert row.template_use_count == 3 and row.mapped_template_use_count == 2
    assert row.property_count == 3 and row.mapped_property_count == 1
    assert row.property_use_count == 5 and row.mapped_property_use_count == 3
    assert row.mapped_template_ratio == 0.5
    assert row.mapped_template_use_ratio == 0.6667
    assert row.mapped_property_ratio == 0.3333
    assert row.mapped_property_use_ratio == 0.6
