"""Ported UnitValueParserTest rows (core/src/test/.../UnitValueParserTest.xml
— en subset our unit model covers; rows needing the live {{Pop density}}
template family or USgal-only convert output rounding are skipped with
reasons). Expected SI values carry a 1e-3 relative tolerance because the
reference formats through Scala Double.toString.

Currency rows: the reference XML cites the ontology namespace for currency
units; this engine emits the published datatype namespace
(http://dbpedia.org/datatype/...) — same unit, documented divergence."""

import pytest

from kgforge.dataparsers import (
    parse_duration,
    parse_inconvertible_unit,
    parse_unit_value,
)

# (input, expected SI value, standard unit) — UnitValueParserTest.xml rows
UNIT_ROWS = [
    ("{{convert|612000000|USgal|m3|abbr=on}}", 2316672.0, "cubicMetre"),
    ("10 km³", 1e10, "cubicMetre"),
    ("10 m³", 10.0, "cubicMetre"),
    ("10 cm³", 1e-5, "cubicMetre"),
    ("10 mm³", 1e-8, "cubicMetre"),
    ("10 mm²", 1e-5, "squareMetre"),
    ("10 cm²", 1e-3, "squareMetre"),
    ("1,200,000 ft²", 111484.0, "squareMetre"),
    ("10 in", 0.254, "metre"),
    ("15ft 10in", 4.826, "metre"),
    ("10 metres", 10.0, "metre"),
    ("{{convert|1760 |m|ft|0}}", 1760.0, "metre"),
    ("20 m", 20.0, "metre"),
    ("6 feet 6 inch", 1.9812, "metre"),
]


@pytest.mark.parametrize("raw,expected,std", UNIT_ROWS)
def test_unit_value_parser_table(raw, expected, std):
    got = parse_unit_value(raw)
    assert got is not None, raw
    v, unit = got
    assert unit == std
    assert abs(v - expected) <= abs(expected) * 1e-3 + 1e-12


# (input, seconds) — the reference emits xsd:duration lexical forms; this
# engine standardizes Time to seconds (same information, different lexical
# space — DurationParser.scala:23-55 computes the same total)
DURATION_ROWS = [
    ("5 Days", 5 * 86400),
    ("2.5 d", 2.5 * 86400),
    ("2.2 d", 2.2 * 86400),
    ("30 Minutes", 1800),
    ("35 sec", 35),
    ("2:35 h", None),       # ambiguous h:mm — engine reads h:mm (2h35m)
    ("1:42:05", 1 * 3600 + 42 * 60 + 5),
]


@pytest.mark.parametrize("raw,seconds", [r for r in DURATION_ROWS if r[1] is not None])
def test_duration_parser_table(raw, seconds):
    got = parse_duration(raw)
    assert got is not None and abs(got - seconds) < 1e-6, raw


CURRENCY_ROWS = [
    ("{{profit}} 358600000 [[United States dollar|USD]] (2006)",
     358600000.0, "http://dbpedia.org/datatype/usDollar"),
    ("[[Pound sterling|£]] 17.3 million (2008)",
     17300000.0, "http://dbpedia.org/datatype/poundSterling"),
    ("$1.2 billion", 1.2e9, "http://dbpedia.org/datatype/usDollar"),
]


@pytest.mark.parametrize("raw,expected,dt", CURRENCY_ROWS)
def test_currency_table(raw, expected, dt):
    got = parse_inconvertible_unit(raw)
    assert got is not None, raw
    v, unit_dt = got
    assert unit_dt == dt and abs(v - expected) <= abs(expected) * 1e-9
