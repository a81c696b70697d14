"""N-Triples formatter (TerseBuilder semantics,
destinations/formatters/TerseBuilder.scala:22-62)."""

from kgforge.emit import to_ntriples
from kgforge.namespaces import RDF_LANGSTRING, XSD_INTEGER, XSD_STRING

SCHEMA = (
    "language string, dataset string, subject string, predicate string, "
    "value string, context string, datatype string"
)


def _lines(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return [r.line for r in to_ntriples(df).orderBy("line").collect()]


def test_iri_object(spark):
    lines = _lines(spark, [("en", "d", "http://s", "http://p", "http://o", None, None)])
    assert lines == ["<http://s> <http://p> <http://o> ."]


def test_langstring(spark):
    lines = _lines(spark, [("en", "d", "http://s", "http://p", "Hello", None, RDF_LANGSTRING)])
    assert lines == ['<http://s> <http://p> "Hello"@en .']


def test_xsd_string_datatype_omitted(spark):
    lines = _lines(spark, [("en", "d", "http://s", "http://p", "plain", None, XSD_STRING)])
    assert lines == ['<http://s> <http://p> "plain" .']


def test_typed_literal(spark):
    lines = _lines(spark, [("en", "d", "http://s", "http://p", "42", None, XSD_INTEGER)])
    assert lines == [f'<http://s> <http://p> "42"^^<{XSD_INTEGER}> .']


def test_escaping(spark):
    lines = _lines(
        spark, [("en", "d", "http://s", "http://p", 'a"b\\c\nd\te', None, XSD_STRING)]
    )
    assert lines == ['<http://s> <http://p> "a\\"b\\\\c\\nd\\te" .']


def test_invalid_iri_dropped(spark):
    rows = [
        ("en", "d", "not an iri", "http://p", "http://o", None, None),
        ("en", "d", "http://s", "http://p", "bad object iri with space", None, None),
        ("en", "d", "http://s", "http://p", "http://ok", None, None),
    ]
    assert _lines(spark, rows) == ["<http://s> <http://p> <http://ok> ."]
