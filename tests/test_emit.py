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


def test_unescape_round_trip_backslash_then_n(spark):
    """A literal containing backslash+n chars (wire form \\\\n) must survive
    write→read; \\r must unescape too (left-to-right unescape order)."""
    from kgforge.emit import from_ntriples, to_ntriples

    tricky = [
        ("en", "d", "http://s", "http://p", "a\\nb", None, XSD_STRING),   # backslash + 'n'
        ("en", "d", "http://s", "http://p", "c\rd", None, XSD_STRING),    # carriage return
        ("en", "d", "http://s", "http://p", "e\\\\f", None, XSD_STRING),  # double backslash
        ("en", "d", "http://s", "http://p", "g\nh\ti", None, XSD_STRING), # real newline/tab
    ]
    df = spark.createDataFrame(tricky, SCHEMA)
    lines = to_ntriples(df).withColumnRenamed("line", "line")
    back = from_ntriples(lines.select("dataset", "language", "line"))
    got = sorted(r.value for r in back.collect())
    assert got == sorted(r[4] for r in tricky)


def test_trix_lines(spark):
    from kgforge.emit import to_trix

    rows = [
        ("en", "d", "http://s", "http://p", "http://o", None, None),
        ("en", "d", "http://s", "http://p", "a<b", None, RDF_LANGSTRING),
        ("en", "d", "http://s", "http://p", "42", None, XSD_INTEGER),
    ]
    lines = sorted(r.line for r in to_trix(spark.createDataFrame(rows, SCHEMA)).collect())
    assert "<triple><uri>http://s</uri><uri>http://p</uri><uri>http://o</uri></triple>" in lines
    assert any('<plainLiteral xml:lang="en">a&lt;b</plainLiteral>' in l for l in lines)
    assert any(f'<typedLiteral datatype="{XSD_INTEGER}">42</typedLiteral>' in l for l in lines)


def test_rdfjson_lines(spark):
    import json

    from kgforge.emit import to_rdfjson

    rows = [
        ("en", "d", "http://s", "http://p", "http://o", None, None),
        ("de", "d", "http://s", "http://p", "Hallo", None, RDF_LANGSTRING),
    ]
    objs = [json.loads(r.line) for r in to_rdfjson(spark.createDataFrame(rows, SCHEMA)).collect()]
    by_type = {o["o"]["type"]: o for o in objs}
    assert by_type["uri"]["o"]["value"] == "http://o"
    assert by_type["literal"]["o"]["lang"] == "de"


def test_limit_per_dataset(spark):
    from kgforge.emit import limit_per_dataset

    rows = [("en", "a", f"http://s{i}", "http://p", "v", None, XSD_STRING) for i in range(9)]
    rows += [("en", "b", f"http://s{i}", "http://p", "v", None, XSD_STRING) for i in range(3)]
    out = limit_per_dataset(spark.createDataFrame(rows, SCHEMA), 5)
    got = {r.dataset: 0 for r in out.collect()}
    counts = out.groupBy("dataset").count().collect()
    assert {r.dataset: r["count"] for r in counts} == {"a": 5, "b": 3}


# ---------------------------------------------------------------------------
# DecodeHtmlEntities / FixNTriplesEncoding post-processing jobs
# ---------------------------------------------------------------------------

def test_escape_ntriples_line_units():
    from kgforge.emit import escape_ntriples_line as esc

    assert esc('<a> <b> "plain ascii" .') == '<a> <b> "plain ascii" .'
    assert esc('<a> <b> "café" .') == '<a> <b> "caf\\u00E9" .'
    assert esc('"snowman ☃"') == '"snowman \\u2603"'
    assert esc('"astral 😀"') == '"astral \\U0001F600"'
    assert esc('"tab\there"') == '"tab\\there"'
    # quotes and backslashes untouched (FixNTriplesEncoding contract)
    assert esc('"already \\u00E9 fine"') == '"already \\u00E9 fine"'


def test_fix_ntriples_encoding_df(spark):
    from kgforge.emit import fix_ntriples_encoding

    df = spark.createDataFrame(
        [('<a> <p> "café" .',), ('<a> <p> "ok" .',)], "line string"
    )
    got = sorted(r["line"] for r in fix_ntriples_encoding(df).collect())
    assert got == ['<a> <p> "caf\\u00E9" .', '<a> <p> "ok" .']


def test_decode_html_entities_scoped(spark):
    from kgforge.emit import decode_html_entities

    rows = [
        ("en", "labels", "s1", "p", "Tom &amp; Jerry", None, "http://w3.org/xsd#string"),
        ("en", "labels", "s2", "p", "caf&#233;", None, "http://w3.org/xsd#string"),
        ("en", "labels", "s3", "p", "http://x/?a=1&amp;b=2", None, None),
        ("en", "other", "s4", "p", "&amp; stays", None, "http://w3.org/xsd#string"),
    ]
    df = spark.createDataFrame(
        rows,
        "language string, dataset string, subject string, predicate string,"
        " value string, context string, datatype string",
    )
    got = {r["subject"]: r["value"] for r in decode_html_entities(df, {"labels"}).collect()}
    assert got["s1"] == "Tom & Jerry"
    assert got["s2"] == "café"
    assert got["s3"] == "http://x/?a=1&b=2"  # IRI decoded too (reference behavior)
    assert got["s4"] == "&amp; stays"  # dataset out of scope
    lit = {
        r["subject"]: r["value"]
        for r in decode_html_entities(df, {"labels"}, literals_only=True).collect()
    }
    assert lit["s3"] == "http://x/?a=1&amp;b=2"  # safe mode skips IRI objects


def test_decode_then_reemit_round_trip(spark):
    """decoded literals re-escape cleanly through the N-Triples writer."""
    from kgforge.emit import decode_html_entities, from_ntriples, to_ntriples

    df = spark.createDataFrame(
        [("en", "labels", "http://x/s", "http://x/p", "A &lt;b&gt; &amp; caf&#233;",
          None, "http://www.w3.org/2001/XMLSchema#string")],
        "language string, dataset string, subject string, predicate string,"
        " value string, context string, datatype string",
    )
    lines = to_ntriples(decode_html_entities(df, {"labels"}))
    back = from_ntriples(lines.select("line")).collect()[0]
    assert back["value"] == "A <b> & café"
