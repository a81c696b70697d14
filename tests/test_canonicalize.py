"""URI policies + canonicalization (UriPolicy.scala:33-108, UriUtils,
MapSubjectUris/CanonicalizeUris scripts)."""

from pyspark.sql import functions as F

from kgforge.canonicalize import (
    apply_uri_policies,
    canonicalize_uris,
    map_subject_uris,
)

SCHEMA = (
    "language string, dataset string, subject string, predicate string, "
    "value string, context string, datatype string"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_policy_generic(spark):
    q = _df(spark, [("de", "d", "http://de.dbpedia.org/resource/X", "http://p", "http://de.dbpedia.org/resource/Y", None, None)])
    out = canonicalize_uris(q).collect()[0]
    assert out.subject == "http://dbpedia.org/resource/X"
    assert out.value == "http://dbpedia.org/resource/Y"


def test_generic_leaves_literals(spark):
    q = _df(spark, [("de", "d", "http://de.dbpedia.org/resource/X", "http://p", "ein literal", None, "http://www.w3.org/2001/XMLSchema#string")])
    out = canonicalize_uris(q).collect()[0]
    assert out.value == "ein literal"


def test_reject_long_drops_quad(spark):
    long_iri = "http://example.org/" + "x" * 600
    rows = [
        ("en", "d", long_iri, "http://p", "http://o", None, None),
        ("en", "d", "http://s", "http://p", "http://o", None, None),
    ]
    out = apply_uri_policies(_df(spark, rows))
    assert out.count() == 1


def test_iri_to_uri(spark):
    rows = [("en", "d", "http://dbpedia.org/resource/Café", "http://p", "http://o", None, None)]
    out = apply_uri_policies(_df(spark, rows), uri=True).collect()[0]
    assert out.subject == "http://dbpedia.org/resource/Caf%C3%A9"


def test_xml_safe(spark):
    rows = [("en", "d", "http://s/a&b", "http://p", "http://o", None, None)]
    out = apply_uri_policies(_df(spark, rows), xml_safe=True).collect()[0]
    assert out.subject == "http://s/a%26b"


def test_map_subject_uris(spark):
    q = _df(spark, [("en", "page_links", "http://old", "http://p", "http://o", None, None),
                    ("en", "page_links", "http://other", "http://p", "http://o", None, None)])
    m = spark.createDataFrame([("http://old", "http://new")], "src string, dst string")
    rows = {(r.subject, r.dataset) for r in map_subject_uris(q, m).collect()}
    assert rows == {("http://new", "page_links_redirected"), ("http://other", "page_links_redirected")}


def test_recode_uris(spark):
    """RecodeUris: doubly/inconsistently percent-encoded resource IRIs
    normalize to the wikiEncode policy form."""
    from kgforge.canonicalize import recode_uris

    schema = (
        "language string, dataset string, subject string, predicate string, "
        "value string, context string, datatype string"
    )
    rows = [
        ("en", "d", "http://dbpedia.org/resource/Caf%C3%A9_de%20Flore", "http://p",
         "http://dbpedia.org/resource/A%2Cb", None, None),
        ("en", "d", "http://dbpedia.org/resource/Ok", "http://p", "literal stays", None,
         "http://www.w3.org/2001/XMLSchema#string"),
    ]
    out = {(r.subject, r.value) for r in recode_uris(spark.createDataFrame(rows, schema)).collect()}
    subjects = {s for s, _ in out}
    from kgforge.namespaces import wiki_encode
    assert "http://dbpedia.org/resource/" + wiki_encode("Café de Flore") in subjects
    assert ("http://dbpedia.org/resource/Ok", "literal stays") in out


def test_interlanguage_same_as(spark):
    """Only BIDIRECTIONAL interlanguage links become owl:sameAs
    (ProcessInterLanguageLinks semantics)."""
    from kgforge.canonicalize import interlanguage_same_as
    from kgforge.vocab import INTERLANGUAGE_LINKS, OWL_SAME_AS

    schema = (
        "language string, dataset string, subject string, predicate string, "
        "value string, context string, datatype string"
    )
    en_a, de_a = "http://dbpedia.org/resource/A", "http://de.dbpedia.org/resource/A"
    rows = [
        ("en", INTERLANGUAGE_LINKS, en_a, "p", de_a, None, None),
        ("de", INTERLANGUAGE_LINKS, de_a, "p", en_a, None, None),
        # one-directional: en B -> de B with no backlink
        ("en", INTERLANGUAGE_LINKS, "http://dbpedia.org/resource/B", "p",
         "http://de.dbpedia.org/resource/B", None, None),
        ("en", "labels", en_a, "p", "A", None, "x"),
    ]
    out = interlanguage_same_as(spark.createDataFrame(rows, schema))
    got = {(r.subject, r.predicate, r.value) for r in out.collect()}
    assert got == {(en_a, OWL_SAME_AS, de_a), (de_a, OWL_SAME_AS, en_a)}


def test_uri_to_iri_transcoding():
    """UriUtils.uriToIri (iri/UriUtils.scala:16-157): UTF-8 escape runs
    decode to raw unicode, reserved/control escapes stay, malformed UTF-8
    left untouched; round-trips with the IRI→URI direction."""
    from kgforge.canonicalize import uri_to_iri

    assert uri_to_iri("http://dbpedia.org/resource/Caf%C3%A9") == "http://dbpedia.org/resource/Café"
    assert uri_to_iri("http://x/%E6%9D%B1%E4%BA%AC") == "http://x/東京"
    # reserved stays escaped (decoding %2F/%23 would change semantics)
    assert uri_to_iri("http://x/a%2Fb%23c") == "http://x/a%2Fb%23c"
    # control char stays escaped; unreserved decodes
    assert uri_to_iri("http://x/a%0Ab%41") == "http://x/a%0AbA"
    # malformed UTF-8 run untouched
    assert uri_to_iri("http://x/%C3") == "http://x/%C3"
    assert uri_to_iri("plain no escapes") == "plain no escapes"
    # per-sequence decode (UriToIriDecoder): the valid prefix of a run
    # decodes, only the malformed byte stays escaped (ADVICE r3)
    assert uri_to_iri("http://x/%41%C3") == "http://x/A%C3"
    assert uri_to_iri("http://x/%C3%41") == "http://x/%C3A"
    assert uri_to_iri("http://x/%C3%A9%FF%C3%A9") == "http://x/é%FFé"


def test_uri_to_iri_quads_positions(spark):
    from kgforge.canonicalize import uri_to_iri_quads

    quads = spark.createDataFrame(
        [
            ("en", "labels", "http://x/Caf%C3%A9", "p", "http://y/%C3%A9", None, None),
            ("en", "labels", "http://x/s", "p", "lit%C3%A9ral", None, "xsd:string"),
        ],
        "language string, dataset string, subject string, predicate string, "
        "value string, context string, datatype string",
    )
    rows = {(r.subject, r.value) for r in uri_to_iri_quads(quads).collect()}
    # literal values are NOT transcoded (datatype non-null)
    assert rows == {("http://x/Café", "http://y/é"), ("http://x/s", "lit%C3%A9ral")}
