"""N-Triples serialization + partitioned graph-table write.

Formatter semantics follow TerseBuilder (destinations/formatters/
TerseBuilder.scala:22-62) and TurtleUtils escaping (util/TurtleUtils.scala:
21-34):

- object IRIs: ``<iri>`` when ``datatype`` is null
- plain ``xsd:string`` literals: the ``^^`` datatype suffix is OMITTED
- ``rdf:langString`` literals: ``@lang`` tag, no datatype suffix
- other datatypes: ``"lex"^^<datatype-iri>``
- literal escaping: ``\\ \" \n \r \t`` (+ control chars as \\uXXXX)
- invalid IRIs: dropped and counted (the reference comments the line out,
  TerseBuilder.scala:22-28 — the quad SET is what P/R compares)

Everything is Catalyst expressions (concat / regexp_replace) — serialization
stays JVM-side in whole-stage codegen; no Python in the write path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .namespaces import RDF_LANGSTRING, XSD_STRING


def _escape_literal(col: Column) -> Column:
    c = F.regexp_replace(col, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', '\\\\"')
    c = F.regexp_replace(c, "\n", "\\\\n")
    c = F.regexp_replace(c, "\r", "\\\\r")
    c = F.regexp_replace(c, "\t", "\\\\t")
    # remaining C0 control chars → \u00XX is rare; drop them (cheaper than a
    # per-char UDF and the corpus never emits them)
    c = F.regexp_replace(c, r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "")
    return c


_IRI_OK = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^<>\"{}|^`\\\s]+$"


def valid_iri(col: Column) -> Column:
    return col.rlike(_IRI_OK)


def to_ntriples(quads: DataFrame) -> DataFrame:
    """quads → DataFrame[dataset, line]. Invalid subject/predicate/object
    IRIs are dropped (counted by the caller via the `dropped` split)."""
    is_iri_object = F.col("datatype").isNull()
    obj = (
        F.when(is_iri_object, F.concat(F.lit("<"), F.col("value"), F.lit(">")))
        .when(
            F.col("datatype") == RDF_LANGSTRING,
            F.concat(F.lit('"'), _escape_literal(F.col("value")), F.lit('"@'), F.col("language")),
        )
        .when(
            F.col("datatype") == XSD_STRING,
            F.concat(F.lit('"'), _escape_literal(F.col("value")), F.lit('"')),
        )
        .otherwise(
            F.concat(
                F.lit('"'),
                _escape_literal(F.col("value")),
                F.lit('"^^<'),
                F.col("datatype"),
                F.lit(">"),
            )
        )
    )
    ok = (
        valid_iri(F.col("subject"))
        & valid_iri(F.col("predicate"))
        & (~is_iri_object | valid_iri(F.col("value")))
    )
    return quads.filter(ok).select(
        "dataset",
        "language",
        F.concat(
            F.lit("<"),
            F.col("subject"),
            F.lit("> <"),
            F.col("predicate"),
            F.lit("> "),
            obj,
            F.lit(" ."),
        ).alias("line"),
    )


def write_graph_tables(quads: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Materialize the quad table partitioned by dataset (DatasetDestination
    analog — destinations/DatasetDestination.scala; `partitionBy` replaces the
    reference's MultipleTextOutputFormat + bash concat,
    SparkExtractionJob.scala:116-123)."""
    quads.write.mode(mode).partitionBy("dataset").parquet(path)


def write_ntriples(quads: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Per-dataset, per-language dump layout (DBpedia ships per-language
    files; the language of non-langString literals is not representable in
    N-Triples, so it lives in the partition path)."""
    to_ntriples(quads).write.mode(mode).partitionBy("dataset", "language").text(path)


# ---------------------------------------------------------------------------
# N-Triples → quads (Quad.unapply analog, transform/Quad.scala:224-300)
# ---------------------------------------------------------------------------

_NT_PATTERN = (
    r"^<([^>]+)>\s+<([^>]+)>\s+"
    r"(?:<([^>]+)>"                       # IRI object
    r'|"((?:[^"\\]|\\.)*)"'           # literal lexical form
    r"(?:@([a-zA-Z][a-zA-Z0-9-]*)|\^\^<([^>]+)>)?)"
    r"\s*\.\s*$"
)


def from_ntriples(lines: DataFrame) -> DataFrame:
    """DataFrame[line string (+ optional dataset col)] → quads. Literals
    default to xsd:string; @lang literals get rdf:langString
    (Quad.scala:259, 276)."""
    line = F.col("line")

    def g(i: int) -> Column:
        return F.regexp_extract(line, _NT_PATTERN, i)

    ds = F.col("dataset") if "dataset" in lines.columns else F.lit("unknown")
    lang_part = F.col("language") if "language" in lines.columns else F.lit("en")
    parsed = lines.filter(line.rlike(_NT_PATTERN)).select(
        ds.alias("dataset"),
        lang_part.alias("language"),
        g(1).alias("subject"),
        g(2).alias("predicate"),
        g(3).alias("obj_iri"),
        g(4).alias("lex"),
        g(5).alias("lang_tag"),
        g(6).alias("dt"),
    )
    # Unescape left-to-right: rewrite \\ to a sentinel FIRST so that a wire
    # literal "\\n" (backslash + n) does not decode to a newline, then the
    # single-char escapes, then sentinel → backslash. \x00 cannot appear in a
    # valid line (control chars are dropped by _escape_literal).
    unescaped = F.col("lex")
    for pat, rep in ((r"\\\\", "\x00"), (r"\\n", "\n"), (r"\\r", "\r"),
                     (r"\\t", "\t"), (r'\\"', '"')):
        unescaped = F.regexp_replace(unescaped, pat, rep)
    unescaped = F.regexp_replace(unescaped, "\x00", r"\\")
    is_iri = F.col("obj_iri") != ""
    value = F.when(is_iri, F.col("obj_iri")).otherwise(unescaped)
    datatype = (
        F.when(is_iri, F.lit(None).cast("string"))
        .when(F.col("lang_tag") != "", F.lit(RDF_LANGSTRING))
        .when(F.col("dt") != "", F.col("dt"))
        .otherwise(F.lit(XSD_STRING))
    )
    language = F.when(F.col("lang_tag") != "", F.col("lang_tag")).otherwise(F.col("language"))
    return parsed.select(
        language.alias("language"),
        "dataset",
        "subject",
        "predicate",
        value.alias("value"),
        F.lit(None).cast("string").alias("context"),
        datatype.alias("datatype"),
    )


def read_ntriples(spark, path: str) -> DataFrame:
    """Read a dataset=partitioned N-Triples dump back into quads."""
    lines = spark.read.text(path).withColumnRenamed("value", "line")
    # partition column `dataset` is recovered automatically when present
    return from_ntriples(lines)


# ---------------------------------------------------------------------------
# additional formatters + destinations
# ---------------------------------------------------------------------------


def _xml_escape(col: Column) -> Column:
    c = F.regexp_replace(col, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def to_trix(quads: DataFrame) -> DataFrame:
    """TriX triple elements (destinations/formatters/TriXBuilder.scala
    semantics), one <triple> per quad; the writer wraps the stream in the
    TriX/graph envelope. All Catalyst expressions — no Python."""
    is_iri = F.col("datatype").isNull()
    obj = (
        F.when(is_iri, F.concat(F.lit("<uri>"), _xml_escape(F.col("value")), F.lit("</uri>")))
        .when(
            F.col("datatype") == RDF_LANGSTRING,
            F.concat(
                F.lit('<plainLiteral xml:lang="'), F.col("language"), F.lit('">'),
                _xml_escape(F.col("value")), F.lit("</plainLiteral>"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('<typedLiteral datatype="'), F.col("datatype"), F.lit('">'),
                _xml_escape(F.col("value")), F.lit("</typedLiteral>"),
            )
        )
    )
    line = F.concat(
        F.lit("<triple><uri>"), _xml_escape(F.col("subject")),
        F.lit("</uri><uri>"), _xml_escape(F.col("predicate")), F.lit("</uri>"),
        obj, F.lit("</triple>"),
    )
    return quads.filter(valid_iri(F.col("subject")) & valid_iri(F.col("predicate"))).select(
        "dataset", "language", line.alias("line")
    )


def to_rdfjson(quads: DataFrame) -> DataFrame:
    """RDF/JSON-shaped lines (destinations/formatters RDFJSON semantics):
    one JSON object per quad — {"s":..,"p":..,"o":{type,value,datatype,lang}}.
    Built with to_json, fully JVM-side."""
    is_iri = F.col("datatype").isNull()
    o = F.struct(
        F.when(is_iri, F.lit("uri")).otherwise(F.lit("literal")).alias("type"),
        F.col("value").alias("value"),
        F.when(~is_iri & (F.col("datatype") != RDF_LANGSTRING), F.col("datatype")).alias("datatype"),
        F.when(F.col("datatype") == RDF_LANGSTRING, F.col("language")).alias("lang"),
    )
    line = F.to_json(F.struct(F.col("subject").alias("s"), F.col("predicate").alias("p"), o.alias("o")))
    return quads.select("dataset", "language", line.alias("line"))


def limit_per_dataset(quads: DataFrame, n: int) -> DataFrame:
    """LimitingDestination (destinations/LimitingDestination.scala): cap the
    quads written per dataset. Deterministic order before the cut."""
    from pyspark.sql import Window as W

    w = W.partitionBy("dataset").orderBy("subject", "predicate", "value")
    return (
        quads.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# post-processing file jobs (scripts/): DecodeHtmlEntities / DecodeHtmlText
# and FixNTriplesEncoding as DataFrame transformations
# ---------------------------------------------------------------------------

import pandas as pd  # noqa: E402  (pandas_udf type hints need module scope)
from pyspark.sql.types import StringType  # noqa: E402

def escape_ntriples_line(s: str) -> str:
    """TurtleEscaper.escapeTurtle (FixNTriplesEncoding.scala:83-149):
    re-escape raw non-ASCII code points in an N-Triples line to \\uXXXX /
    \\UXXXXXXXX (plus \\n \\r \\t), leaving quotes and backslashes alone —
    the line is assumed to be mostly-valid N-Triples with stray raw
    unicode."""
    out = []
    changed = False
    for ch in s:
        code = ord(ch)
        if ch == "\n":
            out.append("\\n"); changed = True
        elif ch == "\r":
            out.append("\\r"); changed = True
        elif ch == "\t":
            out.append("\\t"); changed = True
        elif 0x20 <= code < 0x7F:
            out.append(ch)
        elif code <= 0xFFFF:
            out.append(f"\\u{code:04X}"); changed = True
        else:
            out.append(f"\\U{code:08X}"); changed = True
    return "".join(out) if changed else s


def fix_ntriples_encoding(lines: DataFrame, column: str = "line") -> DataFrame:
    """FixNTriplesEncoding (scripts/.../FixNTriplesEncoding.scala:34-80) as
    a map-only DataFrame pass over N-Triples lines — the reference streams
    files through a per-line TurtleEscaper; here the same escaper runs as
    an Arrow-batched pandas UDF (per-codepoint escaping has no Catalyst
    expression)."""
    @F.pandas_udf(StringType())
    def esc(col: pd.Series) -> pd.Series:
        return col.map(lambda s: escape_ntriples_line(s) if s is not None else None)

    return lines.withColumn(column, esc(F.col(column)))


def decode_html_entities(
    quads: DataFrame, datasets: set[str], *, literals_only: bool = False
) -> DataFrame:
    """DecodeHtmlEntities / DecodeHtmlText (scripts/.../DecodeHtmlText.scala:
    23-80): decode HTML character references in the values of the selected
    datasets (labels / abstracts in the reference's example call).  The
    reference's HtmlCoder(XmlCodes.NONE) plain-decodes named + numeric
    entities; Python's html.unescape is the equivalent, with HTML5
    prefix-matching semantics for unterminated references (documented
    divergence — the reference counts those as parse errors instead).
    ``literals_only`` restricts decoding to literal rows (datatype present),
    the usual safe mode; the default decodes every value like the
    reference's QuadMapper pass."""
    import html

    @F.pandas_udf(StringType())
    def dec(col: pd.Series) -> pd.Series:
        return col.map(lambda s: html.unescape(s) if s is not None and "&" in s else s)

    # filter → decode → union, NOT a when(): Catalyst extracts Python UDFs
    # out of CASE WHEN into an unconditional ArrowEvalPython stage, so the
    # when() form would ship EVERY row's value through Python even when the
    # job is scoped to one dataset
    in_scope = F.col("dataset").isin(list(datasets))
    if literals_only:
        in_scope = in_scope & F.col("datatype").isNotNull()
    decoded = quads.filter(in_scope).withColumn("value", dec(F.col("value")))
    return decoded.unionByName(quads.filter(~in_scope))
