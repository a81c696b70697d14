"""NIF datasets: context, text links, page structure.

Re-expresses the reference's NIF group (mappings/NifExtractor.scala:107,
mappings/nif/*) over the parse columns — pure Catalyst expressions, no
Python. The reference computes offsets over MediaWiki-rendered HTML; this
engine has no rendering API, so offsets are DETERMINISTIC over the engine's
own ``plain_text`` rendering (documented substitute, same spirit as the
short-abstract substitute in structural.py):

- ``nif_context`` (nif/WikipediaNifExtractor.scala context node): one
  nif:Context per article with beginIndex 0, endIndex = len(plain_text),
  nif:isString = plain_text, nif:sourceUrl = the wikipedia page IRI.
- ``nif_text_links`` (nif/LinkExtractor.scala): one nif:Phrase per Main-ns
  link whose anchor occurs in plain_text — begin/end character offsets via
  first occurrence, nif:anchorOf + itsrdf:taIdentRef to the link target.
- ``nif_page_structure`` (nif/WikipediaNifExtractor.scala sections):
  nif:Section nodes per parsed section, linked via nif:hasSection /
  nif:referenceContext. Section character offsets are NOT emitted — headings
  are stripped from plain_text, so there is no honest offset to give.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .namespaces import MAIN, RDF_LANGSTRING, RDF_TYPE, XSD_NONNEG_INT

NIF = "http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#"
ITSRDF_TA_IDENT_REF = "http://www.w3.org/2005/11/its/rdf#taIdentRef"

NIF_CONTEXT = "nif_context"
NIF_TEXT_LINKS = "nif_text_links"
NIF_PAGE_STRUCTURE = "nif_page_structure"


def _quad(ds: str, lang: Column, s: Column, p: str, v: Column, dt=None) -> list[Column]:
    return [
        lang.alias("language"),
        F.lit(ds).alias("dataset"),
        s.cast("string").alias("subject"),
        F.lit(p).alias("predicate"),
        v.cast("string").alias("value"),
        F.lit(None).cast("string").alias("context"),
        F.lit(dt).cast("string").alias("datatype"),
    ]


def nif_quads(parsed: DataFrame) -> DataFrame:
    """Main-ns non-redirect pages → nif_context + nif_text_links +
    nif_page_structure quads."""
    pages = parsed.filter(
        (F.col("namespace") == MAIN)
        & F.col("redirect_target").isNull()
        & F.col("plain_text").isNotNull()
    ).select("lang", "page_iri", "plain_text", "links", "sections")
    ctx = F.concat(F.col("page_iri"), F.lit("?nif=context"))
    lang = F.col("lang")

    context = None
    for part in (
        pages.select(*_quad(NIF_CONTEXT, lang, ctx, RDF_TYPE, F.lit(NIF + "Context"))),
        pages.select(*_quad(NIF_CONTEXT, lang, ctx, NIF + "beginIndex", F.lit("0"),
                            XSD_NONNEG_INT)),
        pages.select(*_quad(NIF_CONTEXT, lang, ctx, NIF + "endIndex",
                            F.length("plain_text").cast("string"), XSD_NONNEG_INT)),
        pages.select(*_quad(NIF_CONTEXT, lang, ctx, NIF + "isString",
                            F.col("plain_text"), RDF_LANGSTRING)),
        pages.select(*_quad(NIF_CONTEXT, lang, ctx, NIF + "sourceUrl", F.col("page_iri"))),
    ):
        context = part if context is None else context.unionByName(part)

    # text links: anchor located in plain_text (first occurrence); links
    # whose anchor does not occur (e.g. markup-only anchors) are skipped
    li = pages.select(
        lang, F.col("page_iri"), F.col("plain_text"), ctx.alias("ctx"),
        F.explode(F.filter(F.col("links"), lambda l: l["ns"] == MAIN)).alias("l"),
    ).select(
        "lang", "page_iri", "plain_text", "ctx",
        F.coalesce(F.col("l.label"), F.col("l.target")).alias("anchor"),
        F.col("l.iri").alias("target_iri"),
    ).withColumn(
        # F.locate only takes a literal needle — use the SQL form for
        # column-against-column first-occurrence search
        "pos", F.expr("locate(anchor, plain_text)")
    )
    li = li.filter(F.col("pos") > 0)
    begin = (F.col("pos") - 1).cast("long")
    end = (begin + F.length("anchor")).cast("long")
    mention = F.concat(
        F.col("page_iri"), F.lit("?nif=phrase_"), begin.cast("string"),
        F.lit("_"), end.cast("string"),
    )
    lang2 = F.col("lang")
    links = None
    for part in (
        li.select(*_quad(NIF_TEXT_LINKS, lang2, mention, RDF_TYPE, F.lit(NIF + "Phrase"))),
        li.select(*_quad(NIF_TEXT_LINKS, lang2, mention, NIF + "referenceContext",
                         F.col("ctx"))),
        li.select(*_quad(NIF_TEXT_LINKS, lang2, mention, NIF + "beginIndex",
                         begin.cast("string"), XSD_NONNEG_INT)),
        li.select(*_quad(NIF_TEXT_LINKS, lang2, mention, NIF + "endIndex",
                         end.cast("string"), XSD_NONNEG_INT)),
        li.select(*_quad(NIF_TEXT_LINKS, lang2, mention, NIF + "anchorOf",
                         F.col("anchor"), RDF_LANGSTRING)),
        li.select(*_quad(NIF_TEXT_LINKS, lang2, mention, ITSRDF_TA_IDENT_REF,
                         F.col("target_iri"))),
    ):
        links = part if links is None else links.unionByName(part)

    # page structure: per-section nodes (line number disambiguates repeats)
    se = pages.select(
        lang, F.col("page_iri"), ctx.alias("ctx"), F.explode("sections").alias("s")
    ).select(
        "lang", "page_iri", "ctx",
        F.concat(F.col("page_iri"), F.lit("?nif=section_"),
                 F.col("s.line").cast("string")).alias("node"),
    )
    lang3 = F.col("lang")
    structure = None
    for part in (
        se.select(*_quad(NIF_PAGE_STRUCTURE, lang3, F.col("node"), RDF_TYPE,
                         F.lit(NIF + "Section"))),
        se.select(*_quad(NIF_PAGE_STRUCTURE, lang3, F.col("node"),
                         NIF + "referenceContext", F.col("ctx"))),
        se.select(*_quad(NIF_PAGE_STRUCTURE, lang3, F.col("ctx"), NIF + "hasSection",
                         F.col("node"))),
    ):
        structure = part if structure is None else structure.unionByName(part)

    return context.unionByName(links).unionByName(structure)
