"""Wikidata-JSON extractor core (mappings/wikidata/* group).

Re-expresses the reference's wikidata extractors over rows whose ``content``
column carries a Wikidata entity JSON document — 100% Catalyst
(``from_json`` with a fixed pruned schema + explodes), no Python:

- WikidataLabelExtractor (:28-51): labels → rdfs:label langStrings,
  per-language dataset ``wikidata_labels``.
- WikidataDescriptionExtractor: descriptions → dbo:description.
- WikidataAliasExtractor (:40-50): aliases → skos:altLabel (the dataset the
  reference routes via its alias property mapping).
- WikidataSameAsExtractor (:28-48): sitelinks → owl:sameAs to each
  language-DBpedia resource IRI.
- WikidataRawExtractor (entity-valued statements): claims whose mainsnak is
  a wikibase-entityid → (subject, wikidata property IRI, entity IRI) in
  ``wikidata_raw``. String/time/quantity snaks are a fixed-schema mismatch
  (polymorphic JSON) and are left to a mapping pass — documented subset.

The ``from_json`` schema prunes everything else, so at dump scale the JSON
tokenizer only materializes the five branches used (Jackson skips the rest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from . import vocab as V
from .namespaces import RDF_LANGSTRING, RDFS_LABEL

WD_RESOURCE = "http://wikidata.dbpedia.org/resource/"
WD_PROPERTY = "http://www.wikidata.org/prop/direct/"
DBO_DESCRIPTION = "http://dbpedia.org/ontology/description"
SKOS_ALT_LABEL = "http://www.w3.org/2004/02/skos/core#altLabel"

WIKIDATA_LABELS = "wikidata_labels"
WIKIDATA_DESCRIPTIONS = "wikidata_descriptions"
WIKIDATA_ALIASES = "wikidata_aliases"
WIKIDATA_SAME_AS = "wikidata_same_as"
WIKIDATA_RAW = "wikidata_raw"

_TERM = T.StructType(
    [T.StructField("language", T.StringType()), T.StructField("value", T.StringType())]
)
ENTITY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("labels", T.MapType(T.StringType(), _TERM)),
        T.StructField("descriptions", T.MapType(T.StringType(), _TERM)),
        T.StructField("aliases", T.MapType(T.StringType(), T.ArrayType(_TERM))),
        T.StructField(
            "sitelinks",
            T.MapType(
                T.StringType(),
                T.StructType(
                    [T.StructField("site", T.StringType()), T.StructField("title", T.StringType())]
                ),
            ),
        ),
        T.StructField(
            "claims",
            T.MapType(
                T.StringType(),
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField(
                                "mainsnak",
                                T.StructType(
                                    [
                                        T.StructField("snaktype", T.StringType()),
                                        T.StructField(
                                            "datavalue",
                                            T.StructType(
                                                [
                                                    T.StructField(
                                                        "value",
                                                        T.StructType(
                                                            [T.StructField("id", T.StringType())]
                                                        ),
                                                    ),
                                                    T.StructField("type", T.StringType()),
                                                ]
                                            ),
                                        ),
                                    ]
                                ),
                            )
                        ]
                    )
                ),
            ),
        ),
    ]
)


def _quad(ds: str, lang: Column, s: Column, p, v: Column, dt=None) -> list[Column]:
    return [
        lang.alias("language"),
        F.lit(ds).alias("dataset"),
        s.cast("string").alias("subject"),
        (F.lit(p) if isinstance(p, str) else p).cast("string").alias("predicate"),
        v.cast("string").alias("value"),
        F.lit(None).cast("string").alias("context"),
        (F.lit(dt) if (dt is None or isinstance(dt, str)) else dt).cast("string").alias("datatype"),
    ]


def wikidata_quads(df: DataFrame) -> DataFrame:
    """rows(content = wikidata entity JSON) → quads. Rows whose content does
    not parse to an entity (no id) are dropped."""
    e = df.select(F.from_json(F.col("content"), ENTITY_SCHEMA).alias("e")).filter(
        F.col("e.id").isNotNull()
    )
    subj = F.concat(F.lit(WD_RESOURCE), F.col("e.id"))
    ent = e.select(subj.alias("s"), "e.*")

    labels = ent.select(
        F.col("s"), F.explode_outer("labels").alias("k", "t")
    ).filter(F.col("t.value").isNotNull()).select(
        *_quad(WIKIDATA_LABELS, F.col("t.language"), F.col("s"), RDFS_LABEL,
               F.col("t.value"), RDF_LANGSTRING)
    )
    descriptions = ent.select(
        F.col("s"), F.explode_outer("descriptions").alias("k", "t")
    ).filter(F.col("t.value").isNotNull()).select(
        *_quad(WIKIDATA_DESCRIPTIONS, F.col("t.language"), F.col("s"), DBO_DESCRIPTION,
               F.col("t.value"), RDF_LANGSTRING)
    )
    aliases = (
        ent.select(F.col("s"), F.explode_outer("aliases").alias("k", "arr"))
        .select(F.col("s"), F.explode("arr").alias("t"))
        .filter(F.col("t.value").isNotNull())
        .select(
            *_quad(WIKIDATA_ALIASES, F.col("t.language"), F.col("s"), SKOS_ALT_LABEL,
                   F.col("t.value"), RDF_LANGSTRING)
        )
    )
    # sitelinks 'xxwiki' → http://xx.dbpedia.org/resource/<Title> (enwiki →
    # the generic domain, WikidataSameAsExtractor.scala:40-48)
    sl = ent.select(F.col("s"), F.explode_outer("sitelinks").alias("k", "t")).filter(
        F.col("t.title").isNotNull() & F.col("k").endswith("wiki")
    )
    sl_lang = F.regexp_replace(F.col("k"), "wiki$", "")
    sl_base = F.when(
        sl_lang == "en", F.lit("http://dbpedia.org/resource/")
    ).otherwise(F.concat(F.lit("http://"), sl_lang, F.lit(".dbpedia.org/resource/")))
    same_as = sl.select(
        *_quad(WIKIDATA_SAME_AS, sl_lang, F.col("s"), V.OWL_SAME_AS,
               F.concat(sl_base, F.regexp_replace(F.col("t.title"), " ", "_")))
    )
    claims = (
        ent.select(F.col("s"), F.explode_outer("claims").alias("prop", "stmts"))
        .select(F.col("s"), F.col("prop"), F.explode("stmts").alias("st"))
        .filter(F.col("st.mainsnak.datavalue.value.id").isNotNull())
        .select(
            *_quad(
                WIKIDATA_RAW,
                F.lit("wikidata"),
                F.col("s"),
                F.concat(F.lit(WD_PROPERTY), F.col("prop")),
                F.concat(F.lit(WD_RESOURCE), F.col("st.mainsnak.datavalue.value.id")),
            )
        )
    )
    out = labels
    for part in (descriptions, aliases, same_as, claims):
        out = out.unionByName(part)
    return out
