"""Corpus derived from /root/testdata documents.parquet (driver contract).

Each document row becomes one wikitext page via an EXACT format template.
Because the template is deterministic string construction, every extractor
output is independently reconstructable in ANSI SQL — which is what the
driver's DuckDB oracle does (see __spark_entry__.oracle_sql). This makes the
whole parse → extract path SQL-checkable, not just the relational tail.

Template (article pages; ``doc_id % 50 == 3`` pages are redirects):

    '''Doc {id}''' is document number {id}. See [[Doc {a}|next doc]] and [[Doc {b}]].

    {{Infobox document
    | name = Doc {id}
    | chars = {n_chars}
    | source = {source}
    | homepage = [http://corpus.example.org/doc/{id}]
    }}

    == Body ==
    {text}

    [[Category:Source {source}]]

with a = (id+1) % N, b = (id+7) % N, N = row count. Redirect pages:
``#REDIRECT [[Doc {(id+11) % N}]]`` (redirect targets are never redirects:
id%50==3 and (id+11)%50==3 cannot hold simultaneously).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .sources import read_table

ARTICLE_FMT = (
    "'''Doc %d''' is document number %d. See [[Doc %d|next doc]] and [[Doc %d]].\n"
    "\n"
    "{{Infobox document\n"
    "| name = Doc %d\n"
    "| chars = %d\n"
    "| source = %s<ref>from %s</ref>"
    "<ref>{{cite web|url=http://src.example.org/doc/%d|title=Doc %d}}</ref>\n"
    "| published = {{Start date|%d|%d|%d}}\n"
    "| homepage = [http://corpus.example.org/doc/%d]\n"
    "| motto = {{lang|fr|Motto %d}}\n"
    "| alias = {{nowrap|Doc %d alias}}\n"
    "}}\n"
    "\n"
    "== Body ==\n"
    "%s\n"
    "\n"
    "[[File:Doc image %d.png|thumb]]\n"
    "[[Category:Source %s]]\n"
)

# planted template-date components (SQL-reconstructable):
#   year = 1900 + doc_id % 120, month = 1 + doc_id % 12, day = 1 + doc_id % 28
SQL_PUB_Y = "(1900 + doc_id % 120)"
SQL_PUB_M = "(1 + doc_id % 12)"
SQL_PUB_D = "(1 + doc_id % 28)"
SQL_PUB_DATE = f"printf('%04d-%02d-%02d', {SQL_PUB_Y}, {SQL_PUB_M}, {SQL_PUB_D})"

REDIRECT_FMT = "#REDIRECT [[Doc %d]]\n"


def corpus_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    n = docs.count()
    lang = F.when(F.col("lang").isin("en", "de", "fr"), F.col("lang")).otherwise(F.lit("en"))
    a = (F.col("doc_id") + 1) % n
    b = (F.col("doc_id") + 7) % n
    r = (F.col("doc_id") + 11) % n
    is_redirect = F.col("doc_id") % 50 == 3
    content = F.when(is_redirect, F.format_string(REDIRECT_FMT, r)).otherwise(
        F.format_string(
            ARTICLE_FMT,
            F.col("doc_id"),
            F.col("doc_id"),
            a,
            b,
            F.col("doc_id"),
            F.col("n_chars"),
            F.col("source"),
            F.col("source"),
            F.col("doc_id"),
            F.col("doc_id"),
            F.lit(1900) + F.col("doc_id") % 120,
            F.lit(1) + F.col("doc_id") % 12,
            F.lit(1) + F.col("doc_id") % 28,
            F.col("doc_id"),
            F.col("doc_id"),
            F.col("doc_id"),
            F.col("text"),
            F.col("doc_id"),
            F.col("source"),
        )
    )
    return docs.select(
        F.col("source").alias("repo"),
        F.format_string("docs/Doc_%d.wiki", F.col("doc_id")).alias("path"),
        F.md5(F.col("text")).alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


# Wikidata-JSON corpus derived from customer.parquet -------------------------
#
# One Wikidata entity document per customer row, every field a deterministic
# function of c_custkey / c_name / c_mktsegment — so the whole wikidata path
# (polymorphic snak parse → typed quads → R2R) is SQL-oracle-checkable.
# claims precede sitelinks in document order on purpose: a polymorphic snak
# must never truncate what follows (ADVICE r2).

WIKIDATA_ENTITY_FMT = (
    '{"id":"Q%d",'
    '"labels":{"en":{"language":"en","value":"%s"},'
    '"de":{"language":"de","value":"Kunde %d"}},'
    '"descriptions":{"en":{"language":"en","value":"%s customer"}},'
    '"aliases":{"en":[{"language":"en","value":"Cust %d"}]},'
    '"claims":{'
    '"P31":[{"mainsnak":{"snaktype":"value","datavalue":{"value":'
    '{"entity-type":"item","id":"%s"},"type":"wikibase-entityid"}}}],'
    '"P569":[{"mainsnak":{"snaktype":"value","datavalue":{"value":'
    '{"time":"+%04d-%02d-%02dT00:00:00Z","precision":11},"type":"time"}}}],'
    '"P571":[{"mainsnak":{"snaktype":"value","datavalue":{"value":'
    '{"time":"+%04d-00-00T00:00:00Z","precision":9},"type":"time"}}}],'
    '"P1082":[{"mainsnak":{"snaktype":"value","datavalue":{"value":'
    '{"amount":"+%d","unit":"1"},"type":"quantity"}},"rank":"normal",'
    '"qualifiers":{"P585":[{"snaktype":"value","property":"P585",'
    '"datavalue":{"value":{"time":"+%04d-00-00T00:00:00Z","precision":9},'
    '"type":"time"}}]}},'
    '{"mainsnak":{"snaktype":"value","datavalue":{"value":'
    '{"amount":"+%d","unit":"1"},"type":"quantity"}},"rank":"deprecated"}],'
    '"P1448":[{"mainsnak":{"snaktype":"value","datavalue":{"value":'
    '{"text":"%s","language":"en"},"type":"monolingualtext"}}}],'
    '"P856":[{"mainsnak":{"snaktype":"value","datavalue":{"value":'
    '"http://customer.example.org/%d","type":"string"}},'
    '"references":[{"snaks":{"P854":[{"snaktype":"value","datavalue":{"value":'
    '"http://ref.example.org/%d","type":"string"}}]}}]}],'
    '"P18":[{"mainsnak":{"snaktype":"value","datavalue":{"value":'
    '"Customer %d.jpg","type":"string"}}}],'
    '"P625":[{"mainsnak":{"snaktype":"value","datavalue":{"value":'
    '{"latitude":%d,"longitude":%d},"type":"globecoordinate"}}}],'
    '"P570":[{"mainsnak":{"snaktype":"somevalue"}}]},'
    '"sitelinks":{"enwiki":{"site":"enwiki","title":"Customer %d"},'
    '"dewiki":{"site":"dewiki","title":"Customer %d"},'
    '"commonswiki":{"site":"commonswiki","title":"Customer %d"}}}'
)

# planted claim components (SQL twins on c_custkey)
SQL_WD_CLASS = ("CASE c_custkey % 3 WHEN 0 THEN 'Q5' WHEN 1 THEN 'Q515' "
                "ELSE 'Q43229' END")
SQL_WD_BIRTH_Y = "(1900 + c_custkey % 120)"
SQL_WD_BIRTH_M = "(1 + c_custkey % 12)"
SQL_WD_BIRTH_D = "(1 + c_custkey % 28)"
SQL_WD_BIRTH = (
    f"printf('%04d-%02d-%02d', {SQL_WD_BIRTH_Y}, {SQL_WD_BIRTH_M}, {SQL_WD_BIRTH_D})"
)
SQL_WD_FOUND_Y = "printf('%04d', 1800 + c_custkey % 200)"
SQL_WD_POP = "CAST((c_custkey * 7) % 10000 AS VARCHAR)"
# P585 point-in-time qualifier on the normal-rank P1082 statement
# (gYear precision 9) — exercises statement reification + qualifiers
SQL_WD_QUAL_Y = "(1950 + c_custkey % 70)"
# deprecated-rank second P1082 statement: in wikidata_raw (the raw extractor
# keeps every rank), filtered out of R2R by checkRank
SQL_WD_POP_OLD = "CAST((c_custkey * 3 + 1) % 10000 AS VARCHAR)"
SQL_WD_LAT = "CAST(c_custkey % 180 - 90 AS VARCHAR)"
SQL_WD_LNG = "CAST(c_custkey % 360 - 180 AS VARCHAR)"
SQL_WD_SUBJ = "'http://wikidata.dbpedia.org/resource/Q' || c_custkey"


def wikidata_corpus_from_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    cls = (
        F.when(k % 3 == 0, "Q5").when(k % 3 == 1, "Q515").otherwise("Q43229")
    )
    content = F.format_string(
        WIKIDATA_ENTITY_FMT,
        k, F.col("c_name"), k, F.col("c_mktsegment"), k,
        cls,
        F.lit(1900) + k % 120, F.lit(1) + k % 12, F.lit(1) + k % 28,
        F.lit(1800) + k % 200,
        (k * 7) % 10000,
        F.lit(1950) + k % 70,
        (k * 3 + 1) % 10000,
        F.col("c_name"),
        k, k, k,
        k % 180 - 90, k % 360 - 180,
        k, k, k,
    )
    return c.select(
        F.lit("wikidata").alias("repo"),
        F.format_string("entities/Q%d.json", k).alias("path"),
        F.md5(F.col("c_name")).alias("commit"),
        F.lit("wikidata").alias("lang"),
        content.alias("content"),
    )


# Wikidata Property-namespace corpus derived from supplier.parquet ------------
#
# One property page per supplier row: terms (labels/descriptions/aliases),
# an entity-valued statement (P1646 → another property), a quantity and a
# day-precision time statement, plus a source reference on the quantity
# statement — exercises WikidataPropertyExtractor + WikidataReferenceExtractor
# with SQL-reconstructable oracles.

WIKIDATA_PROPERTY_FMT = (
    '{"id":"P%d",'
    '"labels":{"en":{"language":"en","value":"property %s"},'
    '"de":{"language":"de","value":"Eigenschaft %d"}},'
    '"descriptions":{"en":{"language":"en","value":"tracks %s"}},'
    '"aliases":{"en":[{"language":"en","value":"p-alias %d"}]},'
    '"claims":{'
    '"P1646":[{"mainsnak":{"snaktype":"value","datavalue":{"value":'
    '{"entity-type":"property","id":"P%d"},"type":"wikibase-entityid"}}}],'
    '"P2302":[{"mainsnak":{"snaktype":"value","datavalue":{"value":'
    '{"amount":"+%d","unit":"1"},"type":"quantity"}},'
    '"references":[{"snaks":{"P854":[{"snaktype":"value","datavalue":{"value":'
    '"http://propref.example.org/%d","type":"string"}}]}}]}],'
    '"P580":[{"mainsnak":{"snaktype":"value","datavalue":{"value":'
    '{"time":"+%04d-%02d-%02dT00:00:00Z","precision":11},"type":"time"}}}]}}'
)

SQL_WDP_SUBJ = "'http://wikidata.dbpedia.org/resource/P' || s_suppkey"
SQL_WDP_SEE = "(1 + (s_suppkey * 3) % 100)"
SQL_WDP_QTY = "((s_suppkey * 11) % 5000)"
SQL_WDP_DATE = (
    "printf('%04d-%02d-%02d', 1950 + s_suppkey % 70, 1 + s_suppkey % 12, "
    "1 + s_suppkey % 28)"
)


def wikidata_property_corpus_from_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = read_table(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    content = F.format_string(
        WIKIDATA_PROPERTY_FMT,
        k, F.col("s_name"), k, F.col("s_name"), k,
        F.lit(1) + (k * 3) % 100,
        (k * 11) % 5000,
        k,
        F.lit(1950) + k % 70, F.lit(1) + k % 12, F.lit(1) + k % 28,
    )
    return s.select(
        F.lit("wikidata").alias("repo"),
        F.format_string("entities/P%d.json", k).alias("path"),
        F.md5(F.col("s_name")).alias("commit"),
        F.lit("wikidata").alias("lang"),
        content.alias("content"),
    )


# Wikidata Lexeme-namespace corpus derived from nation.parquet ----------------
#
# One lexeme page per nation row: a lemma with a space (underscore path), a
# mapped lexical category cycling noun/verb plus an unmapped Q-id (canonical
# wd-entity fallback), mapped language English, one form (representation,
# grammatical feature, IPA string statement) and one sense (two glosses, a
# commons-file statement that exercises the File: URL rewrite) plus an
# entity-valued lexeme claim — the WikidataLexemeExtractor surface with a
# SQL-reconstructable oracle.

WIKIDATA_LEXEME_FMT = (
    '{"type":"lexeme","id":"L%d",'
    '"lemmas":{"en":{"language":"en","value":"lex %d word"}},'
    '"lexicalCategory":"%s","language":"Q1860",'
    '"claims":{'
    '"P5402":[{"mainsnak":{"snaktype":"value","datavalue":{"value":'
    '{"entity-type":"lexeme","id":"L%d"},"type":"wikibase-entityid"}}}]},'
    '"forms":[{"id":"L%d-F1",'
    '"representations":{"en":{"language":"en","value":"lex %d words"}},'
    '"grammaticalFeatures":["Q110786"],'
    '"claims":{"P898":[{"mainsnak":{"snaktype":"value","datavalue":{"value":'
    '"/lex%d/","type":"string"}}}]}}],'
    '"senses":[{"id":"L%d-S1",'
    '"glosses":{"en":{"language":"en","value":"gloss %d"},'
    '"de":{"language":"de","value":"Glosse %d"}},'
    '"claims":{"P18":[{"mainsnak":{"snaktype":"value","datavalue":{"value":'
    '"Lex image %d.jpg","type":"string"}}}]}}]}'
)

# cycling category: nationkey%3==0 → noun (Q1084), 1 → verb (Q24905),
# 2 → Q99999999 (absent from the harvested map → wd-entity fallback)
SQL_LEX_CAT = (
    "CASE n_nationkey % 3 WHEN 0 THEN 'http://lex.dbpedia.org/noun' "
    "WHEN 1 THEN 'http://lex.dbpedia.org/verb' "
    "ELSE 'http://www.wikidata.org/entity/Q99999999' END"
)
SQL_LEX_ID = "(1 + n_nationkey)"
SQL_LEX_IRI = f"'http://lex.dbpedia.org/wikidata/L' || {SQL_LEX_ID}"


def wikidata_lexeme_corpus_from_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = read_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey") + 1
    cat = (
        F.when((k - 1) % 3 == 0, "Q1084")
        .when((k - 1) % 3 == 1, "Q24905")
        .otherwise("Q99999999")
    )
    content = F.format_string(
        WIKIDATA_LEXEME_FMT,
        k, k, cat, k + 1, k, k, k, k, k, k, k,
    )
    return n.select(
        F.lit("wikidata").alias("repo"),
        F.format_string("entities/L%d.json", k).alias("path"),
        F.md5(k.cast("string")).alias("commit"),
        F.lit("wikidata").alias("lang"),
        content.alias("content"),
    )


# File-namespace corpus derived from part.parquet -----------------------------
#
# One File-ns page per part row, extension cycling through the five media
# groups — exercises FileTypeExtractor's extension/mime/class typing with a
# SQL-reconstructable oracle.

SQL_FILE_EXT = ("CASE p_partkey % 5 WHEN 0 THEN 'jpg' WHEN 1 THEN 'png' "
                "WHEN 2 THEN 'ogg' WHEN 3 THEN 'webm' ELSE 'pdf' END")
SQL_FILE_MIME = ("CASE p_partkey % 5 WHEN 0 THEN 'image/jpeg' WHEN 1 THEN 'image/png' "
                 "WHEN 2 THEN 'audio/ogg' WHEN 3 THEN 'video/webm' "
                 "ELSE 'application/pdf' END")
SQL_FILE_CLASS = ("CASE p_partkey % 5 WHEN 0 THEN 'StillImage' WHEN 1 THEN 'StillImage' "
                  "WHEN 2 THEN 'Sound' WHEN 3 THEN 'MovingImage' ELSE 'StillImage' END")
SQL_FILE_ENC = f"'Part_' || p_partkey || '_photo.' || {SQL_FILE_EXT}"
SQL_FILE_SUBJ = f"'http://dbpedia.org/resource/File:' || {SQL_FILE_ENC}"


def file_corpus_from_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    ext = (
        F.when(k % 5 == 0, "jpg").when(k % 5 == 1, "png").when(k % 5 == 2, "ogg")
        .when(k % 5 == 3, "webm").otherwise("pdf")
    )
    return p.select(
        F.lit("media").alias("repo"),
        F.format_string("media/File:Part_%d_photo.%s.wiki", k, ext).alias("path"),
        F.md5(k.cast("string")).alias("commit"),
        F.lit("en").alias("lang"),
        F.format_string("== Summary ==\nImage of part %d.\n", k).alias("content"),
    )


# Media corpus derived from supplier.parquet ----------------------------------
#
# One Main-ns page per supplier whose infobox carries bare media file names
# (MediaExtractor path: no [[File:]] brackets) plus a {{Commons}} template.

MEDIA_PAGE_FMT = (
    "'''Supplier %d''' makes parts.\n"
    "\n"
    "{{Infobox company\n"
    "| logo = Supplier %d logo.png\n"
    "| jingle = Supplier %d jingle.ogg\n"
    "| promo = Supplier %d promo.webm\n"
    "}}\n"
    "{{Commons|Supplier %d}}\n"
    "{{VN\n"
    "| en = Blue supplier %d, Bluish supplier\n"
    "| de = Blauer Lieferant %d\n"
    "| fr = Fournisseur bleu %d\n"
    "}}\n"
)


def media_corpus_from_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = read_table(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    return s.select(
        F.lit("media").alias("repo"),
        F.format_string("s/Supplier_%d.wiki", k).alias("path"),
        F.md5(k.cast("string")).alias("commit"),
        F.lit("en").alias("lang"),
        F.format_string(MEDIA_PAGE_FMT, k, k, k, k, k, k, k, k).alias("content"),
    )


# Person corpus derived from nation.parquet -----------------------------------
#
# One Main-ns person page per nation row exercising the extractors that were
# previously golden-only: Persondata, Pnd, Gender (pronoun argmax), Geo
# (root {{coord}}), Citation, InterLanguageLinks, plus the Infobox person
# mapping (instance types + foaf:name) — all SQL-reconstructable.

PERSON_PAGE_FMT = (
    "'''Explorer %d''' is a famous navigator from [[Place %d]].\n"
    "\n"
    "{{Infobox person\n"
    "| name = Explorer %d\n"
    "}}\n"
    "{{coord|%d|%d}}\n"
    "he traveled and his ship carried him while he studied; his notes survive.\n"
    "\n"
    "{{Persondata\n"
    "| NAME = %s, Explorer\n"
    "| SHORT DESCRIPTION = navigator\n"
    "| DATE OF BIRTH = %d March %d\n"
    "| PLACE OF BIRTH = [[Place %d]]\n"
    "}}\n"
    "{{Normdaten|PND=%09d}}\n"
    "{{cite web | url = http://cite.example.org/nation/%d | title = Voyage %d}}\n"
    "[[de:Explorer %d]]\n"
)

SQL_PERSON_SUBJ = "'http://dbpedia.org/resource/Explorer_' || n_nationkey"
SQL_PERSON_BIRTH = "printf('%04d-03-%02d', 1900 + n_nationkey % 90, 1 + n_nationkey % 28)"
SQL_PERSON_LAT = "printf('%d.0', n_nationkey % 80)"
SQL_PERSON_LON = "printf('%d.0', n_nationkey % 160)"
SQL_PERSON_PND = "printf('%09d', n_nationkey)"


# companion pages per nation row: a Template-ns page with {{{param}}}
# declarations, a Category page with a blank-sort-label main article
# (TopicalConcepts) + a parent category (skos:broader), and a
# disambiguation page (contains rule)
TEMPLATE_PAGE_FMT = "Box for {{{name}}} entries from {{{place|Somewhere}}}.\n"
CATEGORY_PAGE_FMT = (
    "Pages about explorer %d.\n[[Explorer %d| ]]\n[[Category:People %d]]\n"
)
DISAMBIG_PAGE_FMT = (
    "'''Explorer %d''' may refer to:\n\n{{Disambiguation}}\n"
    "* [[Explorer %d]]\n* [[Unrelated Thing %d]]\n"
)


def person_corpus_from_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = read_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")

    def page(path_fmt, content, *content_args):
        return n.select(
            F.lit("people").alias("repo"),
            F.format_string(path_fmt, k).alias("path"),
            F.md5(F.concat(F.lit(path_fmt), k.cast("string"))).alias("commit"),
            F.lit("en").alias("lang"),
            (F.format_string(content, *content_args) if content_args else F.lit(content)).alias("content"),
        )

    person = page(
        "p/Explorer_%d.wiki", PERSON_PAGE_FMT,
        k, k, k, k % 80, k % 160, F.col("n_name"),
        F.lit(1) + k % 28, F.lit(1900) + k % 90, k, k, k, k, k,
    )
    template = page("p/Template:Explorer_box_%d.wiki", TEMPLATE_PAGE_FMT)
    category = page("p/Category:Explorers_%d.wiki", CATEGORY_PAGE_FMT, k, k, k)
    disambig = page("p/Explorer_%d_(disambiguation).wiki", DISAMBIG_PAGE_FMT, k, k, k)
    return person.unionByName(template).unionByName(category).unionByName(disambig)


# Mapping-suggestion corpus derived from part.parquet -------------------------
#
# One Template-ns page per part row whose infobox source carries the
# Wikidata-fallback shapes the InfoboxMappings analysis extractors mine:
# conditional {{#property:Pnnn}} fallbacks (term mining + hints), a
# single-{{{param}}} row (the param=>Pnnn mapping shape), an
# {{#invoke:Wikidata}} row and a {{Wikidatacheck}} hint template — every
# property id a deterministic function of p_partkey.

MAPPING_TEMPLATE_PAGE_FMT = (
    "{{Infobox part\n"
    "| website = {{#if:{{{website|}}}|{{{website}}}|{{#property:P%d}}}}\n"
    "| mass = {{#ifeq: {{{mass_kg|}}} | FETCH_WIKIDATA | {{#property:P%d}} | {{{mass_kg}}} }}\n"
    "| mast = {{#if:{{{mast|}}}|{{#property:P2043}}}}\n"
    "| operator = {{#invoke:Wikidata|getValue|P%d|FETCH_WIKIDATA}}\n"
    "}}\n"
    "{{Wikidatacheck|p=%d}}\n"
)

SQL_IBM_SUBJ = "'http://dbpedia.org/resource/Template:Part_box_' || p_partkey"
SQL_IBM_WEBSITE_P = "(856 + p_partkey % 4)"
SQL_IBM_MASS_P = "(2067 + p_partkey % 3)"
SQL_IBM_INVOKE_P = "(625 + p_partkey % 5)"
SQL_IBM_CHECK_P = "(p_partkey % 1000)"


def mapping_corpus_from_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    return p.select(
        F.lit("mappings").alias("repo"),
        F.format_string("t/Template:Part_box_%d.wiki", k).alias("path"),
        F.md5(k.cast("string")).alias("commit"),
        F.lit("en").alias("lang"),
        F.format_string(
            MAPPING_TEMPLATE_PAGE_FMT,
            F.lit(856) + k % 4,
            F.lit(2067) + k % 3,
            F.lit(625) + k % 5,
            k % 1000,
        ).alias("content"),
    )


# SQL fragments shared by the oracle twins (DuckDB dialect) -----------------

SQL_LANG = "CASE WHEN lang IN ('en','de','fr') THEN lang ELSE 'en' END"
SQL_RES_BASE = (
    "CASE WHEN " + SQL_LANG + " = 'en' THEN 'http://dbpedia.org/resource/' "
    "ELSE 'http://' || " + SQL_LANG + " || '.dbpedia.org/resource/' END"
)
SQL_PROP_BASE = (
    "CASE WHEN " + SQL_LANG + " = 'en' THEN 'http://dbpedia.org/property/' "
    "ELSE 'http://' || " + SQL_LANG + " || '.dbpedia.org/property/' END"
)
SQL_SUBJ = SQL_RES_BASE + " || 'Doc_' || doc_id"
SQL_N = "(SELECT count(*) FROM documents)"
SQL_IS_REDIRECT = "(doc_id % 50 = 3)"


# Image-meta corpus derived from part.parquet ---------------------------------
#
# Main pages carrying bare infobox image names + one [[File:]] link, plus
# File pages declaring a non-free license for every 5th photo — exercising
# the full ImageExtractorNew surface (bare-name harvest, non-free exclusion,
# first-free-image thumbnail, special-image classification).

def image_corpus_from_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    flag_line = F.when(k % 3 == 0, F.format_string("| flag = Flag of Part %d.svg\n", k)).otherwise("")
    map_line = F.when(k % 4 == 0, F.format_string("| map = Part %d location map.png\n", k)).otherwise("")
    main_pages = p.select(
        F.lit("imagemeta").alias("repo"),
        F.format_string("i/Image_page_%d.wiki", k).alias("path"),
        F.md5(k.cast("string")).alias("commit"),
        F.lit("en").alias("lang"),
        F.concat(
            F.format_string("'''Image page %d''' shows part %d.\n{{Infobox part\n| photo = Part %d photo.jpg\n", k, k, k),
            flag_line,
            map_line,
            F.format_string("}}\n[[File:Part %d extra.png|thumb]]\n", k),
        ).alias("content"),
    )
    file_pages = p.filter(k % 5 == 0).select(
        F.lit("imagemeta").alias("repo"),
        F.format_string("i/File:Part_%d_photo.jpg.wiki", k).alias("path"),
        F.md5(F.concat(k.cast("string"), F.lit("f"))).alias("commit"),
        F.lit("en").alias("lang"),
        F.format_string("{{Non-free logo}}\nPhoto of part %d.\n", k).alias("content"),
    )
    return main_pages.unionByName(file_pages)
