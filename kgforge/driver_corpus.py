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
    "| source = %s<ref>from %s</ref>\n"
    "| published = {{Start date|%d|%d|%d}}\n"
    "| homepage = [http://corpus.example.org/doc/%d]\n"
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
            F.lit(1900) + F.col("doc_id") % 120,
            F.lit(1) + F.col("doc_id") % 12,
            F.lit(1) + F.col("doc_id") % 28,
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
