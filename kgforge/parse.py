"""The parse stage: corpus DataFrame → corpus + derived + nested feature cols.

One Arrow-batched ``mapInPandas`` pass replaces the reference's
parse-once-share-AST design (WikiPage.scala:39 lazy pageNode +
CompositeParseExtractor.scala:34-43): the page is parsed exactly once and all
extractors downstream are pure Catalyst expressions over the nested columns.
Nested-schema pruning keeps unused feature columns out of physical plans.

Derived columns (title / namespace / page ids / subject IRI / sha256) are
Spark-native expressions wherever possible; only the grammar itself and wiki
IRI-encoding run in Python (vectorized per Arrow batch — no per-row UDFs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from . import wikitext
from .namespaces import (
    CATEGORY,
    MAIN,
    NS_BY_NAME,
    TEMPLATE,
    normalize_title,
    resource_base,
    title_with_namespace,
    wiki_encode,
)
from .schema import PARSE_FEATURE_FIELDS


def _stable_id(col):
    """Deterministic 60-bit id from a string key: first 15 hex digits of
    sha256 — reproducible in plain Python (hashlib) for oracles, unlike
    xxhash64. Replaces the reference's dump-provided page/revision ids
    (WikiPage.scala:25-34) which our corpus does not carry."""
    return F.conv(F.substring(F.sha2(col, 256), 1, 15), 16, 10).cast("long")


def derive_page_columns(corpus: DataFrame) -> DataFrame:
    """(repo, path, commit, lang, content) → + title, namespace, page_id,
    revision_id, content_sha256.

    Mirrors WikiPage title/id derivation (WikiPage.scala:25-34,
    WikiTitle.parse) transposed onto the source-code corpus: the page title is
    the file stem of ``path`` (``docs/Template:Foo.wiki`` → ``Template:Foo``),
    the namespace comes from its prefix. Page/revision ids are deterministic
    64-bit hashes of the identity / identity+commit (stable across runs and
    cluster sizes). The sha256 column is the per-row invariant carried through
    the pipeline unchanged.
    """
    stem = F.regexp_extract(F.col("path"), r"([^/]+?)(?:\.[A-Za-z0-9]+)?$", 1)
    raw_title = F.regexp_replace(stem, "_", " ")
    prefix = F.lower(F.trim(F.regexp_extract(raw_title, r"^([^:]+):", 1)))
    ns_map = F.create_map(
        *[x for k, v in NS_BY_NAME.items() for x in (F.lit(k), F.lit(v))]
    )
    ns = F.coalesce(ns_map[prefix], F.lit(MAIN)).cast("int")
    title_rest = F.when(ns != MAIN, F.trim(F.regexp_extract(raw_title, r"^[^:]+:(.*)$", 1))).otherwise(
        F.trim(raw_title)
    )
    # first-letter capitalization (WikiUtil.wikiEncode)
    title = F.concat(F.upper(F.substring(title_rest, 1, 1)), F.expr("substring(title_rest_tmp, 2)"))
    out = (
        corpus.withColumn("title_rest_tmp", title_rest)
        .withColumn("title", title)
        .drop("title_rest_tmp")
        .withColumn("namespace", ns)
        .withColumn("page_id", _stable_id(F.concat_ws("|", "lang", "repo", "path")))
        .withColumn("revision_id", _stable_id(F.concat_ws("|", "lang", "repo", "path", "commit")))
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
    )
    return out


@F.pandas_udf(T.StringType())
def subject_iri_udf(lang: pd.Series, ns: pd.Series, title: pd.Series) -> pd.Series:
    """Subject IRI (WikiPage.scala:78): resource base + encoded
    title-with-namespace. Vectorized; the only Python cost is percent-encoding."""
    return pd.Series(
        [
            resource_base(lg) + wiki_encode(title_with_namespace(int(n), normalize_title(t or "")))
            for lg, n, t in zip(lang, ns, title)
        ]
    )


def with_subject_iri(df: DataFrame) -> DataFrame:
    return df.withColumn("subject", subject_iri_udf(F.col("lang"), F.col("namespace"), F.col("title")))


def parse_corpus(df: DataFrame) -> DataFrame:
    """Append the nested feature columns by parsing ``content`` once per row.

    Implementation: ``mapInPandas`` so an entire Arrow batch of pages is
    parsed per Python call (SparkExtractionJob.scala:96-109 amortizes operator
    construction per partition; we amortize per batch and compile the grammar
    regexes once per executor at module import)."""
    out_schema = T.StructType(list(df.schema.fields) + PARSE_FEATURE_FIELDS)

    def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [wikitext.parse(c) for c in pdf["content"]]
            pdf = pdf.copy()
            pdf["redirect_target"] = [r.redirect for r in rows]
            pdf["links"] = [
                [
                    {"target": l.target, "ns": l.ns, "iw": l.iw, "label": l.label, "line": l.line}
                    for l in r.links
                ]
                for r in rows
            ]
            pdf["external_links"] = [
                [{"uri": e.uri, "label": e.label, "line": e.line} for e in r.external_links]
                for r in rows
            ]
            pdf["templates"] = [
                [
                    {
                        "name": t.name,
                        "depth": t.depth,
                        "pos": t.pos,
                        "line": t.line,
                        "params": [
                            {"key": p.key, "value": p.value, "explicit": p.explicit}
                            for p in t.params
                        ],
                    }
                    for t in r.templates
                ]
                for r in rows
            ]
            pdf["param_decls"] = [list(r.param_decls) for r in rows]
            pdf["sections"] = [
                [{"name": s.name, "level": s.level, "line": s.line} for s in r.sections]
                for r in rows
            ]
            pdf["n_tables"] = pd.array([r.n_tables for r in rows], dtype="int32")
            pdf["plain_text"] = [r.plain for r in rows]
            pdf["abstract"] = [r.abstract for r in rows]
            pdf["parse_errors"] = pd.array([r.errors for r in rows], dtype="int32")
            yield pdf

    return df.mapInPandas(_parse_batches, schema=out_schema)


def prepare(corpus: DataFrame, namespaces: tuple[int, ...] = (MAIN, TEMPLATE, CATEGORY)) -> DataFrame:
    """Full input pipeline: derive page columns → namespace gate → parse →
    subject IRI. The namespace filter runs BEFORE the parse stage so pruned
    pages never pay the Python cost (pushdown analog of XMLSource.scala:32-53)."""
    df = derive_page_columns(corpus)
    if namespaces:
        df = df.filter(F.col("namespace").isin(list(namespaces)))
    return with_subject_iri(parse_corpus(df))
