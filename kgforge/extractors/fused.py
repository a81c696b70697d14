"""Fused single-pass quad generation.

The per-extractor functions in ``structural.py`` are the readable, individually
testable form — but unioning 21 DataFrames scans the parsed cache 21 times and
multiplies task counts (measured 1184 tasks/stage at 32 partitions). This
module emits the SAME quads in ONE narrow pass: every extractor family is an
array-of-quad-structs expression, concatenated per page and exploded once.

    parsed (32 partitions) → select(quads_array) → explode → quad rows

No shuffle at all until the downstream dedup — the per-page aggregations the
branch version did with groupBy (first homepage URL, first root coordinate)
are array expressions / parse-time columns here. At 100 TB this is the
difference between 1 pass + 1 shuffle and 21 passes + 4 shuffles.

The only Python is one vectorized pandas UDF for the infobox typing cascade
(array-in / array-out, so it adds no explode-multiplied rows to the Arrow
channel).

Equivalence with the branch extractors is pinned by tests/test_end_to_end.py
(both must hit P/R = 1.0 against the golden oracle).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from .. import vocab as V
from ..dataparsers import _BR_SPLIT_RE, property_iri, property_label, type_value
from ..namespaces import (
    CATEGORY,
    FILE,
    MAIN,
    RDF_LANGSTRING,
    RDF_TYPE,
    RDFS_LABEL,
    TEMPLATE,
    XSD_INTEGER,
    XSD_NONNEG_INT,
    XSD_STRING,
)
from .structural import (
    _DISAMBIG_TEMPLATES,
    _HOMEPAGE_KEYS,
    _IGNORE_PROPS_BY_LANG,
    _IGNORE_TEMPLATE_RE,
    _IGNORE_TEMPLATES,
    _URL_IN_VALUE,
    _prop_base,
)

_XSD_FLOAT = "http://www.w3.org/2001/XMLSchema#float"

_QUAD_DDL = (
    "array<struct<dataset:string,subject:string,predicate:string,"
    "value:string,context:string,datatype:string>>"
)


def _q(dataset: str, s: Column, p, v: Column, dt=None) -> Column:
    pc = F.lit(p) if isinstance(p, str) else p
    dtc = F.lit(dt) if (dt is None or isinstance(dt, str)) else dt
    return F.struct(
        F.lit(dataset).alias("dataset"),
        s.cast("string").alias("subject"),
        pc.cast("string").alias("predicate"),
        v.cast("string").alias("value"),
        F.lit(None).cast("string").alias("context"),
        dtc.cast("string").alias("datatype"),
    )


def _guard(cond: Column, seg: Column) -> Column:
    return F.when(cond, seg).otherwise(F.expr(f"cast(array() as {_QUAD_DDL})"))


# --- infobox typing cascade: one array-in/array-out pandas UDF --------------

_IB_RESULT = T.ArrayType(
    T.StructType(
        [
            T.StructField("prop_iri", T.StringType()),
            T.StructField("prop_label", T.StringType()),
            T.StructField("value", T.StringType()),
            T.StructField("datatype", T.StringType()),
            # source provenance for the Hybrid raw/mapped split
            T.StructField("src_template", T.StringType()),
            T.StructField("src_key", T.StringType()),
        ]
    )
)

_IGNORE_RE = re.compile(_IGNORE_TEMPLATE_RE)
_PARENS_RE = re.compile(r"\s*\([^()]*\)")
_IGNORE_TPL_SET = frozenset(_IGNORE_TEMPLATES)
_IGNORE_PROPS_SETS = {lg: frozenset(v) for lg, v in _IGNORE_PROPS_BY_LANG.items()}
_IGNORE_PROP_SET = _IGNORE_PROPS_SETS["en"]


def make_infobox_props_udf(template_redirects: dict[str, str] | None = None):
    """InfoboxExtractor gates + extractValue cascade
    (InfoboxExtractor.scala:108-197), vectorized per Arrow batch.

    ``template_redirects`` (Template-ns redirect map, already chain-resolved)
    feeds the date parsers' template path (DateTimeParser.scala:110 resolves
    template names through context.redirects before the templateDateMap
    lookup). The dict ships in the UDF closure — broadcast-once state."""
    tred = template_redirects or {}
    resolve = (lambda n: tred.get(n, n)) if tred else None

    @F.pandas_udf(_IB_RESULT)
    def infobox_props_udf(lang: pd.Series, templates: pd.Series) -> pd.Series:
        out = []
        for lg, tpls in zip(lang, templates):
            res = []
            for t in tpls if tpls is not None else []:
                name_l = (t["name"] or "").lower()
                if name_l in _IGNORE_TPL_SET or _IGNORE_RE.match(name_l):
                    continue
                tparams = t["params"] if t["params"] is not None else []
                ignore = _IGNORE_PROPS_SETS.get(lg, _IGNORE_PROP_SET)
                params = [p for p in tparams if (p["key"] or "").lower() not in ignore]
                if not params:
                    continue
                explicit = [p for p in params if not (p["key"] or "").isdigit()]
                if len(explicit) < 2 or (len(explicit) / len(params)) <= 0.75:
                    continue
                for p in explicit:
                    v = (p["value"] or "").strip()
                    if not v:
                        continue
                    # split multi-values on <br> (splitPropertyNodeRegexInfobox)
                    # and strip parenthesized suffixes on plain parts
                    # (NodeUtil.removeParentheses, NodeUtil.scala:20-69)
                    for part in _BR_SPLIT_RE.split(v):
                        part = part.strip()
                        if not part:
                            continue
                        if "[[" not in part and "http" not in part:
                            part = _PARENS_RE.sub("", part).strip()
                        try:
                            r = type_value(lg, part, resolve_template=resolve)
                        except Exception:
                            r = None
                        if r is not None:
                            res.append(
                                {
                                    "prop_iri": property_iri(lg, p["key"]),
                                    "prop_label": property_label(p["key"]),
                                    "value": r[0],
                                    "datatype": r[1],
                                    "src_template": t["name"],
                                    "src_key": p["key"],
                                }
                            )
            out.append(res)
        return pd.Series(out)

    return infobox_props_udf


# default instance (no template redirects) — the branch extractors use this
infobox_props_udf = make_infobox_props_udf()


def fused_quads_per_page(
    parsed: DataFrame, template_redirects: dict[str, str] | None = None
) -> DataFrame:
    """(page_id, language, quads array<quad struct>) — the fused extractor
    suite with the final explode withheld. This is the DBpedia-Live
    per-page cache shape (live/.../publisher/DiffData.java:11-26 diffs the
    quad SET of one page; the reference keeps that set in a JSON cache):
    kgforge/live.py diffs two of these frames array-side per page, so an
    incremental re-extraction never shuffles at quad granularity."""
    subj = F.col("subject")
    pb = _prop_base()
    is_main = F.col("namespace") == MAIN
    is_cat = F.col("namespace") == CATEGORY
    is_tpl = F.col("namespace") == TEMPLATE
    is_redirect = F.col("redirect_target").isNotNull()
    internal = F.filter(F.col("links"), lambda l: l["iw"] == "")
    internal_main = F.filter(F.col("links"), lambda l: (l["iw"] == "") & (l["ns"] == MAIN))
    internal_cat = F.filter(F.col("links"), lambda l: (l["iw"] == "") & (l["ns"] == CATEGORY))
    interwiki = F.filter(F.col("links"), lambda l: l["iw"] != "")

    uses_tpl_pred = F.concat(pb, F.lit("wikiPageUsesTemplate"))

    # segments are THUNKS, not Columns: building the ~30 segment
    # expression trees costs ~14,000 serial py4j round trips (~1.7-2.3 s of
    # pure driver socket latency per construction, profiled r6) — they are
    # evaluated on a small thread pool at the end of this function, which
    # overlaps the round trips (construction only; the resulting plan is
    # byte-identical and order-preserving)
    segments: list = []

    # every namespace: ids (PageIdExtractor / RevisionIdExtractor)
    segments.append(lambda:
        F.array(
            _q(V.PAGE_IDS, subj, V.WIKI_PAGE_ID, F.col("page_id"), XSD_INTEGER),
            _q(V.REVISION_IDS, subj, V.WIKI_PAGE_REVISION_ID, F.col("revision_id"), XSD_INTEGER),
        )
    )
    # Main ns scalars: label, length, out-degree, wikipedia_links
    segments.append(lambda:
        _guard(
            is_main,
            F.array(
                _q(V.LABELS, subj, RDFS_LABEL, F.col("title"), RDF_LANGSTRING),
                _q(V.PAGE_LENGTH, subj, V.WIKI_PAGE_LENGTH, F.length("content"), XSD_NONNEG_INT),
                _q(V.OUT_DEGREE, subj, V.WIKI_PAGE_OUT_DEGREE, F.size(internal), XSD_NONNEG_INT),
                _q(V.WIKIPEDIA_LINKS, subj, V.FOAF_IS_PRIMARY_TOPIC_OF, F.col("page_iri")),
                _q(V.WIKIPEDIA_LINKS, F.col("page_iri"), V.FOAF_PRIMARY_TOPIC, subj),
                _q(V.WIKIPEDIA_LINKS, F.col("page_iri"), V.DC_LANGUAGE, F.col("lang"), XSD_STRING),
                _q(V.WIKIPEDIA_LINKS, F.col("page_iri"), RDF_TYPE, F.lit(V.FOAF_DOCUMENT)),
            ),
        )
    )
    # link families (PageLinks / AnchorText / ExternalLinks / ArticleCategories)
    segments.append(lambda:
        _guard(is_main, F.transform(internal, lambda l: _q(V.PAGE_LINKS, subj, V.WIKI_PAGE_WIKI_LINK, l["iri"])))
    )
    segments.append(lambda:
        _guard(
            is_main,
            F.transform(
                internal_main,
                lambda l: _q(V.ANCHOR_TEXT, l["iri"], V.WIKI_PAGE_WIKI_LINK_TEXT, l["label"], RDF_LANGSTRING),
            ),
        )
    )
    segments.append(lambda:
        _guard(
            is_main,
            F.transform(
                F.col("external_links"),
                lambda e: _q(V.EXTERNAL_LINKS, subj, V.WIKI_PAGE_EXTERNAL_LINK, e["uri"]),
            ),
        )
    )
    segments.append(lambda:
        _guard(is_main, F.transform(internal_cat, lambda l: _q(V.ARTICLE_CATEGORIES, subj, V.DCT_SUBJECT, l["iri"])))
    )
    # Category ns (CategoryLabel / Skos)
    segments.append(lambda:
        _guard(
            is_cat,
            F.array(
                _q(V.CATEGORY_LABELS, subj, RDFS_LABEL, F.col("title"), RDF_LANGSTRING),
                _q(V.SKOS_CATEGORIES, subj, RDF_TYPE, F.lit(V.SKOS_CONCEPT)),
                _q(V.SKOS_CATEGORIES, subj, V.SKOS_PREF_LABEL, F.col("title"), RDF_LANGSTRING),
            ),
        )
    )
    segments.append(lambda:
        _guard(is_cat, F.transform(internal_cat, lambda l: _q(V.SKOS_CATEGORIES, subj, V.SKOS_BROADER, l["iri"])))
    )
    # templates on the page (ArticleTemplates top-level + nested)
    segments.append(lambda:
        F.transform(
            F.filter(F.col("templates"), lambda t: t["depth"] == 0),
            lambda t: _q(V.ARTICLE_TEMPLATES, subj, uses_tpl_pred, t["iri"]),
        )
    )
    segments.append(lambda:
        F.transform(
            F.filter(F.col("templates"), lambda t: t["depth"] > 0),
            lambda t: _q(V.ARTICLE_TEMPLATES_NESTED, subj, uses_tpl_pred, t["iri"]),
        )
    )
    # Template ns: declared parameters (TemplateParameterExtractor)
    segments.append(lambda:
        _guard(
            is_tpl & ~is_redirect,
            F.transform(
                F.filter(F.array_distinct(F.col("param_decls")), lambda p: p != F.lit("")),
                lambda p: _q(
                    V.TEMPLATE_PARAMETERS, subj, F.concat(pb, F.lit("templateUsesParameter")), p, XSD_STRING
                ),
            ),
        )
    )
    # redirects (RedirectExtractor: same-namespace first link)
    first_link = F.element_at("links", 1)
    segments.append(lambda:
        _guard(
            is_redirect
            & (F.size("links") > 0)
            & (first_link["iw"] == "")
            & (first_link["ns"] == F.col("namespace"))
            & F.col("namespace").isin(MAIN, TEMPLATE, CATEGORY),
            F.array(_q(V.REDIRECTS, subj, V.WIKI_PAGE_REDIRECTS, first_link["iri"])),
        )
    )
    # interlanguage links
    segments.append(lambda:
        _guard(
            F.col("namespace").isin(MAIN, TEMPLATE, CATEGORY),
            F.transform(
                interwiki, lambda l: _q(V.INTERLANGUAGE_LINKS, subj, V.WIKI_PAGE_INTER_LANGUAGE_LINK, l["iri"])
            ),
        )
    )
    # abstracts (deterministic first-paragraph substitute)
    segments.append(lambda:
        _guard(
            is_main & ~is_redirect & (F.col("abstract") != ""),
            F.array(_q(V.ABSTRACTS, subj, V.ABSTRACT_PROP, F.col("abstract"), RDF_LANGSTRING)),
        )
    )
    # disambiguations (contains-check path)
    is_disambig = F.exists(F.col("templates"), lambda t: F.lower(t["name"]).isin(*_DISAMBIG_TEMPLATES))
    clean_title = F.upper(F.regexp_replace(F.col("title"), r" \(disambiguation\)$", ""))
    from .structural import acronym_matches

    segments.append(lambda:
        _guard(
            is_main & is_disambig,
            F.transform(
                F.filter(
                    internal_main,
                    lambda l: F.upper(l["target"]).contains(clean_title)
                    | acronym_matches(clean_title, l["target"]),
                ),
                lambda l: _q(V.DISAMBIGUATIONS, subj, V.WIKI_PAGE_DISAMBIGUATES, l["iri"]),
            ),
        )
    )
    # geo (first root coordinate — computed at parse time)
    lat_s = F.col("coord_lat").cast("string")
    lon_s = F.col("coord_lon").cast("string")
    segments.append(lambda:
        _guard(
            is_main & F.col("coord_lat").isNotNull(),
            F.array(
                _q(V.GEO_COORDINATES, subj, RDF_TYPE, F.lit(V.GEO_SPATIAL_THING)),
                _q(V.GEO_COORDINATES, subj, V.GEO_LAT, lat_s, _XSD_FLOAT),
                _q(V.GEO_COORDINATES, subj, V.GEO_LONG, lon_s, _XSD_FLOAT),
                _q(V.GEO_COORDINATES, subj, V.GEORSS_POINT, F.concat_ws(" ", lat_s, lon_s), XSD_STRING),
            ),
        )
    )
    # homepages (first website/homepage property URL, by template position)
    hp_cands = F.flatten(
        F.transform(
            F.col("templates"),
            lambda t: F.transform(
                F.filter(t["params"], lambda p: F.lower(p["key"]).isin(*_HOMEPAGE_KEYS)),
                lambda p: F.struct(
                    t["pos"].alias("pos"), F.regexp_extract(p["value"], _URL_IN_VALUE, 1).alias("url")
                ),
            ),
        )
    )
    hp_valid = F.array_sort(F.filter(hp_cands, lambda c: c["url"] != ""))
    segments.append(lambda:
        _guard(
            is_main & (F.size(hp_valid) > 0),
            F.array(_q(V.HOMEPAGES, subj, V.FOAF_HOMEPAGE, F.element_at(hp_valid, 1)["url"])),
        )
    )

    # provenance (ProvenanceExtractor): sourceIri per page
    src = F.concat(
        F.col("page_iri"), F.lit("?oldid="), F.col("revision_id"), F.lit("&ns="), F.col("namespace")
    )
    segments.append(lambda: F.array(_q(V.PROVENANCE, subj, V.PROV_WAS_DERIVED_FROM, src)))
    # gender (GenderExtractor: pronoun argmax on Person-mapped pages)
    from .structural import _person_template_names, _pronoun_count

    male = sum((_pronoun_count(p) for p in ("he", "his", "him", "himself")), F.lit(0))
    female = sum((_pronoun_count(p) for p in ("she", "her", "herself")), F.lit(0))
    is_person = F.exists(F.col("templates"), lambda t: F.lower(t["name"]).isin(*_person_template_names()))
    gender = (
        F.when((male > 3) & ((female == 0) | (male / female > 2)), "male")
        .when((female > 3) & ((male == 0) | (female / male > 2)), "female")
    )
    segments.append(lambda:
        _guard(
            is_main & is_person & gender.isNotNull(),
            F.array(_q(V.GENDERS, subj, V.FOAF_GENDER, gender, RDF_LANGSTRING)),
        )
    )
    # topical concepts (category main-article marker: blank sort label)
    segments.append(lambda:
        _guard(
            is_cat,
            F.transform(
                F.filter(
                    F.col("links"),
                    lambda l: (l["iw"] == "") & (l["ns"] == MAIN) & (F.trim(l["label"]) == ""),
                ),
                lambda l: _q(V.TOPICAL_CONCEPTS, subj, V.MAIN_ARTICLE_FOR_CATEGORY, l["iri"]),
            ),
        )
    )

    # images (ImageExtractorNew link-based core; see structural.extract_images)
    file_links = F.filter(F.col("links"), lambda l: (l["iw"] == "") & (l["ns"] == FILE))

    def _img_quads(l):
        enc = F.regexp_extract(l["iri"], r"File:(.*)$", 1)
        url = F.concat(F.lit("http://commons.wikimedia.org/wiki/Special:FilePath/"), enc)
        thumb = F.concat(url, F.lit("?width=300"))
        wiki_page = F.concat(F.lit("http://"), F.col("lang"),
                             F.lit(".wikipedia.org/wiki/File:"), enc)
        return F.array(
            _q(V.IMAGES, subj, V.FOAF_DEPICTION, url),
            _q(V.IMAGES, url, V.FOAF_THUMBNAIL, thumb),
            _q(V.IMAGES, url, RDF_TYPE, F.lit(V.DBO_IMAGE)),
            _q(V.IMAGES, thumb, RDF_TYPE, F.lit(V.DBO_IMAGE)),
            _q(V.IMAGES, url, V.DC_RIGHTS, wiki_page),
            _q(V.IMAGES, thumb, V.DC_RIGHTS, wiki_page),
        )

    first_enc = F.regexp_extract(file_links[0]["iri"], r"File:(.*)$", 1)
    first_thumb = F.concat(
        F.lit("http://commons.wikimedia.org/wiki/Special:FilePath/"), first_enc,
        F.lit("?width=300"),
    )
    segments.append(lambda:
        _guard(is_main, F.flatten(F.transform(file_links, _img_quads)))
    )
    segments.append(lambda:
        _guard(
            is_main & (F.size(file_links) > 0),
            F.array(_q(V.IMAGES, subj, V.DBO_THUMBNAIL, first_thumb)),
        )
    )

    # gallery images (GalleryExtractor; see structural.extract_gallery_images)
    def _gallery_quads(g):
        url = F.concat(F.lit("http://commons.wikimedia.org/wiki/Special:FilePath/"), g["enc"])
        thumb = F.concat(url, F.lit("?width=300"))
        wiki_page = F.concat(F.lit("http://"), F.col("lang"),
                             F.lit(".wikipedia.org/wiki/File:"), g["enc"])
        return F.array(
            _q(V.IMAGES, subj, V.FOAF_DEPICTION, url),
            _q(V.IMAGES, url, V.FOAF_THUMBNAIL, thumb),
            _q(V.IMAGES, url, RDF_TYPE, F.lit(V.DBO_IMAGE)),
            _q(V.IMAGES, thumb, RDF_TYPE, F.lit(V.DBO_IMAGE)),
            _q(V.IMAGES, url, V.DC_RIGHTS, wiki_page),
            _q(V.IMAGES, thumb, V.DC_RIGHTS, wiki_page),
        )

    segments.append(lambda:
        _guard(is_main, F.flatten(F.transform(F.col("galleries"), _gallery_quads)))
    )

    # file types (FileTypeExtractor; see structural.extract_file_types —
    # null mime/class quads fall out in the final value filter)
    from .structural import FILE_TYPE_MAP

    is_file = F.col("namespace") == FILE
    ft_ext = F.lower(F.regexp_extract(F.col("title"), r"\.([A-Za-z0-9]+)$", 1))
    ft_mime_pairs: list[Column] = []
    ft_cls_pairs: list[Column] = []
    for _e, (_mime, _cls) in FILE_TYPE_MAP.items():
        ft_mime_pairs += [F.lit(_e), F.lit(_mime)]
        ft_cls_pairs += [F.lit(_e), F.lit(_cls)]
    ft_mime = F.element_at(F.create_map(*ft_mime_pairs), ft_ext)
    ft_cls = F.element_at(F.create_map(*ft_cls_pairs), ft_ext)
    ft_url = F.concat(F.lit("http://commons.wikimedia.org/wiki/Special:FilePath/"),
                      F.regexp_extract(subj, r"File:(.*)$", 1))
    segments.append(lambda:
        _guard(
            is_file & (ft_ext != ""),
            F.array(
                _q(V.FILE_TYPES, subj, V.DBO_FILE_EXTENSION, ft_ext, XSD_STRING),
                _q(V.FILE_TYPES, subj, V.DCT_FORMAT, ft_mime, XSD_STRING),
                _q(V.FILE_TYPES, subj, RDF_TYPE, F.lit(V.DBO_FILE)),
                _q(V.FILE_TYPES, subj, RDF_TYPE, ft_cls),
                _q(V.FILE_TYPES, subj, V.DBO_FILE_URL, ft_url),
            ),
        )
    )

    # infobox references (InfoboxReferencesExtractor, simplified)
    keyed_refs = F.filter(F.col("ref_texts"), lambda r: r["prop_iri"].isNotNull())
    segments.append(lambda:
        _guard(
            is_main,
            F.transform(
                keyed_refs,
                lambda r: _q(V.INFOBOX_REFERENCES, subj, r["prop_iri"], r["text"], RDF_LANGSTRING),
            ),
        )
    )

    # revision meta: MetaInformationExtractor + ContributorExtractor
    # (mappings/MetaInformationExtractor.scala:24-53,
    #  mappings/ContributorExtractor.scala:28-65; see structural.py for the
    #  derivation decisions — deterministic modified date, repo-as-contributor)
    from .structural import META_CONTRIBUTOR, META_CONTRIBUTOR_ID, _XSD_DATE_IRI
    from ..ontology import DBO

    enc_title = F.regexp_extract(F.col("page_iri"), r"([^/]+)$", 1)
    idx_base = F.concat(F.lit("http://"), F.col("lang"),
                        F.lit(".wikipedia.org/w/index.php?title="), enc_title)
    modified = F.date_add(F.to_date(F.lit("2000-01-01")),
                          (F.col("revision_id") % 9000).cast("int")).cast("string")
    curl = F.concat(F.lit("http://dbpedia.org/contributor/"),
                    F.regexp_replace(F.col("repo"), " ", "_"))
    cid = (F.length("repo") * 1000 + F.ascii(F.substring("repo", 1, 1))).cast("string")
    segments.append(lambda:
        _guard(
            is_main,
            F.array(
                _q(V.REVISION_META, subj, DBO + "wikiPageModified", modified, _XSD_DATE_IRI),
                _q(V.REVISION_META, subj, DBO + "wikiPageEditLink",
                   F.concat(idx_base, F.lit("&action=edit"))),
                _q(V.REVISION_META, subj, DBO + "wikiPageRevisionLink",
                   F.concat(idx_base, F.lit("&oldid="), F.col("revision_id").cast("string"))),
                _q(V.REVISION_META, subj, DBO + "wikiPageHistoryLink",
                   F.concat(idx_base, F.lit("&action=history"))),
                _q(V.REVISION_META, F.col("page_iri"), META_CONTRIBUTOR, curl),
                _q(V.REVISION_META, curl, RDFS_LABEL, F.col("repo"), XSD_STRING),
                _q(V.REVISION_META, curl, META_CONTRIBUTOR_ID, cid, XSD_INTEGER),
            ),
        )
    )

    # infobox properties + per-page definition quads (deduped globally later)
    # reuse a precomputed infobox column when the caller shares one across
    # extractor families (engine-build parse-once sharing: the Arrow
    # infobox pass is the single most expensive per-page step, and without
    # the shared column it runs once per consumer — fused, cited-facts,
    # hybrid, raw-infobox). A precomputed ``_ib`` wins over
    # template_redirects; callers keep the two consistent.
    if "_ib" in parsed.columns:
        with_ib = parsed
    else:
        ib_udf = make_infobox_props_udf(template_redirects) if template_redirects else infobox_props_udf
        with_ib = parsed.withColumn("_ib", ib_udf(F.col("lang"), F.col("templates")))
    ib = F.when(is_main, F.col("_ib")).otherwise(F.expr("cast(array() as " + _IB_RESULT.simpleString() + ")"))
    segments.append(lambda:
        F.transform(ib, lambda r: _q(V.INFOBOX_PROPERTIES, subj, r["prop_iri"], r["value"], r["datatype"]))
    )
    segments.append(lambda:
        F.flatten(
            F.transform(
                ib,
                lambda r: F.array(
                    _q(V.INFOBOX_PROPERTY_DEFINITIONS, r["prop_iri"], RDF_TYPE, F.lit(V.RDF_PROPERTY)),
                    _q(V.INFOBOX_PROPERTY_DEFINITIONS, r["prop_iri"], RDFS_LABEL, r["prop_label"], RDF_LANGSTRING),
                ),
            )
        )
    )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(8) as _ex:
        built = list(_ex.map(lambda th: th(), segments))
    all_quads = F.concat(*built)
    return with_ib.select(
        "page_id",
        F.col("lang").alias("language"),
        F.filter(
            all_quads, lambda q: q["subject"].isNotNull() & q["value"].isNotNull()
        ).alias("quads"),
    )


def fused_quads(parsed: DataFrame, template_redirects: dict[str, str] | None = None) -> DataFrame:
    return (
        fused_quads_per_page(parsed, template_redirects)
        .select("language", F.explode("quads").alias("q"))
        .select(
            "language",
            F.col("q.dataset").alias("dataset"),
            F.col("q.subject").alias("subject"),
            F.col("q.predicate").alias("predicate"),
            F.col("q.value").alias("value"),
            F.col("q.context").alias("context"),
            F.col("q.datatype").alias("datatype"),
        )
    )
