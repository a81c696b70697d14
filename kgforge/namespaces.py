"""Namespaces, languages and IRI minting.

Re-implements the semantics of the reference's
``wikiparser/Namespace.scala:22-79`` (integer-coded MediaWiki namespaces),
``util/Language.scala:38-94`` (per-language RDF namespaces) and
``util/WikiUtil.scala:93-121`` (wikiEncode). All from-scratch Python.
"""

from __future__ import annotations

import urllib.parse

# MediaWiki namespace codes (Namespace.scala:67 default codes).
MAIN = 0
TALK = 1
USER = 2
PROJECT = 4
FILE = 6
MEDIAWIKI = 8
TEMPLATE = 10
HELP = 12
CATEGORY = 14
MODULE = 828

NS_BY_NAME: dict[str, int] = {
    "talk": TALK,
    "user": USER,
    "project": PROJECT,
    "wikipedia": PROJECT,
    "file": FILE,
    "image": FILE,
    "mediawiki": MEDIAWIKI,
    "template": TEMPLATE,
    "vorlage": TEMPLATE,       # de
    "modèle": TEMPLATE,        # fr
    "help": HELP,
    "category": CATEGORY,
    "kategorie": CATEGORY,     # de
    "catégorie": CATEGORY,     # fr
}

NS_CANONICAL_NAME: dict[int, str] = {
    MAIN: "",
    TALK: "Talk",
    USER: "User",
    PROJECT: "Project",
    FILE: "File",
    MEDIAWIKI: "MediaWiki",
    TEMPLATE: "Template",
    HELP: "Help",
    CATEGORY: "Category",
    MODULE: "Module",
}

# Wiki language codes recognized as interlanguage-link prefixes
# (subset; config-driven like the reference's Language registry).
LANG_CODES = frozenset(
    "en de fr es it nl pt ru ja zh pl sv cs fi no da hu ro tr ar ko he uk ca el"
    " simple commons meta wikt".split()
)

# RDF namespace constants (shared vocabulary IRIs used by extractors).
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_STRING = XSD + "string"
XSD_INTEGER = XSD + "integer"
XSD_NONNEG_INT = XSD + "nonNegativeInteger"
XSD_DOUBLE = XSD + "double"
XSD_FLOAT = XSD + "float"
XSD_BOOLEAN = XSD + "boolean"
XSD_DATE = XSD + "date"
XSD_GYEAR = XSD + "gYear"
XSD_GYEARMONTH = XSD + "gYearMonth"
XSD_GMONTHDAY = XSD + "gMonthDay"
XSD_ANYURI = XSD + "anyURI"
XSD_DECIMAL = XSD + "decimal"
DBO = "http://dbpedia.org/ontology/"
FOAF = "http://xmlns.com/foaf/0.1/"
SKOS = "http://www.w3.org/2004/02/skos/core#"
DCT = "http://purl.org/dc/terms/"
DC = "http://purl.org/dc/elements/1.1/"
GEO = "http://www.w3.org/2003/01/geo/wgs84_pos#"
GEORSS = "http://www.georss.org/georss/"
PROV = "http://www.w3.org/ns/prov#"


def resource_base(lang: str) -> str:
    """Per-language resource namespace (Language.scala:38-64: en → dbpedia.org,
    otherwise xx.dbpedia.org)."""
    if lang == "en":
        return "http://dbpedia.org/resource/"
    return f"http://{lang}.dbpedia.org/resource/"


def property_base(lang: str) -> str:
    if lang == "en":
        return "http://dbpedia.org/property/"
    return f"http://{lang}.dbpedia.org/property/"


def wiki_base(lang: str) -> str:
    return f"http://{lang}.wikipedia.org/wiki/"


# ASCII characters percent-escaped by the wiki IRI encoding
# (WikiUtil.iriReplacements: ``" %<>?[]^`{|}\#`` — everything else, INCLUDING
# non-ASCII, stays raw: IRIs allow unicode and the reference keeps it).
_ESCAPES = {c: "%%%02X" % ord(c) for c in ' "%#<>?[\\]^`{|}'}
_ESCAPES.update({chr(b): "%%%02X" % b for b in range(0x20)})
_ESCAPES["\x7f"] = "%7F"


def wiki_encode(title: str) -> str:
    """MediaWiki title → IRI path segment (WikiUtil.wikiEncode,
    util/WikiUtil.scala:93-121): trim, collapse whitespace/underscores to a
    single underscore, capitalize the first letter, percent-encode the
    iriReplacements set (+ control chars); unicode stays raw — keeps parity
    with the reference AND with the Column twin ``wiki_encode_expr``."""
    t = "_".join(title.replace("_", " ").split())
    if not t:
        return t
    t = t[0].upper() + t[1:]
    return "".join(_ESCAPES.get(c, c) for c in t)


def normalize_title(title: str) -> str:
    """Canonical decoded form: underscores → spaces, collapse whitespace,
    first letter capitalized (WikiTitle.scala:32-41)."""
    t = " ".join(title.replace("_", " ").split())
    if not t:
        return t
    return t[0].upper() + t[1:]


_NS_ALIAS_CACHE: dict[str, dict[str, int]] = {}


def ns_table(lang: str | None) -> dict[str, int]:
    """Per-language namespace-name → code table: the global ``NS_BY_NAME``
    merged with the language's MediaWiki i18n aliases
    (fixtures/namespace_aliases.json, harvested by
    tools/harvest_namespaces.py from the public MediaWiki namespace data the
    reference ships as generated Scala —
    wikiparser/impl/wikipedia/Namespaces.scala). Lazy-loaded, cached per
    language; unknown languages fall back to the global table."""
    if not lang:
        return NS_BY_NAME
    t = _NS_ALIAS_CACHE.get(lang)
    if t is None:
        if not _NS_ALIAS_CACHE:
            import json
            import os

            path = os.path.join(os.path.dirname(__file__), "fixtures", "namespace_aliases.json")
            try:
                with open(path, encoding="utf-8") as fh:
                    _NS_ALIAS_CACHE["__raw__"] = json.load(fh)
            except OSError:
                _NS_ALIAS_CACHE["__raw__"] = {}
        raw = _NS_ALIAS_CACHE["__raw__"].get(lang)
        t = dict(NS_BY_NAME, **raw) if raw else NS_BY_NAME
        _NS_ALIAS_CACHE[lang] = t
    return t


def split_namespace(raw_title: str, lang: str | None = None) -> tuple[int, str]:
    """Detect a namespace prefix in a raw title (WikiTitle.parse,
    wikiparser/WikiTitle.scala:114-184). Returns (ns_code, rest). With
    ``lang``, localized prefixes ('تصنيف:', 'カテゴリ:', …) resolve via the
    i18n alias table."""
    if raw_title.startswith(":"):
        raw_title = raw_title[1:]
    if ":" in raw_title:
        prefix, rest = raw_title.split(":", 1)
        code = ns_table(lang).get(prefix.replace("_", " ").strip().lower())
        if code is not None:
            return code, rest.strip()
    return MAIN, raw_title.strip()


def title_with_namespace(ns: int, title: str) -> str:
    """Decoded-with-namespace form (WikiTitle.scala:38-41)."""
    name = NS_CANONICAL_NAME.get(ns, "")
    if name:
        return f"{name}:{title}"
    return title


def resource_iri(lang: str, ns: int, title: str) -> str:
    """Subject IRI for a page (WikiPage.scala:78)."""
    return resource_base(lang) + wiki_encode(title_with_namespace(ns, normalize_title(title)))
