"""IRI canonicalization + URI policies (SURVEY.md §2.6).

Re-implements, as Catalyst column expressions wherever possible:

- ``UriPolicy`` (destinations/formatters/UriPolicy.scala:33-108): per-position
  (subject/predicate/object) rewrite pipeline — ``reject-long`` (length cap),
  ``xml-safe``, ``generic`` (xx.dbpedia.org → dbpedia.org).
- ``UriUtils.uriToIri``-style cleanup (iri/UriUtils.scala:16-157): scheme
  check, percent-encoding of illegal characters (the one Python-vectorized
  piece — full IRI↔URI transcoding needs codepoint walks).
- ``MapSubjectUris`` / ``CanonicalizeUris`` (scripts/) — subject rewriting
  through a map and cross-language canonicalization to the generic domain.
"""

from __future__ import annotations

import urllib.parse

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

MAX_IRI_LENGTH = 500  # UriPolicy "reject-long" default


def policy_reject_long(col: Column, max_len: int = MAX_IRI_LENGTH) -> Column:
    """NULL out IRIs longer than the cap (caller drops the quad)."""
    return F.when(F.length(col) <= max_len, col)


def policy_generic(col: Column) -> Column:
    """xx.dbpedia.org → dbpedia.org (UriPolicy 'generic' position rewrite)."""
    return F.regexp_replace(col, r"^http://[a-z\-]+\.dbpedia\.org/", "http://dbpedia.org/")


def policy_xml_safe(col: Column) -> Column:
    """Escape characters that break XML serializations."""
    c = F.regexp_replace(col, "&", "%26")
    c = F.regexp_replace(c, "<", "%3C")
    return F.regexp_replace(c, ">", "%3E")


@F.pandas_udf(T.StringType())
def iri_to_uri_udf(iri: pd.Series) -> pd.Series:
    """IRI → URI percent-encoding (UriPolicy 'uri' position; non-ASCII and
    illegal chars percent-encoded, existing escapes preserved)."""
    out = []
    for v in iri:
        if v is None:
            out.append(None)
            continue
        out.append(urllib.parse.quote(v, safe=":/?#[]@!$&'()*+,;=%~-._"))
    return pd.Series(out)


def apply_uri_policies(
    quads: DataFrame,
    generic: bool = False,
    xml_safe: bool = False,
    uri: bool = False,
    max_len: int | None = MAX_IRI_LENGTH,
    positions: tuple[str, ...] = ("subject", "predicate", "value"),
) -> DataFrame:
    """Apply the configured policy stack per position; quads whose subject or
    predicate fail reject-long are dropped (TerseBuilder comments such lines
    out; the quad SET is the unit of comparison)."""
    df = quads
    for pos in positions:
        col = F.col(pos)
        is_iri = F.lit(True) if pos != "value" else F.col("datatype").isNull()
        c = col
        if generic:
            c = policy_generic(c)
        if xml_safe:
            c = policy_xml_safe(c)
        if uri:
            c = iri_to_uri_udf(c)
        if max_len is not None:
            c = policy_reject_long(c, max_len)
        df = df.withColumn(pos, F.when(is_iri, c).otherwise(col))
    return df.filter(F.col("subject").isNotNull() & F.col("predicate").isNotNull() & F.col("value").isNotNull())


def map_subject_uris(quads: DataFrame, mapping: DataFrame, suffix: str = "_redirected") -> DataFrame:
    """MapSubjectUris (scripts/): rewrite subjects through (src, dst)."""
    m = F.broadcast(mapping.select(F.col("src").alias("m_src"), F.col("dst").alias("m_dst")))
    j = quads.join(m, quads["subject"] == m["m_src"], "left")
    return j.select(
        "language",
        F.concat(F.col("dataset"), F.lit(suffix)).alias("dataset"),
        F.coalesce("m_dst", "subject").alias("subject"),
        "predicate",
        "value",
        "context",
        "datatype",
    )


def canonicalize_uris(quads: DataFrame) -> DataFrame:
    """CanonicalizeUris: rebase every IRI position onto the generic domain
    (cross-language sameAs unification precursor)."""
    df = quads.withColumn("subject", policy_generic(F.col("subject")))
    df = df.withColumn("predicate", policy_generic(F.col("predicate")))
    return df.withColumn(
        "value",
        F.when(F.col("datatype").isNull(), policy_generic(F.col("value"))).otherwise(F.col("value")),
    )


# --- UriUtils.uriToIri (iri/UriUtils.scala:16-157) --------------------------

import re as _re2
import string as _string

_PCT_RUN_RE = _re2.compile(r"(?:%[0-9A-Fa-f]{2})+")
_PCT_BYTE_RE = _re2.compile(r"%([0-9A-Fa-f]{2})")
# ASCII characters safe to UNescape: RFC 3986 unreserved ONLY — decoding an
# escaped reserved char (%2F → '/', %2B → '+') would change URI semantics
_IRI_SAFE = frozenset("-._~" + _string.ascii_letters + _string.digits)


def uri_to_iri(s: str) -> str:
    """URI → IRI transcoding (UriUtils.uriToIri): percent-escape runs decode
    as UTF-8; non-ASCII and unreserved characters come out RAW (IRIs allow
    unicode), reserved/control characters STAY escaped (decoding %2F would
    change path semantics). Malformed UTF-8 decodes PER SEQUENCE: the valid
    prefix comes out raw and only the malformed byte itself stays escaped,
    re-emitted in uppercase hex ('%41%c3' → 'A%C3')."""

    def conv(m: _re2.Match) -> str:
        # decode per-sequence (UriToIriDecoder semantics): the longest valid
        # UTF-8 prefix of the run decodes; only the malformed byte itself
        # stays escaped ('%41%C3' → 'A%C3', not fully escaped)
        bs = bytes(int(h, 16) for h in _PCT_BYTE_RE.findall(m.group(0)))
        out = []
        i = 0
        while i < len(bs):
            try:
                txt = bs[i:].decode("utf-8")
                consumed = len(bs) - i
            except UnicodeDecodeError as e:
                if e.start == 0:
                    out.append("%%%02X" % bs[i])
                    i += 1
                    continue
                txt = bs[i : i + e.start].decode("utf-8")
                consumed = e.start
            for ch in txt:
                if ord(ch) > 127 or ch in _IRI_SAFE:
                    out.append(ch)
                else:
                    out.append("%%%02X" % ord(ch))
            i += consumed
        return "".join(out)

    return _PCT_RUN_RE.sub(conv, s)


# Escapes the UriToIriDecoder KEEPS (UriToIriDecoder.java:44-49
# reserved_gen_delim): IRI gen-delims (minus '/', which the reference
# deliberately decodes) + the unwise set "<>[]{}|\^` and the double quote.
_KEEP_ESCAPED = frozenset(
    "3A 3F 23 5B 5D 40 3C 3E 22 7B 7D 7C 5C 5E 60".split()
)


def _utf8_incremental(buf: bytes, out: list[str]) -> None:
    """Decode the longest valid UTF-8 prefixes, re-escaping only malformed
    bytes (engine divergence, kept deliberately: the reference substitutes
    U+FFFD via CodingErrorAction.REPLACE, destroying the byte — an escaped
    byte is recoverable, a replacement char is not)."""
    i = 0
    while i < len(buf):
        try:
            out.append(buf[i:].decode("utf-8"))
            return
        except UnicodeDecodeError as e:
            if e.start == 0:
                out.append("%%%02X" % buf[i])
                i += 1
            else:
                out.append(buf[i : i + e.start].decode("utf-8"))
                i += e.start


def iri_decode(s: str, max_depth: int = 5) -> str:
    """Fixpoint escape decoding (UriUtils.iriDecode, iri/UriUtils.scala:
    149-155 looping UriToIriDecoder.decode): per escape, %20 → '_', the
    reserved table stays escaped, everything else decodes as UTF-8 — run to
    fixpoint so double-encoded input ('%25C3%2581') fully resolves."""

    def conv(m: _re2.Match) -> str:
        out: list[str] = []
        buf = bytearray()
        for hx in _PCT_BYTE_RE.findall(m.group(0)):
            up = hx.upper()
            if up == "20":
                buf.append(ord("_"))
            elif up in _KEEP_ESCAPED:
                _utf8_incremental(bytes(buf), out)
                buf.clear()
                out.append("%" + hx)
            else:
                buf.append(int(hx, 16))
        _utf8_incremental(bytes(buf), out)
        return "".join(out)

    prev = s
    for _ in range(max_depth):
        cur = _PCT_RUN_RE.sub(conv, prev)
        if cur == prev:
            return cur
        prev = cur
    return prev


_URI_SPLIT_RE = _re2.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)?([^?#]*)(.*)$", _re2.S)
# cleanSpace's whitespace family (WikiUtil.scala:27-45) + underscores
_PATH_WS_RE = _re2.compile(
    "[_\\s\u00A0\u200E\u200F\u2028\u202A\u202B\u202C\u3000]+"
)
_PATH_ESCAPE = {c: "%%%02X" % ord(c) for c in '#<>?[]\\^`{|}"'}


def uri_to_dbpedia_iri(uri: str) -> str:
    """Full UriUtils.uriToIri pipeline (iri/UriUtils.scala:116-132):
    scheme+authority pass through; the PATH is fixpoint-decoded then
    wiki-normalized ('+'-as-space, whitespace/underscore runs collapse to
    one '_', the iriReplacements set re-escapes); query+fragment pass
    through unchanged (the reference's IRITests pin query strings verbatim
    — its query decode path is ambiguous, so the engine follows the pinned
    expectations). Table-tested against the 11 IRITests rows
    (core/src/test/scala/org/dbpedia/iri/IRITests.scala)."""
    m = _URI_SPLIT_RE.match(uri or "")
    scheme_auth, path, rest = m.group(1) or "", m.group(2), m.group(3)
    # '+' in a PATH is the form-encoding space convention; an encoded %2B
    # survives decoding below (it is not '+' in the raw path)
    p = path.replace("+", " ")
    p = iri_decode(p)
    p = _PATH_WS_RE.sub("_", p)
    p = "".join(_PATH_ESCAPE.get(c, c) for c in p)
    return scheme_auth + p + rest


def uri_to_iri_quads(quads: DataFrame) -> DataFrame:
    """Transcode subject + IRI-object positions URI→IRI (Arrow-batched;
    post-processing pass like RecodeUris)."""

    @F.pandas_udf(T.StringType())
    def udf(col: pd.Series) -> pd.Series:
        return col.map(lambda x: uri_to_iri(x) if x else x)

    value = F.when(F.col("datatype").isNull(), udf(F.col("value"))).otherwise(F.col("value"))
    return quads.withColumn("subject", udf(F.col("subject"))).withColumn("value", value)


# --- RecodeUris (scripts/.../RecodeUris.scala:19-60) ------------------------

_RECODE_UDF_TYPE = T.StringType()


def _recode_one(iri: str) -> str:
    """Decode percent-escapes, then re-encode with the wikiEncode policy —
    normalizes doubly/inconsistently encoded dbpedia IRIs so equal resources
    compare equal. Non-resource IRIs pass through unchanged."""
    from .namespaces import wiki_encode

    m = _RESOURCE_RE.match(iri or "")
    if not m:
        return iri
    base, local = m.group(1), m.group(2)
    decoded = urllib.parse.unquote(local)
    return base + wiki_encode(decoded.replace("_", " "))


import re as _re

_RESOURCE_RE = _re.compile(r"^(https?://[a-z\-]*\.?dbpedia\.org/resource/)(.+)$")


def recode_uris(quads: DataFrame) -> DataFrame:
    """RecodeUris script: normalize subject + IRI-object encoding via an
    Arrow-batched pandas UDF (runs in post-processing, not the hot path)."""

    @F.pandas_udf(_RECODE_UDF_TYPE)
    def recode(col: pd.Series) -> pd.Series:
        return col.map(lambda x: _recode_one(x) if x else x)

    value = F.when(F.col("datatype").isNull(), recode(F.col("value"))).otherwise(F.col("value"))
    return quads.withColumn("subject", recode(F.col("subject"))).withColumn("value", value)


# --- ProcessInterLanguageLinks (scripts/.../ProcessInterLanguageLinks.scala) -


def interlanguage_same_as(quads: DataFrame) -> DataFrame:
    """owl:sameAs from BIDIRECTIONAL interlanguage links (the script only
    trusts a cross-language identity both wikis agree on,
    ProcessInterLanguageLinks.scala:150-210). Left-semi self-join on the
    swapped (subject, value) pair — sort-merge at cluster scale, and the
    semi-join keeps the output one row per surviving link."""
    from . import vocab as V

    ill = quads.filter(F.col("dataset") == V.INTERLANGUAGE_LINKS).select(
        "language", "subject", "value"
    )
    rev = ill.select(F.col("value").alias("r_s"), F.col("subject").alias("r_v"))
    bidi = ill.join(
        rev, (ill["subject"] == rev["r_s"]) & (ill["value"] == rev["r_v"]), "left_semi"
    )
    return bidi.select(
        "language",
        F.lit(V.INTERLANGUAGE_SAME_AS).alias("dataset"),
        "subject",
        F.lit(V.OWL_SAME_AS).alias("predicate"),
        "value",
        F.lit(None).cast("string").alias("context"),
        F.lit(None).cast("string").alias("datatype"),
    )


def iri_same_as_uri_quads(quads: DataFrame) -> DataFrame:
    """CreateIriSameAsUriLinks (scripts/.../CreateIriSameAsUriLinks.scala:
    36-58): for every distinct subject whose ASCII-URI form differs from
    its IRI, emit (iri, owl:sameAs, uri).  Map-only over the distinct
    subject set; the transcoder is the same UriPolicy 'uri' UDF the export
    path uses."""
    from . import vocab as V

    subs = quads.select("subject", "language").distinct()
    out = subs.withColumn("uri", iri_to_uri_udf(F.col("subject")))
    return out.filter(F.col("uri") != F.col("subject")).select(
        "language",
        F.lit("iri_same_as_uri").alias("dataset"),
        "subject",
        F.lit(V.OWL_SAME_AS).alias("predicate"),
        F.col("uri").alias("value"),
        F.lit(None).cast("string").alias("context"),
        F.lit(None).cast("string").alias("datatype"),
    )


# RemoveRemainingTags patterns (scripts/.../RemoveRemainingTags.scala:51-55)
_TAG_PATTERNS = [(r"<div style=[^/]*/>", " "), (r"</div>", " ")]


def remove_remaining_tags(quads: DataFrame, datasets: set[str] | None = None) -> DataFrame:
    """RemoveRemainingTags (scripts/.../RemoveRemainingTags.scala:51-100):
    strip leftover rendered-HTML div fragments from literal values —
    changed values are trimmed, untouched values pass through byte-equal.
    Pure regexp expressions (JVM, map-only).  The reference throws on
    non-literal rows in its input datasets; here non-literal rows simply
    pass through, and ``datasets`` optionally scopes the rewrite."""
    cleaned = F.col("value")
    for pat, rep in _TAG_PATTERNS:
        cleaned = F.regexp_replace(cleaned, pat, rep)
    in_scope = F.col("datatype").isNotNull()
    if datasets is not None:
        in_scope = in_scope & F.col("dataset").isin(list(datasets))
    return quads.withColumn(
        "value",
        F.when(
            in_scope & (cleaned != F.col("value")), F.trim(cleaned)
        ).otherwise(F.col("value")),
    )


# --- CleanExternalDataset (scripts/.../CleanExternalDataset.scala:17-78) ----

_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

_JAVA_ESC_RE = _re2.compile(r"\\u([0-9a-fA-F]{4})|\\([0-7]{1,3})|\\(.)")
_JAVA_ESC_CHARS = {
    "n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
    "'": "'", '"': '"', "\\": "\\",
}


def unescape_java(s: str) -> str:
    """StringEscapeUtils.unescapeJava equivalent: revert \\uXXXX, octal and
    single-char Java escape sequences to raw characters. An escape of an
    unknown character keeps the character (commons-lang behavior)."""
    if "\\" not in s:
        return s

    def repl(m):
        if m.group(1) is not None:
            return chr(int(m.group(1), 16))
        if m.group(2) is not None:
            return chr(int(m.group(2), 8))
        return _JAVA_ESC_CHARS.get(m.group(3), m.group(3))

    return _JAVA_ESC_RE.sub(repl, s)


def clean_external_quads(quads: DataFrame) -> DataFrame:
    """CleanExternalDataset (scripts/.../CleanExternalDataset.scala:17-78):
    normalize a dataset that did NOT come out of this framework so it fuses
    consistently with DBpedia ones. Subject / predicate / context and
    resource-valued objects go through uriToDbpediaIri (URI→IRI transcode
    for dbpedia resources, passthrough otherwise); string literals
    (language-tagged or xsd:string) revert Java escape sequences to raw
    UTF-8; other typed literals pass through. Map-only — two Arrow-batched
    UDF columns, no shuffle. The reference drops a quad whose transcode
    throws; uri_to_dbpedia_iri/unescape_java are total functions, so
    nothing here can silently shrink an external dataset (documented
    divergence)."""

    @F.pandas_udf(T.StringType())
    def to_iri(col: pd.Series) -> pd.Series:
        return col.map(lambda x: uri_to_dbpedia_iri(x) if x else x)

    @F.pandas_udf(T.StringType())
    def unesc(col: pd.Series) -> pd.Series:
        return col.map(lambda x: unescape_java(x) if x else x)

    # the reference tests datatype==null first because its Quad model gives
    # language literals an explicit datatype; in this engine's quad schema
    # a language literal carries language with a NULL datatype, so the
    # language test must run first or lang literals would transcode as IRIs
    value = (
        F.when(
            F.col("language").isNotNull() | (F.col("datatype") == _XSD_STRING),
            unesc(F.col("value")),
        )
        .when(F.col("datatype").isNull(), to_iri(F.col("value")))
        .otherwise(F.col("value"))
    )
    out = (
        quads.withColumn("subject", to_iri(F.col("subject")))
        .withColumn("predicate", to_iri(F.col("predicate")))
        .withColumn("value", value)
    )
    if "context" in quads.columns:
        out = out.withColumn(
            "context",
            F.when(F.col("context").isNotNull(), to_iri(F.col("context"))),
        )
    return out
