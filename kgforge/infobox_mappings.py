"""InfoboxMappings analysis extractors — mapping-suggestion mining.

Re-expresses the reference's mapping-suggestion tooling pair
(mappings/InfoboxMappingsExtractor.scala:34-160,
mappings/InfoboxMappingsTemplateExtractor.scala:28-280,
util/InfoboxMappingsUtils.scala:10-53,
config/dataparser/InfoboxMappingsExtractorConfig.scala:7-17): mine infobox
template source for template-parameter ↔ Wikidata-property correspondences
(``{{#property:Pnnn}}`` / ``{{#invoke:Wikidata|...}}`` calls, conditional
fallback expressions, direct website-template uses) and emit both
suggestion tuples and the two hint datasets (``template_mappings``,
``template_mappings_hints``).

The reference walks a Sweble/SimpleWikiParser node tree per page and unions
both parsers' results.  Here a single span-tracking fragment parser (below)
walks template param values inside a vectorized pandas UDF — the engine's
main parse keeps param values raw, so this analysis is a separate
Arrow-batched pass over only the pages/values it needs, and every
downstream shape is a DataFrame explode/aggregate.

Documented divergences:
  * the reference unions a Sweble walk and a Simple walk whose term sets
    overlap but differ in flattening quirks; the unified walk here
    reproduces the reference's own test expectations
    (InfoboxMappingsTemplateExtractorTest, InfoboxMappingsExtractorTest —
    ported in tests/test_infobox_mappings.py) without the dual parse.
  * hint quad values are raw source slices, not re-rendered wikitext.
  * the reference's lowercased ``startsWith("propertyLink")`` can never
    match (reference bug); we match the evident intent ("propertylink").
  * conflicting properties in one conditional row yield ERROR and drop the
    row (the reference's Sweble branch); the reference's single-text
    ``property += text`` concatenation quirk is replaced by the same
    conflict rule.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .namespaces import MAIN, TEMPLATE, property_base

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
DS_TEMPLATE_MAPPINGS = "template_mappings"
DS_TEMPLATE_MAPPINGS_HINTS = "template_mappings_hints"

# InfoboxMappingsExtractorConfig.scala:8-16
INFOBOX_NAME = {"en": "Infobox", "no": "Infoboks"}
DIRECT_TEMPLATE_WIKIDATA = {
    "en": {"Official website": "P856", "Official URL": "P856", "Official blog": "P1581"},
    "no": {"BetingetURL": "P856"},
    "it": {"Sito ufficiale": "P856"},
}
# InfoboxMappingsTemplateExtractor.isBlackListed (lowercase)
_BLACKLIST = {"fetch_wikidata", "getvalue", "wikidata", "both", "property"}

_PROPERTY_SIMPLE_RE = re.compile(r"^\{\{#property:([0-9A-Za-z]+)\}\}$")
_ALL_PROPS_RE = re.compile(r"(?:[pP][0-9]+\})|(?:[pP][0-9]+\|)")


# ---------------------------------------------------------------------------
# span-tracking wikitext fragment parser (templates / parser functions /
# template parameters; links opaque to arg splitting but transparent to
# nested braces — matches the reference parsers' effective behaviour)
# ---------------------------------------------------------------------------

class _Text:
    __slots__ = ("text",)

    def __init__(self, text: str):
        self.text = text


class _Param:
    __slots__ = ("name", "default")

    def __init__(self, name: str, default: list):
        self.name = name
        self.default = default


class _Func:
    __slots__ = ("name", "args", "start", "end", "src")

    def __init__(self, name: str, args: list, start: int, end: int, src: str):
        self.name = name
        self.args = args      # list[list[node]]
        self.start = start
        self.end = end
        self.src = src        # raw source slice of the whole call


class _Tpl:
    __slots__ = ("title", "params", "start", "end", "src")

    def __init__(self, title: str, params: list, start: int, end: int, src: str):
        self.title = title
        self.params = params  # list[(key, list[node])]; positional keys "1"..
        self.start = start
        self.end = end
        self.src = src


def _plain(nodes) -> str:
    return "".join(n.text for n in nodes if isinstance(n, _Text))


# runaway-nesting bail depth (the reference's MaxNesting is 10; same guard
# class as kgforge/wikitext.py's 'depth > limit + 2' — beyond this, braces
# are treated as plain text so a '{{x|'*2000 vandalism page cannot blow the
# Python recursion limit inside the pandas UDF)
_MAX_DEPTH = 40


def _parse_seq(s: str, i: int, closers: tuple, depth: int = 0):
    """Parse until a closer matches at top level.  '|' closers are
    suppressed inside [[...]] links (template args don't split on link
    pipes); braces still parse inside links ([[File:{{#property:P367}}|x]])."""
    nodes: list = []
    buf: list[str] = []
    link_depth = 0

    def flush():
        if buf:
            nodes.append(_Text("".join(buf)))
            del buf[:]

    n = len(s)
    while i < n:
        matched = None
        for c in closers:
            if (link_depth == 0 or c != "|") and s.startswith(c, i):
                matched = c
                break
        if matched:
            flush()
            return nodes, i, matched
        if s.startswith("[[", i):
            link_depth += 1
            buf.append("[[")
            i += 2
            continue
        if s.startswith("]]", i) and link_depth:
            link_depth -= 1
            buf.append("]]")
            i += 2
            continue
        if depth < _MAX_DEPTH and s.startswith("{{{", i):
            node, j = _parse_param(s, i, depth + 1)
            if node is not None:
                flush()
                nodes.append(node)
                i = j
                continue
        if depth < _MAX_DEPTH and s.startswith("{{", i):
            node, j = _parse_tpl_or_func(s, i, depth + 1)
            if node is not None:
                flush()
                nodes.append(node)
                i = j
                continue
        buf.append(s[i])
        i += 1
    flush()
    return nodes, i, None


def _parse_param(s: str, i: int, depth: int = 0):
    name_nodes, j, end = _parse_seq(s, i + 3, ("}}}", "|"), depth)
    name = _plain(name_nodes).strip()
    if end == "|":
        default, j, end2 = _parse_seq(s, j + 1, ("}}}",), depth)
        if end2 == "}}}":
            return _Param(name, default), j + 3
        return _Param(name, default), j  # implicit close at EOF
    if end == "}}}":
        return _Param(name, []), j + 3
    if end is None and name:
        return _Param(name, []), j  # implicit close at EOF
    return None, i


def _parse_tpl_or_func(s: str, i: int, depth: int = 0):
    start = i
    segs: list = []
    j = i + 2
    while True:
        nodes, j, end = _parse_seq(s, j, ("}}", "|"), depth)
        segs.append(nodes)
        if end == "|":
            j += 1
            continue
        if end == "}}":
            j += 2
        break  # '}}' consumed, or implicit close at EOF
    end_pos = j
    src = s[start:end_pos]
    seg0 = segs[0]
    first_txt = seg0[0].text if seg0 and isinstance(seg0[0], _Text) else ""
    if first_txt.lstrip().startswith("#"):
        if ":" in first_txt:
            name, rest = first_txt.split(":", 1)
            arg0 = ([_Text(rest)] if rest else []) + seg0[1:]
        else:
            name, arg0 = first_txt, seg0[1:]
        return _Func(name.strip(), [arg0] + segs[1:], start, end_pos, src), end_pos
    title = _plain(seg0).strip()
    if not title and len(segs) == 1:
        return None, i
    params: list = []
    pos = 0
    for seg in segs[1:]:
        key, val = _split_kv(seg)
        if key is None:
            pos += 1
            key = str(pos)
        params.append((key, val))
    return _Tpl(title, params, start, end_pos, src), end_pos


def _split_kv(seg):
    if seg and isinstance(seg[0], _Text) and "=" in seg[0].text:
        k, rest = seg[0].text.split("=", 1)
        return k.strip(), [_Text(rest)] + seg[1:]
    return None, seg


def parse_fragment(s: str):
    nodes, _, _ = _parse_seq(s, 0, ())
    return nodes


def _walk_templates(nodes):
    """All _Tpl nodes in document order, transitively (collectTemplates-
    FromNodeTransitive, ExtractorUtils.scala:153-158)."""
    for n in nodes:
        if isinstance(n, _Tpl):
            yield n
            for _, v in n.params:
                yield from _walk_templates(v)
        elif isinstance(n, _Func):
            for a in n.args:
                yield from _walk_templates(a)
        elif isinstance(n, _Param):
            yield from _walk_templates(n.default)


def _walk_funcs(nodes, parent=None):
    """(func, parent) pairs in document order (collectParserFunctions-
    FromNode, ExtractorUtils.scala:135-141)."""
    for n in nodes:
        if isinstance(n, _Func):
            yield n, parent
            for a in n.args:
                yield from _walk_funcs(a, n)
        elif isinstance(n, _Tpl):
            for _, v in n.params:
                yield from _walk_funcs(v, n)
        elif isinstance(n, _Param):
            yield from _walk_funcs(n.default, n)


def _count_params(nodes) -> int:
    c = 0
    for n in nodes:
        if isinstance(n, _Param):
            c += 1 + _count_params(n.default)
        elif isinstance(n, _Func):
            for a in n.args:
                c += _count_params(a)
        elif isinstance(n, _Tpl):
            for _, v in n.params:
                c += _count_params(v)
    return c


def _child_count(node) -> int:
    if isinstance(node, _Func):
        return sum(len(a) for a in node.args)
    if isinstance(node, _Tpl):
        return len(node.params)
    if isinstance(node, _Param):
        return len(node.default)
    return 0


def _children_nodes(node):
    if isinstance(node, _Func):
        return [x for a in node.args for x in a]
    if isinstance(node, _Tpl):
        return [x for _, v in node.params for x in v]
    if isinstance(node, _Param):
        return list(node.default)
    return []


def _is_prop(s: str) -> bool:
    """checkForPropertySyntax (InfoboxMappingsTemplateExtractor.scala:66-71)."""
    return len(s) > 1 and s[0] in "pP" and s[1:].isdigit()


def _func_inner(func: _Func) -> str:
    """Raw text after '#name:' inside the call (braces stripped)."""
    inner = func.src[2:-2] if func.src.endswith("}}") else func.src[2:]
    return inner.split(":", 1)[1] if ":" in inner else ""


# ---------------------------------------------------------------------------
# conditional-expression term mining
# (getTuplesFromConditionalExpressions + getListOfEquivalentTermsAndProperty*,
# InfoboxMappingsTemplateExtractor.scala:80-260)
# ---------------------------------------------------------------------------

def _merge_prop(prop: str, new: str) -> str:
    if not new:
        return prop
    if not prop:
        return new
    if prop != new:
        return "ERROR"
    return prop


def _mine(nodes, terms: list, prop: str) -> str:
    for n in nodes:
        if isinstance(n, _Text):
            t = n.text.strip()
            if len(t) < 2:
                continue
            if "|" in t:
                pieces = t.split("|")
                props = [p for p in pieces if _is_prop(p)]
                terms.extend(p.strip() for p in pieces if not _is_prop(p))
                if len(props) == 1:
                    prop = _merge_prop(prop, props[0])
                elif len(props) > 1:
                    prop = "ERROR"
            elif _is_prop(t):
                prop = _merge_prop(prop, t)
            else:
                terms.append(t)
        elif isinstance(n, _Param):
            terms.append(n.name.strip())
            prop = _mine(n.default, terms, prop)
        elif isinstance(n, _Func):
            name = n.name.lower()
            if name == "#property":
                a0 = _plain(n.args[0]).strip() if n.args else ""
                if "from" not in _func_inner(n) and _is_prop(a0):
                    prop = _merge_prop(prop, a0)
            else:
                # '#if*' conditionals and every other function (#invoke,
                # #expr, ...): mine all arguments
                for a in n.args:
                    prop = _mine(a, terms, prop)
        elif isinstance(n, _Tpl):
            terms.append(n.title.strip())
            for k, v in n.params:
                if k and not k.isdigit():
                    terms.append(k.strip())
                prop = _mine(v, terms, prop)
    return prop


def _mine_row_nodes(val) -> list[tuple[str, str]]:
    terms: list[str] = []
    prop = _mine(val, terms, "")
    if not prop or prop == "ERROR" or not _is_prop(prop):
        return []
    out, seen = [], set()
    for t in terms:
        t = t.strip()
        if not t or t.lower() in _BLACKLIST or t in seen:
            continue
        seen.add(t)
        out.append((t, prop))
    return out


def mine_conditional_row(value: str) -> list[tuple[str, str]]:
    """(term, property) pairs for one infobox row value; empty when the row
    has no single unambiguous Pnnn property."""
    return _mine_row_nodes(parse_fragment(value))


# ---------------------------------------------------------------------------
# per-page analysis (both extract() variants + the tuple miners)
# ---------------------------------------------------------------------------

def analyze_page(content: str, lang: str = "en") -> dict:
    """All InfoboxMappings outputs for one page:

    ``property_tuples``  (template, key, Pnnn) for {{#property:Pnnn}} calls
                         sitting directly in a template param value
                         (getPropertyTuples semantics: parent must be the
                         property row, not a nested function);
    ``invoke_tuples``    (template, key, P1/P2/...) for #invoke:Wikidata /
                         #invoke:PropertyLink rows (extract_property,
                         InfoboxMappingsUtils.scala:10-32);
    ``direct_tuples``    (infobox, key, Pnnn) for configured website
                         templates (getDirectTemplateWikidataMappings);
    ``incomplete``       (infobox, '?', Pnnn) page-wide property-id regex
                         matches (getAllPropertiesInInfobox);
    ``conditional``      (infobox, term, Pnnn) mined fallback terms;
    ``hints``            raw wikitext of the hint-worthy calls;
    ``mappings``         'param=>Pnnn' single-{{{param}}}-sibling pairs
                         (getTemplateMappingsFromPropertyParserFunc).
    """
    nodes = parse_fragment(content)
    infobox_name = INFOBOX_NAME.get(lang, "Infobox")
    direct_map = DIRECT_TEMPLATE_WIKIDATA.get(lang, {})

    property_tuples: list = []
    invoke_tuples: list = []
    direct_tuples: list = []
    conditional: list = []
    templates = list(_walk_templates(nodes))
    for tpl in templates:
        is_infobox = infobox_name in tpl.title
        for key, val in tpl.params:
            for n in val:
                if not isinstance(n, _Func):
                    if (
                        is_infobox
                        and isinstance(n, _Tpl)
                        and n.title in direct_map
                    ):
                        direct_tuples.append((tpl.title, key, direct_map[n.title]))
                    continue
                nm = n.name.lower()
                if nm == "#property":
                    m = _PROPERTY_SIMPLE_RE.match(n.src)
                    if m and "from" not in _func_inner(n):
                        property_tuples.append((tpl.title, key, m.group(1)))
                elif nm == "#invoke":
                    words = _func_inner(n).split("|")
                    if words and words[0] in ("Wikidata", "PropertyLink"):
                        props = [w for w in words if _is_prop(w)]
                        if props:
                            invoke_tuples.append((tpl.title, key, "/".join(props)))
        if is_infobox:
            for key, val in tpl.params:
                conditional.extend(
                    (tpl.title, t, p) for t, p in _mine_row_nodes(val)
                )

    incomplete: list = []
    infobox_titles = [t.title for t in templates if infobox_name in t.title]
    if infobox_titles:
        page_matches = [m[:-1] for m in _ALL_PROPS_RE.findall(content)]
        for title in infobox_titles:
            for m in page_matches:
                incomplete.append((title, "?", m))

    hints: list[str] = []
    mappings: list[str] = []
    for func, parent in _walk_funcs(nodes):
        nm = func.name.lower()
        if nm == "#property":
            inner = _func_inner(func)
            if not inner or "from" in inner:
                continue
            hints.append(func.src)
            if (
                parent is not None
                and _child_count(parent) >= 2
                and _count_params(_children_nodes(parent)) == 1
            ):
                # the single {{{param}}} may sit anywhere in the subtree
                sole, stack = None, _children_nodes(parent)
                while stack and sole is None:
                    x = stack.pop(0)
                    if isinstance(x, _Param):
                        sole = x
                    else:
                        stack.extend(_children_nodes(x))
                if sole is not None:
                    a0 = _plain(func.args[0]).strip() if func.args else ""
                    mappings.append(f"{sole.name}=>{a0}")
        elif nm == "#invoke":
            a0 = (_plain(func.args[0]) if func.args else "").strip().lower()
            if a0.startswith("wikidata") or a0.startswith("propertylink"):
                hints.append(func.src)
    for tpl in templates:
        # t.title.encoded.toLowerCase ∈ {conditionalurl, wikidatacheck}
        # (InfoboxMappingsExtractor.scala:59-62)
        if tpl.title.replace(" ", "_").lower() in ("conditionalurl", "wikidatacheck"):
            hints.append(tpl.src)

    return {
        "property_tuples": property_tuples,
        "invoke_tuples": invoke_tuples,
        "direct_tuples": direct_tuples,
        "incomplete": incomplete,
        "conditional": conditional,
        "hints": hints,
        "mappings": mappings,
    }


def extract_tuples(content: str, lang: str = "en") -> list[tuple[str, str, str]]:
    """extractTuples analog (InfoboxMappingsExtractor.scala:70-83):
    direct ++ invoke ++ property ++ incomplete('?')."""
    r = analyze_page(content, lang)
    return (
        r["direct_tuples"] + r["invoke_tuples"] + r["property_tuples"] + r["incomplete"]
    )


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

_TUPLE_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("template", T.StringType()),
            T.StructField("key", T.StringType()),
            T.StructField("prop", T.StringType()),
            T.StructField("kind", T.StringType()),
        ]
    )
)
_ANALYSIS_T = T.StructType(
    [
        T.StructField("tuples", _TUPLE_T),
        T.StructField("hints", T.ArrayType(T.StringType())),
        T.StructField("mappings", T.ArrayType(T.StringType())),
    ]
)


def _analysis_column(lang: str):
    @F.pandas_udf(_ANALYSIS_T)
    def ana(content: pd.Series) -> pd.DataFrame:
        tuples, hints, mappings = [], [], []
        for c in content:
            r = analyze_page(c or "", lang)
            rows = (
                [(*t, "direct") for t in r["direct_tuples"]]
                + [(*t, "invoke") for t in r["invoke_tuples"]]
                + [(*t, "property") for t in r["property_tuples"]]
                + [(*t, "incomplete") for t in r["incomplete"]]
                + [(tpl, term, prop, "conditional") for tpl, term, prop in r["conditional"]]
            )
            tuples.append(rows)
            hints.append(r["hints"])
            mappings.append(r["mappings"])
        return pd.DataFrame({"tuples": tuples, "hints": hints, "mappings": mappings})

    return ana(F.col("content"))


def _gated(parsed: DataFrame, *, skip_redirects: bool) -> DataFrame:
    df = parsed.filter(F.col("namespace").isin(MAIN, TEMPLATE))
    if skip_redirects:
        df = df.filter(F.col("redirect_target").isNull())
    return df


def mapping_suggestion_tuples(parsed: DataFrame, lang: str = "en") -> DataFrame:
    """(subject, template, key, prop, kind) suggestion tuples — kind ∈
    direct | invoke | property | incomplete | conditional."""
    df = _gated(parsed, skip_redirects=True).withColumn(
        "ibm", _analysis_column(lang)
    )
    t = df.select("subject", F.explode("ibm.tuples").alias("t"))
    return t.select(
        "subject",
        F.col("t.template").alias("template"),
        F.col("t.key").alias("key"),
        F.col("t.prop").alias("prop"),
        F.col("t.kind").alias("kind"),
    )


def infobox_mappings_quads(parsed: DataFrame, lang: str = "en") -> DataFrame:
    """template_mappings + template_mappings_hints quads (the extract()
    surface shared by both reference extractors)."""
    pred = property_base(lang) + "templateUsesWikidataProperty"
    df = _gated(parsed, skip_redirects=True).withColumn(
        "ibm", _analysis_column(lang)
    )
    # ONE explode over a tagged concat — a hints/mappings branch union would
    # evaluate the page-analysis UDF once per branch (the dominant cost)
    tag = lambda col, ds: F.transform(  # noqa: E731
        F.col(f"ibm.{col}"),
        lambda v: F.struct(F.lit(ds).alias("dataset"), v.alias("value")),
    )
    return df.select(
        "subject",
        "page_iri",
        F.explode(
            F.concat(
                tag("hints", DS_TEMPLATE_MAPPINGS_HINTS),
                tag("mappings", DS_TEMPLATE_MAPPINGS),
            )
        ).alias("q"),
    ).select(
        F.lit(lang).alias("language"),
        F.col("q.dataset").alias("dataset"),
        "subject",
        F.lit(pred).alias("predicate"),
        F.col("q.value").alias("value"),
        F.col("page_iri").alias("context"),
        F.lit(XSD_STRING).alias("datatype"),
    )
