"""Post-parse template-transform rewriting.

The reference replaces formatting-template nodes with their rendered
children right after parsing them (wikiparser/TemplateNode.scala:53-58 →
config/transform/TemplateTransformConfig.scala:28-53, rules in the core
``templatetransform.json`` resource), so ``{{nowrap|[[A]]}}`` surfaces its
link and text to EVERY downstream extractor — labels, abstracts, infobox
values, page links all inherit the unwrapped content.

This engine's parser accumulates flat features in one pass instead of
building an AST, so the same semantics are applied as a bounded, recursive
STRING rewrite over the skip-stripped wikitext before scanning
(kgforge/wikitext.py ``parse`` calls :func:`transform_wikitext`): configured
templates are replaced innermost-first by their rendered children, and the
ordinary scanner then sees plain text / links / external links exactly where
the reference's node-level transform would have put them.

Rules are DATA, not code (the mappings_loader pattern): they load from
``fixtures/template_transform.json``, keyed per language with the
reference's transformer vocabulary (textNode / extractChildren /
getLangText / externalLinkNode / unwrapTemplates, ``$(key|prefix|suffix)``
parameter references, ``Lang-$(lang)`` family matching). A language with no
table falls back to the English table, mirroring
TemplateTransformConfig.apply (line 241-248).

The ``<br />`` separators emitted by extractChildren are the reference's
multi-value split markers: the infobox extractor already splits property
values on ``<br>`` (splitPropertyNodeRegexInfobox), so
``{{Marriage|[[Jane]]|1970}}`` inside an infobox value yields one value part
per child, exactly like the node-level original.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from functools import lru_cache
from pathlib import Path

MAX_TRANSFORM_DEPTH = 10

_FIXTURE_PATH = Path(__file__).parent / "fixtures" / "template_transform.json"

# $(key|prefix|suffix) parameter reference (textNodeParamsRegex)
_PARAM_REF_RE = re.compile(r"\$\(([0-9]+)\|([^|)]*)\|([^)]*)\)")
_EXT_LINK_MD_RE = re.compile(r"\[((?:https?|ftp)://[^\s\]]+)(?:\s+[^\]]*)?\]")
_INT_LINK_MD_RE = re.compile(r"\[\[([^\]\|#]*)(?:#[^\]\|]*)?(?:\|[^\]]*)?\]\]")
_SCHEME_RE = re.compile(r"^(?:https?|ftp)://", re.IGNORECASE)
_WS_RE = re.compile(r"[\s_]+")


@dataclass(frozen=True)
class _Rule:
    transformer: str
    replace: str | None = None
    keys: tuple[str, ...] = ()
    while_list: bool = False
    split_extra: str | None = None

    def admits(self, key: str) -> bool:
        return (key in self.keys) if self.while_list else (key not in self.keys)


def _clean_name(raw: str) -> str:
    """WikiUtil.cleanSpace + first-letter capitalize (template names are
    case-insensitive in their first character only)."""
    n = _WS_RE.sub(" ", raw).strip()
    return (n[:1].upper() + n[1:]) if n else n


@lru_cache(maxsize=None)
def _load_tables() -> dict[str, dict[str, _Rule]]:
    with open(_FIXTURE_PATH, encoding="utf-8") as fh:
        data = json.load(fh)
    tables: dict[str, dict[str, _Rule]] = {}
    for lang, entries in data.items():
        if lang == "comment":
            continue
        table: dict[str, _Rule] = {}
        for names, spec in entries.items():
            rule = _Rule(
                transformer=spec["transformer"],
                replace=spec.get("replace"),
                keys=tuple(spec.get("keys", ())),
                while_list=bool(spec.get("whileList", False)),
                split_extra=spec.get("additionalSplitString"),
            )
            for name in names.split("|"):
                table[_clean_name(name)] = rule
        tables[lang] = table
    return tables


@lru_cache(maxsize=None)
def _rules_for(lang: str) -> tuple[dict[str, _Rule], re.Pattern | None]:
    """(rule table, cheap page gate) for a language; unknown languages use
    the English table (TemplateTransformConfig.apply fallback)."""
    tables = _load_tables()
    table = tables.get(lang) or tables.get("en") or {}
    if not table:
        return table, None
    # internal spaces in names must also match underscore/whitespace runs —
    # '{{Unbulleted_list|…}}' is the same template as '{{Unbulleted list|…}}'
    # (the lookup's _clean_name collapses them; the GATE must too)
    alts = sorted(
        re.escape(n).replace("\\ ", r"[\s_]+").replace(" ", r"[\s_]+")
        for n in table if n != "Lang-$(lang)"
    )
    if "Lang-$(lang)" in table:
        alts.append(r"Lang-[A-Za-z-]+")
    gate = re.compile(r"\{\{[\s_]*(?:" + "|".join(alts) + r")[\s_]*[|}]",
                      re.IGNORECASE)
    return table, gate


def _lookup(table: dict[str, _Rule], name: str) -> _Rule | None:
    r = table.get(name)
    if r is not None:
        return r
    if name.startswith("Lang-") and "Lang-$(lang)" in table:
        return table["Lang-$(lang)"]
    return None


def _param_plain(value: str) -> str:
    """extractTextFromPropertyNode: text + external-link IRIs + internal
    link DESTINATIONS (not labels); residual template spans contribute
    nothing (they are not TextNodes)."""
    v = _EXT_LINK_MD_RE.sub(r"\1", value)
    v = _INT_LINK_MD_RE.sub(lambda m: m.group(1).strip(), v)
    v = _strip_template_spans(v)
    return v.strip()


def _strip_template_spans(s: str) -> str:
    if "{{" not in s:
        return s
    from .wikitext import _find_matching

    out = []
    i = 0
    while True:
        j = s.find("{{", i)
        if j == -1:
            out.append(s[i:])
            return "".join(out)
        out.append(s[i:j])
        end = _find_matching(s, j + 2, "{{", "}}", MAX_TRANSFORM_DEPTH)
        i = end if end != -1 else j + 2


def _split_params(parts: list[str]) -> list[tuple[str, str]]:
    """parts[1:] of a top-level split → ordered (key, value) pairs with
    implicit positional keys 1,2,… (same rule as wikitext._parse_template)."""
    from .wikitext import _first_top_level_eq

    out: list[tuple[str, str]] = []
    pos = 0
    for p in parts:
        eq = _first_top_level_eq(p)
        if eq != -1:
            key = p[:eq].strip()
            val = p[eq + 1 :].strip()
            if key:
                out.append((key, val))
            else:
                # '|=value' — empty explicit key becomes positional with the
                # POST-'=' value, exactly like wikitext._parse_template
                pos += 1
                out.append((str(pos), val))
        else:
            pos += 1
            out.append((str(pos), p.strip()))
    return out


def _resolve_refs(template_str: str, by_key: dict[str, str]) -> str:
    def sub(m: re.Match) -> str:
        txt = _param_plain(by_key.get(m.group(1), ""))
        return (m.group(2) + txt + m.group(3)) if txt else ""

    return _PARAM_REF_RE.sub(sub, template_str)


def _apply_rule(rule: _Rule, name: str, raw: str, params: list[tuple[str, str]]) -> str:
    """Render the replacement string for one matched template. ``raw`` is the
    original (child-transformed) template markup, returned unchanged when the
    rule cannot apply (externalLinkNode with no usable URL — the reference
    bails to the original node the same way)."""
    by_key = dict(reversed(params))  # first occurrence of a key wins
    t = rule.transformer
    if t == "textNode":
        return _resolve_refs(rule.replace or "", by_key)
    if t == "extractChildren":
        children = [v for k, v in params if rule.admits(k)]
        if rule.replace is not None:
            def sub(m: re.Match) -> str:
                idx = int(m.group(1)) - 1
                if 0 <= idx < len(children):
                    txt = _param_plain(children[idx])
                    return (m.group(2) + txt + m.group(3)) if txt else ""
                return ""
            return "<br />" + _PARAM_REF_RE.sub(sub, rule.replace) + "<br />"
        if not children:
            return ""
        if rule.split_extra:
            children = [c.replace(rule.split_extra, "<br />") for c in children]
        return "".join("<br />" + c for c in children) + "<br />"
    if t == "getLangText":
        children = [v for k, v in params if rule.admits(k)]
        txt = _param_plain(children[0]) if children else ""
        return "<br />" + txt + "<br />"
    if t == "externalLinkNode":
        url = _param_plain(by_key.get("1", ""))
        if not url or " " in url or ("." not in url and ":" not in url):
            return raw
        if not _SCHEME_RE.match(url):
            url = "http://" + url
        label = (by_key.get("2") or "").strip()
        return "[" + url + ((" " + label) if label else "") + "]"
    if t == "unwrapTemplates":
        # original node is KEPT; filtered text params surface as template
        # invocations (toTemplateNodes) — params already holding templates
        # surface as-is
        extra = []
        for k, v in params:
            if not rule.admits(k) or not v:
                continue
            if "{{" in v:
                extra.append(v)
            else:
                extra.append("{{" + _clean_name(_param_plain(v)) + "}}")
        return raw + "".join("\n" + e for e in extra)
    return raw


def _rewrite(s: str, table: dict[str, _Rule], depth: int) -> str:
    if depth > MAX_TRANSFORM_DEPTH or "{{" not in s:
        return s
    from .wikitext import _find_matching, _split_top_level

    out: list[str] = []
    i = 0
    while True:
        j = s.find("{{", i)
        if j == -1:
            out.append(s[i:])
            return "".join(out)
        out.append(s[i:j])
        if s.startswith("{{{", j):
            # template parameter {{{name|default}}} — rewrite only inside
            end = _find_matching(s, j + 3, "{{{", "}}}", MAX_TRANSFORM_DEPTH)
            if end == -1:
                out.append(s[j : j + 3])
                i = j + 3
                continue
            out.append("{{{" + _rewrite(s[j + 3 : end - 3], table, depth + 1) + "}}}")
            i = end
            continue
        end = _find_matching(s, j + 2, "{{", "}}", MAX_TRANSFORM_DEPTH)
        if end == -1:
            out.append(s[j : j + 2])
            i = j + 2
            continue
        # children first (innermost transforms apply before the parent is
        # matched — the reference transforms nodes as the parser closes them)
        inner = _rewrite(s[j + 2 : end - 2], table, depth + 1)
        raw = "{{" + inner + "}}"
        parts = _split_top_level(inner)
        name = _clean_name(parts[0])
        rule = _lookup(table, name) if name and not name.startswith("#") else None
        if rule is None:
            out.append(raw)
        else:
            out.append(_apply_rule(rule, name, raw, _split_params(parts[1:])))
        i = end


def transform_wikitext(text: str, lang: str = "en") -> str:
    """Apply the language's template-transform rules to ``text``. Pages with
    no configured template name pass through on a single regex gate —
    only matching pages pay the recursive rewrite."""
    if not text or "{{" not in text:
        return text
    table, gate = _rules_for(lang)
    if gate is None or not gate.search(text):
        return text
    return _rewrite(text, table, 0)
