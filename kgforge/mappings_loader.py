"""Data-driven MappingsLoader + OntologyReader.

The reference loads its mapping rules and ontology from mappings-wiki pages
parsed as wikitext templates (mappings/MappingsLoader.scala:24-160 walks
{{TemplateMapping}}/{{PropertyMapping}}/{{DateIntervalMapping}}/
{{IntermediateNodeMapping}}/{{ConstantMapping}}/{{ConditionalMapping}}
TemplateNodes; ontology/io/OntologyReader does the same for {{Class}} /
{{ObjectProperty}} / {{DatatypeProperty}} / {{SpecificProperty}} pages,
ConfigLoader.scala:375-389).

This module does the same over ``kgforge/fixtures/mappings/<lang>/*.wiki``
and ``kgforge/fixtures/ontology.wiki`` using the engine's own wikitext
parser — adding or changing a mapping or an ontology property requires a
data-file edit only, zero code changes.

Format divergence (documented): class-override conditions live in a
``conditions =`` parameter of {{TemplateMapping}} as {{Condition}} templates
instead of the reference's whole-mapping-per-case {{ConditionalMapping}}
root — the engine's condition semantics override only the mapped class
(ConditionMapping.scala), so duplicating full rule sets per case would be
redundant data.
"""

from __future__ import annotations

import os
from functools import lru_cache
from pathlib import Path

from .namespaces import RDF_LANGSTRING, XSD
from .wikitext import Template, parse

FIXTURES_DIR = Path(__file__).parent / "fixtures"

_FOAF = "http://xmlns.com/foaf/0.1/"
_DBO = "http://dbpedia.org/ontology/"
_OWL_THING = "http://www.w3.org/2002/07/owl#Thing"
_DBPEDIA_DT = "http://dbpedia.org/datatype/"


def resolve_name(name: str) -> str | None:
    """Prefixed/bare ontology names → IRIs (OntologyReader name resolution:
    bare names live in the dbpedia ontology namespace)."""
    n = name.strip()
    if not n:
        return None
    if n.startswith(("http://", "https://")):
        return n
    if n.startswith("xsd:"):
        return XSD + n[4:]
    if n == "rdf:langString":
        return RDF_LANGSTRING
    if n.startswith("foaf:"):
        return _FOAF + n[5:]
    if n == "owl:Thing":
        return _OWL_THING
    return _DBO + n


def _params(t: Template) -> dict[str, str]:
    """Template params → {lowercased key: raw value} (first wins)."""
    out: dict[str, str] = {}
    for p in t.params:
        out.setdefault((p.key or "").strip().lower(), (p.value or "").strip())
    return out


# ---------------------------------------------------------------------------
# mappings
# ---------------------------------------------------------------------------


def parse_mapping_page(template_name: str, wikitext: str):
    """One mapping page → TemplateMapping (MappingsLoader.loadTemplateMapping
    analog). ``template_name`` is the infobox template the page maps."""
    from .mapping_engine import (
        ClassCondition,
        IntermediateRule,
        IntervalRule,
        PropertyRule,
        TemplateMapping,
    )

    page = parse(wikitext)
    tpls = sorted(page.templates, key=lambda t: t.pos)
    root = next((t for t in tpls if t.name.lower() == "templatemapping"), None)
    if root is None:
        raise ValueError(f"no TemplateMapping root in mapping page {template_name!r}")
    rp = _params(root)
    # ConditionalMapping-rooted pages (ConditionalMapping.scala): each
    # {{Condition}} carries its class in a NESTED {{TemplateMapping}}; the
    # class of a condition = the first TemplateMapping after it (and before
    # the next Condition). The page default = the 'otherwise' branch.
    conditional_root = next(
        (t for t in tpls if t.name.lower() == "conditionalmapping"), None
    )
    cond_classes: dict[int, str] = {}
    if conditional_root is not None:
        conds = [t for t in tpls if t.name.lower() == "condition"]
        for i, c in enumerate(conds):
            nxt = conds[i + 1].pos if i + 1 < len(conds) else float("inf")
            branch = next(
                (t for t in tpls
                 if t.name.lower() == "templatemapping" and c.pos < t.pos < nxt),
                None,
            )
            if branch is not None:
                cls = resolve_name(_params(branch).get("maptoclass", ""))
                if cls:
                    cond_classes[c.pos] = cls
    map_to_class = resolve_name(rp.get("maptoclass", ""))
    if conditional_root is not None and cond_classes:
        # default = otherwise branch else the last branch
        for c in [t for t in tpls if t.name.lower() == "condition"]:
            if _params(c).get("operator", "").lower() == "otherwise" and c.pos in cond_classes:
                map_to_class = cond_classes[c.pos]
        if not map_to_class:
            map_to_class = list(cond_classes.values())[-1]
    if not map_to_class:
        raise ValueError(f"TemplateMapping without mapToClass in {template_name!r}")

    tm = TemplateMapping(template_name.lower(), map_to_class)
    open_im: tuple[IntermediateRule, int] | None = None  # (rule, depth)
    for t in tpls:
        name = t.name.lower()
        p = _params(t)
        if open_im is not None and t.depth <= open_im[1]:
            open_im = None
        if name == "propertymapping":
            rule = PropertyRule(
                p.get("templateproperty", "").lower(),
                resolve_name(p.get("ontologyproperty", "")) or "",
                select=p.get("select") or None,
                prefix=p.get("prefix") or None,
                suffix=p.get("suffix") or None,
            )
            if open_im is not None:
                open_im[0].rules.append(rule)
            else:
                tm.rules.append(rule)
        elif name == "condition":
            tm.conditions.append(
                ClassCondition(
                    p.get("templateproperty", "").lower(),
                    p.get("operator", "otherwise"),
                    p.get("value") or None,
                    resolve_name(p.get("maptoclass", ""))
                    or cond_classes.get(t.pos)
                    or map_to_class,
                )
            )
        elif name == "constantmapping":
            dt = resolve_name(p["datatype"]) if p.get("datatype") else None
            tm.constants.append(
                (resolve_name(p.get("ontologyproperty", "")) or "", p.get("value", ""), dt)
            )
        elif name == "dateintervalmapping":
            tm.intervals.append(
                IntervalRule(
                    p.get("templateproperty", "").lower(),
                    resolve_name(p.get("startdateontologyproperty", "")) or "",
                    resolve_name(p.get("enddateontologyproperty", "")) or "",
                )
            )
        elif name == "combinedatemapping":
            from .mapping_engine import CombineDateRule

            tps: dict[str, str] = {}
            for i in (1, 2, 3):
                tp = p.get(f"templateproperty{i}", "").lower()
                unit = p.get(f"unit{i}", "")
                if tp and unit:
                    tps[tp] = resolve_name(unit) or ""
            tm.combine_dates.append(
                CombineDateRule(resolve_name(p.get("ontologyproperty", "")) or "", tps)
            )
        elif name == "calculatemapping":
            from .mapping_engine import CalculateRule

            tm.calculates.append(
                CalculateRule(
                    p.get("templateproperty1", "").lower(),
                    p.get("templateproperty2", "").lower(),
                    resolve_name(p.get("ontologyproperty", "")) or "",
                    p.get("operation", "add"),
                )
            )
        elif name == "geocoordinatesmapping":
            from .mapping_engine import GeoRule

            tm.geo.append(
                GeoRule(
                    coordinates=p.get("coordinates", "").lower() or None,
                    latitude=p.get("latitude", "").lower() or None,
                    longitude=p.get("longitude", "").lower() or None,
                )
            )
        elif name == "intermediatenodemapping":
            im = IntermediateRule(
                name=p.get("nodeclass", "Node"),
                node_class=resolve_name(p.get("nodeclass", "")) or "",
                link_property=resolve_name(p.get("correspondingproperty", "")) or "",
            )
            tm.intermediates.append(im)
            open_im = (im, t.depth)
    return tm


def parse_table_mapping_page(wikitext: str):
    """A {{TableMapping}} page → TableRule (TableMapping.scala:11-29 wiring
    in MappingsLoader)."""
    from .mapping_engine import PropertyRule, TableRule

    page = parse(wikitext)
    tpls = sorted(page.templates, key=lambda t: t.pos)
    root = next((t for t in tpls if t.name.lower() == "tablemapping"), None)
    if root is None:
        return None
    rp = _params(root)
    tr = TableRule(
        map_to_class=resolve_name(rp.get("maptoclass", "")) or "",
        keywords=rp.get("keywords", ""),
        header=rp.get("header", ""),
        corresponding_property=(
            resolve_name(rp["correspondingproperty"]) if rp.get("correspondingproperty") else None
        ),
    )
    for t in tpls:
        if t.name.lower() == "propertymapping":
            p = _params(t)
            tr.rules.append(
                PropertyRule(
                    p.get("templateproperty", "").lower(),
                    resolve_name(p.get("ontologyproperty", "")) or "",
                )
            )
    return tr


def _is_table_mapping(text: str) -> bool:
    return "{{TableMapping" in text or "{{tablemapping" in text.lower()


def validate_mapping_page(
    template_name: str, wikitext: str, ontology=None
) -> list[dict]:
    """Mapping-page validation (the mapping server's Validate flow:
    server/.../resources/Mappings.scala:228-281 posts the page through
    ExtractionManager.validateMapping, ExtractionManager.scala:76-96, and
    returns the loader's WARNING+ log records). Here the diagnostics are
    structured rows instead of an XML log dump:
    ``[{level: 'severe'|'warning', message: str}, ...]`` — empty = valid.

    severe: the page does not parse as a mapping, or a rule is missing its
    ontology property. warning: a class/property IRI the ontology does not
    know (the page still loads — the engine, like the reference, emits the
    raw IRI). A class-only mapping with zero property rules is VALID: the
    community uses those for stub templates (typing without properties);
    the reference's "no mappings found" severe is a whole-language check
    (ExtractionManager.scala:88), not a per-page one."""
    from .ontology import full_ontology

    ont = ontology or full_ontology()
    out: list[dict] = []
    try:
        tm = parse_mapping_page(template_name, wikitext)
    except ValueError as ex:
        return [{"level": "severe", "message": str(ex)}]

    def _chk_class(iri: str | None, where: str):
        if iri and iri not in ont.classes:
            out.append(
                {"level": "warning", "message": f"unknown class {iri} in {where}"}
            )

    def _chk_prop(iri: str | None, where: str):
        if not iri:
            out.append(
                {"level": "severe", "message": f"missing ontology property in {where}"}
            )
        elif iri not in ont.properties:
            out.append(
                {"level": "warning", "message": f"unknown property {iri} in {where}"}
            )

    _chk_class(tm.map_to_class, "mapToClass")
    for r in tm.rules:
        if not r.template_property:
            out.append(
                {"level": "severe", "message": "PropertyMapping without templateProperty"}
            )
        _chk_prop(r.ontology_property, f"PropertyMapping {r.template_property!r}")
    for c in tm.conditions:
        _chk_class(c.map_to_class, f"Condition {c.template_property!r}")
    for prop, _value, dt in tm.constants:
        _chk_prop(prop, "ConstantMapping")
        if dt and dt not in ont.properties and not dt.startswith("http://www.w3.org/"):
            out.append(
                {"level": "warning", "message": f"unknown datatype {dt} in ConstantMapping"}
            )
    for iv in tm.intervals:
        _chk_prop(iv.start_property, f"DateIntervalMapping {iv.template_property!r}")
        _chk_prop(iv.end_property, f"DateIntervalMapping {iv.template_property!r}")
    for cd in tm.combine_dates:
        _chk_prop(cd.ontology_property, "CombineDateMapping")
    for ca in tm.calculates:
        _chk_prop(ca.ontology_property, "CalculateMapping")
    for im in tm.intermediates:
        _chk_class(im.node_class, "IntermediateNodeMapping nodeClass")
        _chk_prop(im.link_property, "IntermediateNodeMapping correspondingProperty")
        for r in im.rules:
            _chk_prop(r.ontology_property, f"PropertyMapping {r.template_property!r}")
    return out


def load_mappings(lang: str = "en", base_dir: str | os.PathLike | None = None):
    """All template-mapping pages of a language directory → {name: rules}
    (TableMapping-rooted pages are loaded by load_table_mappings)."""
    d = Path(base_dir or FIXTURES_DIR) / "mappings" / lang
    out = {}
    for f in sorted(d.glob("*.wiki")):
        text = f.read_text(encoding="utf-8")
        if _is_table_mapping(text):
            continue
        tm = parse_mapping_page(f.stem, text)
        out[tm.template_name] = tm
    return out


def load_table_mappings(lang: str = "en", base_dir: str | os.PathLike | None = None):
    d = Path(base_dir or FIXTURES_DIR) / "mappings" / lang
    out = []
    for f in sorted(d.glob("*.wiki")):
        text = f.read_text(encoding="utf-8")
        if _is_table_mapping(text):
            tr = parse_table_mapping_page(text)
            if tr is not None:
                out.append(tr)
    return out


@lru_cache(maxsize=4)
def cached_mappings(lang: str = "en"):
    return load_mappings(lang)


@lru_cache(maxsize=4)
def cached_table_mappings(lang: str = "en"):
    return load_table_mappings(lang)


# ---------------------------------------------------------------------------
# ontology
# ---------------------------------------------------------------------------


def load_ontology(path: str | os.PathLike | None = None):
    """ontology.wiki → Ontology (OntologyReader analog)."""
    from .ontology import Ontology, Property

    text = Path(path or FIXTURES_DIR / "ontology.wiki").read_text(encoding="utf-8")
    page = parse(text)
    onto = Ontology()
    for t in sorted(page.templates, key=lambda x: x.pos):
        name = t.name.lower()
        p = _params(t)
        if name == "class":
            iri = resolve_name(p.get("name", ""))
            if not iri:
                continue
            sup = resolve_name(p["subclassof"]) if p.get("subclassof") else None
            onto.classes[iri] = sup
            if p.get("disjointwith"):
                other = resolve_name(p["disjointwith"])
                if other:
                    onto.disjoint.add((iri, other))
        elif name == "enumerationproperty":
            # {{EnumerationProperty | name = X | values = m=Male; f=Female}}
            iri = resolve_name(p.get("name", ""))
            if not iri:
                continue
            enum = {}
            for pair in p.get("values", "").split(";"):
                if "=" in pair:
                    k, v = pair.split("=", 1)
                    enum[k.strip().lower()] = v.strip()
            dom = resolve_name(p["rdfs:domain"]) if p.get("rdfs:domain") else None
            onto.properties[iri] = Property(
                iri, "datatype", XSD + "string", dom, enum=enum
            )
        elif name in ("objectproperty", "datatypeproperty", "unitproperty"):
            iri = resolve_name(p.get("name", ""))
            if not iri:
                continue
            kind = {"objectproperty": "object", "datatypeproperty": "datatype",
                    "unitproperty": "unit"}[name]
            if kind == "unit":
                rng = p.get("dimension") or None  # dimension label, not an IRI
            else:
                rng = resolve_name(p["rdfs:range"]) if p.get("rdfs:range") else None
            dom = resolve_name(p["rdfs:domain"]) if p.get("rdfs:domain") else None
            onto.properties[iri] = Property(iri, kind, rng, dom)
        elif name == "specificproperty":
            cls = resolve_name(p.get("onclass", ""))
            prop = resolve_name(p.get("ontologyproperty", ""))
            if cls and prop:
                onto.specializations[(cls, prop)] = (
                    p.get("unit", ""),
                    float(p.get("factorfromsi", "1")),
                    _DBPEDIA_DT + p.get("datatype", ""),
                )
    return onto


@lru_cache(maxsize=1)
def cached_ontology():
    return load_ontology()


def load_dump_mappings_raw(lang: str = "en") -> dict[str, str]:
    """Raw community mapping pages {template name: wikitext} for ``lang``
    (the validation endpoint consumes pages, not parsed rules)."""
    import gzip
    import json

    path = FIXTURES_DIR / "mappings_dump" / f"{lang}.json.gz"
    with gzip.open(path, "rt", encoding="utf-8") as fh:
        return json.load(fh)


def load_dump_mappings(lang: str = "en", strict: bool = False):
    """The REAL community mapping rules for ``lang`` from the mappings-wiki
    exports the reference ships (fixtures/mappings_dump/<lang>.json.gz,
    harvested by tools/harvest_mappings.py — 7,305 pages / 51 languages).
    Pages the rule parser cannot interpret are skipped with a count (the
    reference's MappingsLoader logs-and-skips too); ``strict=True`` raises
    instead. Returns ({template_name: TemplateMapping}, n_skipped)."""
    import gzip
    import json

    import dataclasses
    import re as _re

    path = FIXTURES_DIR / "mappings_dump" / f"{lang}.json.gz"
    with gzip.open(path, "rt", encoding="utf-8") as fh:
        pages = json.load(fh)
    out, skipped = {}, 0
    redirects: dict[str, str] = {}
    redir_re = _re.compile(
        r"^\s*#REDIRECT\s*\[\[\s*Mapping(?:\s+[a-z-]+)?:([^\]|#]+)", _re.IGNORECASE)
    for name, text in pages.items():
        if _is_table_mapping(text):
            continue
        rm = redir_re.match(text)
        if rm:
            # mapping-page redirect: alias template → target's rules
            redirects[name.lower()] = rm.group(1).strip().lower()
            continue
        try:
            tm = parse_mapping_page(name, text)
        except ValueError:
            if strict:
                raise
            skipped += 1
            continue
        out[tm.template_name] = tm
    for alias, target in redirects.items():
        tm = out.get(target)
        if tm is not None and alias not in out:
            out[alias] = dataclasses.replace(tm, template_name=alias)
        elif tm is None:
            skipped += 1
    return out, skipped


@lru_cache(maxsize=8)
def cached_dump_mappings(lang: str = "en"):
    return load_dump_mappings(lang)[0]


def dump_mappings_by_lang(langs=None):
    """{lang: {template: TemplateMapping}} for every harvested language (or
    the given subset) — feed straight into ``mapping_quads(mappings=...)``
    for the reference's run-per-language-with-its-own-rules behavior."""
    d = FIXTURES_DIR / "mappings_dump"
    avail = sorted(p.name.split(".")[0] for p in d.glob("*.json.gz"))
    out = {}
    for lg in (langs if langs is not None else avail):
        if lg in avail:
            m = cached_dump_mappings(lg)
            if m:
                out[lg] = m
    return out
