"""Template-transform rewriting (TemplateTransformConfig.scala:28-53 +
TemplateNode.transform, TemplateNode.scala:53-58): configured formatting
templates unwrap BEFORE scanning so their children surface to every
extractor. Rule rows modeled on the reference's templatetransform.json
semantics (textNode / extractChildren / getLangText / externalLinkNode /
unwrapTemplates)."""

import pytest

from kgforge.template_transform import transform_wikitext
from kgforge.wikitext import parse


# --- string-level rewrite rows ---------------------------------------------

@pytest.mark.parametrize("src,expected", [
    # textNode constants
    ("a {{ndash}} b", "a - b"),
    ("a {{Mdash}} b", "a  -  b"),
    ("x{{clr}}y", "x<br />y"),
    # textNode with $(n||) param refs
    ("{{lang|fr|Bonjour}}", "Bonjour"),
    ("{{Nihongo|Tokyo|東京|Tōkyō}}", "東京"),
    ("{{ISIN|US1234567890}}", "US1234567890"),
    ("{{NYSE|ACME}}", "NYSE:ACME"),
    ("{{US$|120 million}}", "<br /> USD 120 million<br />"),
    # param ref with internal link: destination surfaces, not the label
    ("{{lang|de|[[München|Munich]]}}", "München"),
    # missing param -> empty resolution
    ("{{lang|fr}}", ""),
    # extractChildren: children framed in <br /> separators
    ("{{nowrap|1971 deaths}}", "<br />1971 deaths<br />"),
    ("{{Nowrap|[[Alpha Beta]]}}", "<br />[[Alpha Beta]]<br />"),
    # filtered keys dropped (Marriage: 'end' + '()' excluded)
    ("{{Marriage|[[Jane Doe]]|1970|end=1980}}",
     "<br />[[Jane Doe]]<br />1970<br />"),
    # additionalSplitString '*' becomes a <br /> split marker
    ("{{Plainlist|\n* [[A]]\n* [[B]]\n}}", "<br /><br /> [[A]]\n<br /> [[B]]<br />"),
    # extractChildren with replace (ICD10 pattern)
    ("{{ICD10|G|40|x}}", "<br />G40.x<br />"),
    # getLangText family (Lang-xx matches any language code)
    ("{{Lang-fr|Paris ville}}", "<br />Paris ville<br />"),
    # externalLinkNode: re-rendered as external-link markup with http default
    ("{{URL|example.com}}", "[http://example.com]"),
    ("{{URL|https://example.org|Site}}", "[https://example.org Site]"),
    ("{{Official website|http://acme.test}}", "[http://acme.test]"),
    # externalLinkNode with nothing usable keeps the original node
    ("{{URL}}", "{{URL}}"),
    # nested transforms: innermost first
    ("{{nowrap|{{ndash}}}}", "<br />-<br />"),
    # underscore-written names gate AND match like their space forms
    ("{{Unbulleted_list|[[A]]|[[B]]}}", "<br />[[A]]<br />[[B]]<br />"),
    ("{{native_name|fr|Nom}}", "Nom"),
    # empty explicit key '|=v' is positional with the post-'=' value
    # (same rule as the scanner's template parse)
    ("{{nowrap|=foo}}", "<br />foo<br />"),
    # unknown templates untouched
    ("{{Infobox person|name=X}}", "{{Infobox person|name=X}}"),
])
def test_transform_rows(src, expected):
    assert transform_wikitext(src) == expected


def test_commons_unwrap_keeps_original_and_surfaces_license():
    # unwrapTemplates: original node kept at head; text params surface as
    # template invocations (toTemplateNodes)
    out = transform_wikitext("{{Self|cc-by-sa-3.0|author=Me}}", lang="commons")
    assert out.startswith("{{Self|cc-by-sa-3.0|author=Me}}")
    assert "{{Cc-by-sa-3.0}}" in out


def test_language_fallback_to_english_table():
    # de has no own table -> English rules apply (TemplateTransformConfig
    # .apply falls back to Language.English)
    assert transform_wikitext("{{nowrap|Berlin}}", lang="de") == "<br />Berlin<br />"


def test_untouched_fast_path_identity():
    s = "plain text {{Some template|a=1}} [[link]]"
    assert transform_wikitext(s) is s  # gate: no configured name, no copy


# --- parser integration: children surface to the flat features -------------

def test_nowrap_link_surfaces_to_plain_and_links():
    r = parse("'''T''' married {{nowrap|[[Jane Doe]]}} in 1970.\n")
    assert any(l.target == "Jane Doe" for l in r.links)
    # the link now renders into plain text (it is no longer inside a template)
    assert "Jane Doe" in r.plain
    assert "Jane Doe" in r.abstract
    # the formatting template is GONE from the template list
    assert not any(t.name.lower() == "nowrap" for t in r.templates)


def test_lang_template_value_surfaces_to_abstract():
    r = parse("'''X''' ({{lang|fr|Lumière}}) is a thing.\n")
    assert "Lumière" in r.abstract


def test_url_template_becomes_external_link():
    r = parse("{{Infobox company\n| website = {{URL|example.com}}\n}}\n")
    assert any(e.uri == "http://example.com" for e in r.external_links)


def test_marriage_in_infobox_value_splits_on_br():
    r = parse("{{Infobox person\n| spouse = {{Marriage|[[Jane Doe]]|1970|end=1980}}\n}}\n")
    ib = [t for t in r.templates if t.name == "Infobox person"][0]
    spouse = [p.value for p in ib.params if p.key == "spouse"][0]
    # the unwrapped children ride the param value with <br /> split markers
    # (the infobox extractor splits on <br>)
    assert "[[Jane Doe]]" in spouse and "1970" in spouse and "1980" not in spouse
    assert "<br />" in spouse


def test_br_renders_as_space_in_plain():
    r = parse("a{{clr}}b\n")
    assert r.plain == "a b"


def test_round5_completed_rule_rows():
    """templatetransform.json parity: the 15 rule rows added in r5 (stock
    tickers, currency prefixes, ICD9, commons license unwraps)."""
    from kgforge.template_transform import transform_wikitext as tw

    assert tw("{{NYSE American|IBM}}", "en") == "AMEX:IBM"
    assert tw("{{SEHK|005}}", "en") == "SEHK:005"
    assert tw("{{AUD|5}}", "en") == "<br /> AUD 5<br />"
    assert tw("{{ICD9|250.1|extra}}", "en") == "<br />250.1<br />"
    assert tw("x{{Paced ndash}}y", "en") == "x - y"
    # commons unwrapTemplates: whileList keys surface as template refs
    out = tw("{{Licensed-FOP|{{Cc-by-2.0}}|{{FoP-Sweden}}}}", "commons")
    assert "Cc-by-2.0" in out and "FoP-Sweden" in out
