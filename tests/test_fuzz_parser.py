"""Property-based robustness: the wikitext parser must never raise and must
respect its bounds on arbitrary (including adversarial) input — the analog
of the reference's parse-bounds guards (SimpleWikiParser.scala:19-20,
95-221: MaxNestingLevel, MaxErrors, rollback-to-text)."""

from hypothesis import given, settings, strategies as st

from kgforge.wikitext import MAX_ERRORS, parse

# alphabets biased toward wiki markup so the fuzzer hits the grammar
markup = st.sampled_from(
    ["[[", "]]", "{{", "}}", "{{{", "}}}", "|", "=", "==", "\n", "<!--", "-->",
     "<ref>", "</ref>", "{|", "|}", "[", "]", "http://x.y/", "#REDIRECT ",
     "a", "B c", "ü", "🙂", "'''", "''", ":", "de:", "Category:"]
)
chunks = st.lists(markup, max_size=60).map("".join)


@given(chunks)
@settings(max_examples=300, deadline=None)
def test_parser_never_raises(text):
    p = parse(text)
    assert p.errors <= MAX_ERRORS
    for l in p.links:
        assert l.target  # classified links always carry a non-empty title
    for t in p.templates:
        assert t.name


@given(st.text(max_size=400))
@settings(max_examples=200, deadline=None)
def test_parser_handles_arbitrary_unicode(text):
    parse(text)  # must not raise


def test_pathological_nesting_bounded():
    for evil in ("{{a|" * 200 + "}}" * 200, "[[" * 500, "{|" * 300, "{{{" * 100):
        parse(evil)  # returns, bounded, no recursion error


gallery_markup = st.sampled_from(
    ["<gallery>", "</gallery>", "<gallery caption=\"x\">", "File:", "Image:",
     ".jpg", ".png", "|", "\n", "a b", "''' ", "<gallery", "[[x]]", "<ref>y</ref>"]
)


@given(st.lists(gallery_markup, max_size=40).map("".join))
@settings(max_examples=200, deadline=None)
def test_gallery_capture_never_raises(text):
    p = parse(text)
    for f, c in p.galleries:
        assert f and "." in f  # only plausible file names survive


@given(st.text(max_size=300))
@settings(max_examples=150, deadline=None)
def test_ref_walkback_arbitrary_input(text):
    # the named-ref walk-back indexes lines backwards — must stay in bounds
    from kgforge.wikitext import _extract_refs

    _extract_refs(text + "<ref>z</ref>")
    _extract_refs("<ref name=a/>" + text)
