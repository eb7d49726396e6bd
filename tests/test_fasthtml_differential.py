# -*- coding: utf-8 -*-
"""Differential equivalence: the regex fast-path tokenizer must drive the
extraction handler to EXACTLY the same state as html.parser.HTMLParser for
every input it claims applicability on — over the full generator corpus
and hypothesis-generated adversarial HTML."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from intelligent_ocr_spark.functions.fasthtml import fast_applicable, fast_feed
from intelligent_ocr_spark.operators.extract import _PageParser
from intelligent_ocr_spark.sources.pages import gen_row


def _state(p: _PageParser):
    """Semantic parser state: block 'parts' lists are compared JOINED
    because event segmentation legitimately differs (the stdlib splits
    text at invalid '<' into multiple handle_data calls) while every
    consumer of parts only ever joins them."""

    def geo(b):
        return (b["bbox"], b["conf"], b["kind"], "".join(b["parts"]))

    def dom(b):
        return (b["kind"], "".join(b["parts"]), b["linked"], b["boiler"])

    return (
        p.layout,
        p.zoom,
        [geo(b) for b in p.geo_blocks],
        [dom(b) for b in p.dom_blocks],
    )


def _both(raw: str):
    slow = _PageParser()
    slow.feed(raw)
    slow.close()
    fast = _PageParser()
    fast_feed(fast, raw)
    fast.close()
    # the fused single-loop scanner and the flat-geo findall path
    # (round-6 optimizations) must agree with the stdlib-driven handler
    # on every page they accept; where they bail (None) the general path
    # takes over, so only acceptance is checked here
    from intelligent_ocr_spark.operators.extract import _scan_geo_page, _scan_page

    for scanner in (_scan_page, _scan_geo_page):
        got = scanner(raw)
        if got is not None:
            assert _state(got) == _state(slow), (scanner.__name__, raw)
    return _state(slow), _state(fast)


def test_corpus_equivalence():
    from intelligent_ocr_spark.operators.extract import _scan_page

    checked = 0
    fused_accepted = 0
    for i in range(2000):
        r = gen_row(i)
        if r["html"] is None:
            continue
        try:
            raw = bytes(r["html"]).decode("utf-8")
        except UnicodeDecodeError:
            continue
        if not fast_applicable(raw):
            continue
        s, f = _both(raw)
        assert s == f, r["url"]
        checked += 1
        if _scan_page(raw) is not None:
            fused_accepted += 1
    assert checked > 1500  # the fast path must actually cover the corpus
    # the fused scanner must actually carry the corpus, not bail it all
    # to the general path
    assert fused_accepted > 1500


_TAGS = ["p", "div", "a", "li", "h1", "td", "nav", "em", "my-tag", "br", "img"]
_ATTR_FRAG = [
    "", ' class="menu"', " href=/x", ' data-bbox="1,2,3,4"', ' data-conf="0.7"',
    ' id="a b"', " disabled", ' title="x > y"', " x='1'", ' q="a&amp;b"',
    # strict-attr fast-path stressors: multi-attr runs, no-space packing,
    # empty values, uppercase names, mixed quote styles, trailing slash
    ' a="1" b="2" c="3"', ' href="x"class="y"', ' e=""', ' HREF="UP"',
    ' a-b_c1="v" z="w"', ' a="1" b=\'2\'', ' a="1" disabled', ' a="x/y" /',
    ' a = "1"', ' a="<i>"',
]
_TEXT = [
    "hello", "a & b", "&amp;", "x &lt; y", "  ", "中文 ＡＢ", "", "1 < 2?", "a&b",
    "<!DOCTYPE html>", "<!-- a comment -->", "<!--->", "<?pi data?>", "<!bogus>",
]


@st.composite
def html_doc(draw):
    n = draw(st.integers(0, 20))
    parts = []
    for _ in range(n):
        kind = draw(st.integers(0, 3))
        if kind == 0:
            parts.append(draw(st.sampled_from(_TEXT)))
        elif kind == 1:
            tag = draw(st.sampled_from(_TAGS))
            parts.append(f"<{tag}{draw(st.sampled_from(_ATTR_FRAG))}>")
        elif kind == 2:
            parts.append(f"</{draw(st.sampled_from(_TAGS))}>")
        else:
            tag = draw(st.sampled_from(_TAGS))
            parts.append(f"<{tag}{draw(st.sampled_from(_ATTR_FRAG))}/>")
    return "".join(parts)


@given(html_doc())
@settings(max_examples=400, deadline=None)
def test_structured_fuzz_equivalence(doc):
    if not fast_applicable(doc):
        return
    s, f = _both(doc)
    assert s == f, doc


@given(st.text(alphabet="<>/ab c=\"'&;!?-.123\n", max_size=120))
@settings(max_examples=400, deadline=None)
def test_raw_fuzz_equivalence_or_bail(doc):
    """Arbitrary tag-soup: wherever the fast path claims applicability it
    must match the stdlib parser exactly."""
    if not fast_applicable(doc):
        return
    s, f = _both(doc)
    assert s == f, repr(doc)


def test_bail_conditions():
    # real-world page constructs stay ON the fast path
    assert fast_applicable("<!-- comment --><p>x</p>")
    assert fast_applicable("<!DOCTYPE html><p>x</p>")
    assert fast_applicable("<?php echo 1 ?>")
    assert fast_applicable("<p>plain</p>")
    # raw-text content models and marked sections bail to the stdlib
    assert not fast_applicable("<script>var x;</script>")
    assert not fast_applicable("<STYLE>.c{}</STYLE>")
    assert not fast_applicable("<![CDATA[x]]>")
    assert not fast_applicable("<![if IE]>x<![endif]>")
