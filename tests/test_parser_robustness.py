"""Regression tests for real-world-HTML parser hazards (found by review,
reproduced by execution before the fix):

1. unclosed boilerplate element implicitly closed by a parent endtag must
   not leak boiler_depth over the rest of the page;
2. an unclosed <a> must not mark all later text as link text;
3. void tags (<br>, <img>) inside a data-bbox geo block must not desync
   the block-closing depth;
4. HTML truncated inside a geo block keeps the text instead of
   misclassifying the page as blank;
5. a stray </br> must not close a geo block early.
"""

from datetime import datetime

from intelligent_ocr_spark.operators.extract import extract_record

TS = datetime(2024, 1, 1)


def _x(html: str) -> dict:
    return extract_record("u://x", TS, html.encode(), "", "en")


def test_unclosed_boiler_element_does_not_leak():
    e = _x('<section><div class="menu">links</section><p>Real content paragraph</p>')
    assert e["extracted_text"] == "Real content paragraph"


def test_unclosed_anchor_does_not_poison_link_density():
    e = _x('<p><a href="/x">Home</p><p>Real paragraph of ordinary body text</p>')
    assert e["extracted_text"] == "Real paragraph of ordinary body text"
    assert e["n_dropped"] == 1  # the all-link paragraph itself is stripped


def test_void_tag_inside_geo_block():
    e = _x(
        '<html data-layout="horizontal"><body>'
        '<div data-bbox="0,0,100,20" data-conf="0.9">line one<br>line two</div>'
        '<div data-bbox="0,40,100,60" data-conf="0.9">second block</div>'
        "</body></html>"
    )
    assert e["n_blocks"] == 2
    assert e["extracted_text"] == "line oneline two\nsecond block"


def test_truncated_geo_block_keeps_text():
    e = _x('<html data-layout="horizontal"><body><div data-bbox="0,0,100,20" data-conf="0.9">important surviving text')
    assert e["extracted_text"] == "important surviving text"
    assert not e["is_blank"]


def test_stray_br_endtag_does_not_close_geo_block():
    e = _x(
        '<html data-layout="horizontal"><body>'
        '<div data-bbox="0,0,100,20" data-conf="0.9">part a</br>part b</div>'
        '<div data-bbox="0,40,100,60" data-conf="0.9">blk two</div>'
        "</body></html>"
    )
    assert e["n_blocks"] == 2
    assert e["extracted_text"] == "part apart b\nblk two"


def test_self_closing_void_tag():
    e = _x(
        '<html data-layout="horizontal"><body>'
        '<div data-bbox="0,0,100,20" data-conf="0.9">a<br/>b</div>'
        '<div data-bbox="0,40,100,60" data-conf="0.9">c</div>'
        "</body></html>"
    )
    assert e["n_blocks"] == 2
