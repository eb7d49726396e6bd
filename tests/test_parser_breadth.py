# -*- coding: utf-8 -*-
"""Parser breadth on real-web constructs the synthetic generator doesn't
emit: tables, lists, script/style stripping, comments, entities, nested
blocks, doctype, uppercase tags."""

from datetime import datetime

from intelligent_ocr_spark.operators.extract import extract_record

TS = datetime(2024, 1, 1)


def _x(html: str) -> dict:
    return extract_record("u://x", TS, html.encode(), "", "en")


def test_table_cells_become_blocks():
    e = _x("<table><tr><td>cell one</td><td>cell two</td></tr></table>")
    assert e["extracted_text"] == "cell one\ncell two"


def test_list_items():
    e = _x("<ul><li>alpha</li><li>beta</li></ul>")
    assert e["extracted_text"] == "alpha\nbeta"


def test_script_and_style_stripped():
    e = _x(
        "<body><script>var x = 'not content';</script>"
        "<style>.c { color: red }</style><p>real text</p></body>"
    )
    assert e["extracted_text"] == "real text"


def test_comments_ignored():
    e = _x("<body><!-- hidden comment --><p>visible</p><!--[if IE]>junk<![endif]--></body>")
    assert e["extracted_text"] == "visible"


def test_entities_decoded_and_nfkc():
    e = _x("<p>a &amp; b &lt;c&gt; &#20013;&#25991; ＡＢ</p>")
    # entities decoded; NFKC folds full-width ＡＢ to AB
    assert e["extracted_text"] == "a & b <c> 中文 AB"


def test_doctype_and_uppercase_tags():
    e = _x("<!DOCTYPE html><HTML><BODY><P>Upper case tags</P></BODY></HTML>")
    assert e["extracted_text"] == "Upper case tags"


def test_nested_block_tags_flush_correctly():
    e = _x("<div><p>outer one</p><blockquote>quoted</blockquote><pre>pre text</pre></div>")
    assert e["extracted_text"] == "outer one\nquoted\npre text"


def test_boiler_class_on_block_tag_itself():
    e = _x('<p class="breadcrumb">home > page</p><p>content paragraph</p>')
    assert e["extracted_text"] == "content paragraph"


def test_geo_block_with_entities():
    e = _x(
        '<html data-layout="horizontal"><body>'
        '<div data-bbox="0,0,100,20" data-conf="0.9">x &amp; y</div></body></html>'
    )
    assert e["extracted_text"] == "x & y"


def test_whitespace_only_blocks_dropped():
    e = _x("<body><p>   </p><p>\t\n</p><p>kept</p></body>")
    assert e["extracted_text"] == "kept"
