# -*- coding: utf-8 -*-
"""Binary/pixmap extraction path (M1/M2 twin): page images through the SAME
extract operator as HTML — container decode, X6 blank gate, projection
segmentation, glyph recognition, F7 rescale, W3 reading order, X2/X3
dual-layer, F4 confidence filtering, quarantine."""

import numpy as np
import pytest

from intelligent_ocr_spark.functions.normalize import get_normalizer, nfkc
from intelligent_ocr_spark.functions.pixmap import (
    analyze_page_image,
    decode_page_image,
    default_alphabet,
    encode_page_image,
    render_page_image,
)
from intelligent_ocr_spark.operators.extract import extract_pages, extract_record
from intelligent_ocr_spark.sources.pages import EPOCH, gen_image_row, image_pages_df

TRACKS_V = ["竒書蔵於名山", "傳之其人", "有朋自遠方來"]


def _rec(payload: bytes) -> dict:
    return extract_record("img://t/1", EPOCH, payload, "", "zh")


def test_roundtrip_byte_identity_all_zooms():
    """North-rule byte identity on the pixel path: extraction must invert
    the renderer exactly, at every render zoom (F7 rescale active)."""
    for zoom in (1, 2, 3):
        e = _rec(render_page_image(TRACKS_V, vertical=True, zoom=zoom))
        assert e["error"] is None and not e["is_blank"]
        # vertical classic: columns read RIGHT→LEFT = render track order
        assert e["extracted_text"] == "\n".join(TRACKS_V), zoom
        assert e["n_blocks"] == 3


def test_horizontal_reading_order():
    tracks = ["Hello,World!", "abc123XYZ", "end.line"]
    e = _rec(render_page_image(tracks, vertical=False, zoom=2))
    assert e["extracted_text"] == "\n".join(tracks)


def test_dual_layer_through_pixels():
    """Variant chars recognized from PIXELS get the normalized twin —
    the full reference chain render→OCR→variant dual-insert."""
    e = _rec(render_page_image(["竒書蔵於名山"], vertical=True, zoom=1))
    assert e["extracted_text"] == "竒書蔵於名山"
    assert e["norm_text"] == "奇書藏於名山"


def test_span_geometry_rescaled_to_points():
    """bboxes are divided by the render zoom: font size and verticality
    must be IDENTICAL for the same page rendered at different zooms."""
    spans = {}
    for zoom in (1, 3):
        e = _rec(render_page_image(TRACKS_V, vertical=True, zoom=zoom))
        spans[zoom] = [(s["font_size"], s["is_vertical"]) for s in e["spans"]]
    assert spans[1] == spans[3]
    assert all(v for _, v in spans[1])  # tall narrow columns → vertical


def test_blank_image_gate():
    blank = encode_page_image(np.full((80, 80), 255, dtype=np.uint8), True, 1)
    e = _rec(blank)
    assert e["is_blank"] and e["error"] is None and e["extracted_text"] == ""


def test_corrupt_container_quarantined():
    """A truncated container quarantines as pxpg_decode the moment the
    header/body validation fails — deterministic, zero retries. It must
    NOT fall through to the HTML path: a truncated tail that happens to
    be valid UTF-8 (ASCII pixel rows) would silently parse as garbage."""
    truncated = render_page_image(TRACKS_V, True, 1)[:40]
    e = _rec(truncated)
    assert e["error"] is not None and "pxpg_decode" in e["error"]
    assert e["retries"] == 0


def test_pxpg_magic_prefix_always_routes_to_pixel_path():
    """Anything starting with the 4-byte magic is treated as a (possibly
    broken) pixel container, never as text: a genuine page beginning with
    the literal letters 'PXPG' is essentially impossible, while a corrupt
    container mis-parsed as HTML is a real corruption vector."""
    html = (
        "PXPG is a raster container. <article><h1>t</h1>"
        "<p>notes about the PXPG format</p></article>"
    ).encode()
    e = _rec(html)
    assert e["error"] is not None and "pxpg_decode" in e["error"]
    assert e["extracted_text"] is None or e["extracted_text"] == ""


def test_unknown_glyphs_low_confidence_dropped():
    """A column of out-of-alphabet glyphs recognizes as U+FFFD at conf
    0.25 < 0.5 → the F4 filter drops it; the good column survives."""
    noise = "".join(chr(1 + k) for k in range(6))
    e = _rec(render_page_image([noise, "有朋自遠方來"], vertical=True, zoom=1))
    assert e["extracted_text"] == "有朋自遠方來"
    assert e["n_dropped"] == 1


def test_alphabet_codebook_collision_free():
    from intelligent_ocr_spark.functions.pixmap import _GlyphModel

    alpha = default_alphabet()
    model = _GlyphModel(alpha)  # raises on collision
    assert len(model.codebook) == len(alpha) > 700


def test_distributed_equals_local(spark):
    """extract_pages over the image-page generator == per-row local
    extract_record (the pixel-path differential contract), and every
    generator class lands where it should."""
    n = 60
    out = {r["url"]: r for r in extract_pages(image_pages_df(spark, n, partitions=4)).collect()}
    assert len(out) == n
    for i in range(n):
        local = extract_record(**{
            k: gen_image_row(i)[k] for k in ("url", "warc_ts", "html", "text", "lang")
        })
        got = out[local["url"]]
        assert got["extracted_text"] == local["extracted_text"], i
        assert got["norm_text"] == local["norm_text"], i
        assert got["error"] == local["error"], i
        cls = i % 10
        if cls == 7:
            assert got["is_blank"], i
        elif cls == 8:
            assert got["error"] is not None, i
        else:
            assert got["n_blocks"] > 0, i
    # dual layer exercised somewhere in the corpus
    assert any(
        r["norm_text"] != r["extracted_text"]
        for r in out.values()
        if r["norm_text"] is not None and r["error"] is None
    )


def test_render_extract_roundtrip_fuzz():
    """Hypothesis: ANY tracks drawn from the codebook alphabet, any
    orientation, any zoom — extraction must invert the render exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alpha = default_alphabet()
    track = st.text(alphabet=alpha, min_size=1, max_size=12)

    @given(
        tracks=st.lists(track, min_size=1, max_size=5),
        vertical=st.booleans(),
        zoom=st.integers(1, 3),
    )
    @settings(max_examples=60, deadline=None)
    def check(tracks, vertical, zoom):
        e = _rec(render_page_image(tracks, vertical=vertical, zoom=zoom))
        assert e["error"] is None
        expected = [nfkc(t) for t in tracks]
        got = e["extracted_text"].split("\n") if e["extracted_text"] else []
        # blocks whose conf is full (all glyphs known) must reproduce the
        # track text; NFKC applies as in the HTML path
        assert got == [t for t in expected if t], (tracks, got)

    check()


def test_mixed_html_and_pixmap_batch(spark):
    """One table, both payload kinds — the operator dispatches per row."""
    from intelligent_ocr_spark.sources.pages import pages_df

    mixed = pages_df(spark, 20, partitions=2).unionByName(
        image_pages_df(spark, 20, partitions=2)
    )
    rows = extract_pages(mixed).collect()
    assert len(rows) == 40
    assert sum(1 for r in rows if r["url"].startswith("img://")) == 20
