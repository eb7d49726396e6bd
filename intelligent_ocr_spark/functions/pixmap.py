# -*- coding: utf-8 -*-
"""Pixmap page path: binary page images → recognized glyph blocks.

The Spark twin of the reference's render+OCR core (M1 page render
``core/pdf_processor.py:580-592``, M2 recognition ``core/ocr_engine.py:
312-372``) as a REAL pixel pipeline, end-to-end inside the extraction
operator:

1. **Container decode** — a page image arrives as an opaque ``binary``
   payload in the same ``html`` column (the north_star's "decode each
   page's html/PDF bytes"). Format ``PXPG``: magic + flags (bit0 =
   vertical layout, the reference's page /Rotate metadata analog) + u8
   integer zoom + u16 width/height + 8-bit grayscale pixels. Corrupt or
   truncated payloads raise → the caller's quarantine path.
2. **Blank detection (X6)** — grayscale mean-|gradient| gate
   (``image_kernels.edge_magnitude``), the reference's cheap
   pre-segmentation exit (``core/pdf_processor.py:763-794``).
3. **Binarization + projection-profile segmentation** — ink = pixel <
   128; vertical pages: x-projection runs → columns (read right→left by
   the existing reading-order stage), y-projection within a column →
   glyph cells top→bottom. Horizontal pages: y-projection → lines,
   x-projection within a line → glyphs left→right. This is the
   projection-profile column/line segmentation named in the north_star.
4. **Glyph recognition** — each cell's tight ink crop is downsampled by
   the render zoom and matched against a deterministic codebook (pattern
   = 6×6 bitmap derived from md5(char) over a fixed public alphabet).
   The codebook is the OCR-MODEL SEAM: a per-worker singleton (M4
   warm-up pattern) where a real recognizer drops in on a cluster with
   model weights; everything around it — segmentation, confidence,
   rescale, ordering, spans — is real and byte-stable. Unknown patterns
   yield U+FFFD with low confidence, exercising the F4 confidence filter.
5. **Blocks out** — one block per column/line with the pixel bbox and
   mean glyph confidence, shaped exactly like the HTML geo blocks, so
   the downstream engine (zoom rescale F7, reading order W3, NFKC X1,
   variant dual-layer X2/X3, span assembly, font-size X4 / vertical X5
   metadata) is SHARED with the DOM path.

``render_page_image`` is the deterministic test renderer (the "page →
pixmap" seam, reference M1): it rasterizes text with the same glyph
patterns the codebook recognizes, so extraction must invert the render
byte-identically — the pixel-path analog of the HTML goldens.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from intelligent_ocr_spark.functions.image_kernels import edge_magnitude

__all__ = [
    "PXPG_MAGIC",
    "encode_page_image",
    "decode_page_image",
    "render_page_image",
    "analyze_page_image",
    "analyze_decoded_image",
    "PixmapResult",
    "default_alphabet",
]

PXPG_MAGIC = b"PXPG"
_CELL = 6          # glyph pattern is 6×6 ink/blank
_GLYPH_GAP = 3     # blank px between glyphs within a column/line (zoom 1)
_TRACK_GAP = 8     # blank px between columns (vertical) / lines (horizontal)
_MARGIN = 5
_INK = 0           # ink pixel value (paper = 255)
_BLANK_THRESHOLD = 0.5  # reference blank default core/pdf_processor.py:383,421
_UNKNOWN_CHAR = "�"
_UNKNOWN_CONF = 0.25


def default_alphabet() -> str:
    """The fixed public alphabet the deterministic codebook covers: ASCII
    printables (minus space — glyph OCR has no space concept, like the
    reference's per-glyph text) + every character of the variant table
    (so variant normalization / dual-insert runs on pixel-extracted text)
    + the CJK fragments the synthetic corpus uses."""
    import string

    from intelligent_ocr_spark.functions.variants_data import VARIANTS_TEXT
    from intelligent_ocr_spark.sources.pages import _ZH_FRAGMENTS

    chars = set(string.ascii_letters + string.digits + string.punctuation)
    chars.update(c for line in VARIANTS_TEXT.splitlines() for c in line.strip())
    chars.update(c for frag in _ZH_FRAGMENTS for c in frag)
    chars.update("。、；：？！「」『』〇一二三四五六七八九十")
    return "".join(sorted(chars))


def _glyph_pattern(ch: str) -> np.ndarray:
    """Deterministic 6×6 ink pattern for a character: 36 bits from
    md5(char), with all four corners forced to ink so every glyph's tight
    crop is exactly 6×6 (stable cell geometry for segmentation)."""
    digest = hashlib.md5(ch.encode("utf-8")).digest()
    bits = np.unpackbits(np.frombuffer(digest[:5], dtype=np.uint8))[: _CELL * _CELL]
    pat = bits.reshape(_CELL, _CELL).astype(bool)
    # force the diagonal to ink: every row AND column has ≥1 ink pixel, so
    # a glyph can never split on an internal blank projection line and its
    # tight crop is always exactly 6×6
    pat[np.arange(_CELL), np.arange(_CELL)] = True
    return pat


class _GlyphModel:
    """Pattern → (char, conf) codebook. THE recognizer seam (reference
    ``core/ocr_engine.py:312-372``): swap for a real model on a cluster."""

    def __init__(self, alphabet: str):
        self.codebook: dict[bytes, str] = {}
        for ch in alphabet:
            key = np.packbits(_glyph_pattern(ch)).tobytes()
            other = self.codebook.setdefault(key, ch)
            if other != ch:  # deterministic build → loud, not silent
                raise ValueError(f"glyph pattern collision: {other!r} vs {ch!r}")

    def recognize(self, pattern: np.ndarray) -> tuple[str, float]:
        key = np.packbits(pattern.astype(bool)).tobytes()
        ch = self.codebook.get(key)
        if ch is None:
            return _UNKNOWN_CHAR, _UNKNOWN_CONF
        return ch, 1.0


_MODEL: _GlyphModel | None = None


def _get_model() -> _GlyphModel:
    """Executor-global lazy singleton (one codebook per python worker —
    reference per-process model warm-up ``core/parallel_ocr.py:149-173``)."""
    global _MODEL
    if _MODEL is None:
        _MODEL = _GlyphModel(default_alphabet())
    return _MODEL


# --------------------------------------------------------------------------
# container
# --------------------------------------------------------------------------
def encode_page_image(arr: np.ndarray, vertical: bool, zoom: int) -> bytes:
    h, w = arr.shape
    header = PXPG_MAGIC + struct.pack(
        "<BBHH", 1 if vertical else 0, int(zoom), w, h
    )
    return header + arr.astype(np.uint8).tobytes()


def decode_page_image(data: bytes) -> tuple[np.ndarray, bool, int]:
    """→ (grayscale HxW uint8, vertical, zoom); raises ValueError on a
    corrupt container (caller quarantines)."""
    if len(data) < 10 or data[:4] != PXPG_MAGIC:
        raise ValueError("not a PXPG page image")
    vertical, zoom, w, h = struct.unpack("<BBHH", data[4:10])
    if zoom < 1 or w == 0 or h == 0:
        raise ValueError("PXPG header invalid")
    body = data[10:]
    if len(body) != w * h:
        raise ValueError("PXPG payload truncated")
    arr = np.frombuffer(body, dtype=np.uint8).reshape(h, w)
    return arr, bool(vertical), int(zoom)


# --------------------------------------------------------------------------
# renderer (test/render seam — M1 analog)
# --------------------------------------------------------------------------
def render_page_image(
    tracks: list[str], vertical: bool = True, zoom: int = 1
) -> bytes:
    """Rasterize text tracks into a page image.

    ``tracks`` are reading-order units: columns (read right→left) on a
    vertical page, lines (read top→bottom) on a horizontal one. All
    geometry scales by the integer ``zoom`` (the render-DPI analog);
    extraction divides coordinates back by it (F7 rescale).
    """
    z = int(zoom)
    cell, gap, track_gap, margin = _CELL * z, _GLYPH_GAP * z, _TRACK_GAP * z, _MARGIN * z
    n_tracks = max(len(tracks), 1)
    longest = max((len(t) for t in tracks), default=1) or 1
    main = margin * 2 + longest * cell + (longest - 1) * gap   # along glyph flow
    cross = margin * 2 + n_tracks * cell + (n_tracks - 1) * track_gap
    h, w = (main, cross) if vertical else (cross, main)
    page = np.full((h, w), 255, dtype=np.uint8)
    for t_idx, text in enumerate(tracks):
        # vertical: first track is the RIGHTMOST column (classics order)
        cross_pos = (
            w - margin - cell - t_idx * (cell + track_gap)
            if vertical
            else margin + t_idx * (cell + track_gap)
        )
        for g_idx, ch in enumerate(text):
            main_pos = margin + g_idx * (cell + gap)
            pat = np.kron(_glyph_pattern(ch), np.ones((z, z), dtype=bool))
            y0, x0 = (main_pos, cross_pos) if vertical else (cross_pos, main_pos)
            region = page[y0 : y0 + cell, x0 : x0 + cell]
            region[pat] = _INK
    return encode_page_image(page, vertical, z)


# --------------------------------------------------------------------------
# analyzer (extraction side — M2 + segmentation)
# --------------------------------------------------------------------------
class PixmapResult:
    """Duck-typed like the HTML parser result so ``extract_record``'s geo
    machinery is shared verbatim."""

    def __init__(self, geo_blocks: list[dict], zoom: float, layout: str):
        self.geo_blocks = geo_blocks
        self.dom_blocks: list[dict] = []
        self.zoom = zoom
        self.layout = layout


def _runs(mask: np.ndarray) -> list[tuple[int, int]]:
    """Maximal [start, end) runs of True in a 1-D projection profile."""
    idx = np.flatnonzero(mask)
    if idx.size == 0:
        return []
    splits = np.flatnonzero(np.diff(idx) > 1)
    starts = np.concatenate(([idx[0]], idx[splits + 1]))
    ends = np.concatenate((idx[splits] + 1, [idx[-1] + 1]))
    return list(zip(starts.tolist(), ends.tolist()))


def analyze_page_image(data: bytes) -> PixmapResult:
    """Full pixel path: decode → blank gate → binarize → projection-profile
    segmentation → glyph recognition → geo blocks (pixel bboxes + zoom)."""
    arr, vertical, zoom = decode_page_image(data)
    return analyze_decoded_image(arr, vertical, zoom)


def analyze_decoded_image(arr: np.ndarray, vertical: bool, zoom: int) -> PixmapResult:
    """Analysis over an already-validated decode (lets the caller separate
    container errors — quarantine/fallback — from analysis)."""
    if edge_magnitude(arr.astype(np.float32)) < _BLANK_THRESHOLD:  # X6 gate
        return PixmapResult([], float(zoom), "vertical" if vertical else "horizontal")
    ink = arr < 128
    model = _get_model()
    axis_cross, axis_main = (1, 0) if vertical else (0, 1)
    # tracks: columns (vertical) via x-projection, lines (horizontal) via y
    blocks: list[dict] = []
    for c0, c1 in _runs(ink.any(axis=axis_main)):
        track = ink[:, c0:c1] if vertical else ink[c0:c1, :]
        chars: list[str] = []
        confs: list[float] = []
        cells = _runs(track.any(axis=axis_cross))
        for g0, g1 in cells:
            cell = track[g0:g1, :] if vertical else track[:, g0:g1]
            # tight crop on the cross axis too (corners are ink, so the
            # crop is exactly the glyph pattern extent)
            cr = _runs(cell.any(axis=0) if vertical else cell.any(axis=1))
            if not cr:
                continue
            lo, hi = cr[0][0], cr[-1][1]
            tight = cell[:, lo:hi] if vertical else cell[lo:hi, :]
            side = tight.shape[0]
            z = side // _CELL
            if z < 1 or tight.shape[0] != tight.shape[1] or side % _CELL:
                chars.append(_UNKNOWN_CHAR)
                confs.append(_UNKNOWN_CONF)
                continue
            ch, conf = model.recognize(tight[::z, ::z])
            chars.append(ch)
            confs.append(conf)
        if not chars:
            continue
        if vertical:
            x0, x1 = c0, c1
            y0, y1 = cells[0][0], cells[-1][1]
        else:
            y0, y1 = c0, c1
            x0, x1 = cells[0][0], cells[-1][1]
        blocks.append(
            {
                "parts": ["".join(chars)],
                "conf": round(float(np.mean(confs)), 4),
                "kind": "line",
                "bbox": (float(x0), float(y0), float(x1), float(y1)),
            }
        )
    return PixmapResult(blocks, float(zoom), "vertical" if vertical else "horizontal")
