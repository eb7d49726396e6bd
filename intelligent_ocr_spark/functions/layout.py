"""Deterministic layout analysis: vertical detection, font-size estimation,
projection-profile column segmentation, reading-order resolution.

This is the geometry half of the extraction engine. Inputs are block records
``(x0, y0, x1, y1, conf, kind, text)`` — the web-page analog of the
reference's ``OCRResult`` (``core/ocr_engine.py:83-116``: 4-point quad
already reduced to an axis-aligned box at ``:90-108``).

Everything is integer/denominator-free comparisons or exact float arithmetic
on values that originate as integers, so ordering is bit-stable across runs
and parallelism levels (the byte-identity contract).
"""

from __future__ import annotations

from dataclasses import dataclass

__all__ = [
    "Block",
    "is_vertical",
    "estimate_font_size",
    "segment_columns",
    "reading_order",
]


@dataclass
class Block:
    """One detected text block in page-pixel coordinates."""

    x0: float
    y0: float
    x1: float
    y1: float
    text: str
    conf: float = 1.0
    kind: str = "line"

    @property
    def width(self) -> float:
        return self.x1 - self.x0

    @property
    def height(self) -> float:
        return self.y1 - self.y0


def is_vertical(width: float, height: float) -> bool:
    """Vertical-text classification: ``height > width * 2``
    (reference ``core/pdf_processor.py:649-650``)."""
    return height > width * 2


def estimate_font_size(width: float, height: float, char_count: int) -> float:
    """Font-size heuristic, clamped to [4, 72]
    (reference ``core/pdf_processor.py:651-659``):

    * vertical:   ``min(w*0.9, h/chars*0.9)``
    * horizontal: ``min(h*0.9, w/chars*1.5)``
    """
    n = max(char_count, 1)
    if is_vertical(width, height):
        size = min(width * 0.9, height / n * 0.9)
    else:
        size = min(height * 0.9, width / n * 1.5)
    return max(4.0, min(size, 72.0))


def _cluster_1d(
    blocks: list[Block], lo, hi, gap: float
) -> list[list[Block]]:
    """Group blocks into maximal runs of overlapping 1-D intervals.

    ``lo``/``hi`` select the interval per block (x or y extent). Runs are
    separated where the projection profile has a gap wider than ``gap``.
    Deterministic: blocks sorted by (lo, hi, y0, x0) before merging.
    """
    if not blocks:
        return []
    # decorate-sort: one lo/hi evaluation per block and a C-level tuple
    # sort (the index makes the key total, which reproduces the stable
    # tie order of the keyed sort this replaces)
    dec = [(lo(b), hi(b), b.y0, b.x0, j) for j, b in enumerate(blocks)]
    dec.sort()
    first = dec[0]
    groups: list[list[Block]] = []
    cur = [blocks[first[4]]]
    cur_hi = first[1]
    for t in dec[1:]:
        t_hi = t[1]
        if t[0] > cur_hi + gap:
            groups.append(cur)
            cur = [blocks[t[4]]]
            cur_hi = t_hi
        else:
            cur.append(blocks[t[4]])
            if t_hi > cur_hi:
                cur_hi = t_hi
    groups.append(cur)
    return groups


def segment_columns(blocks: list[Block], gap_frac: float = 0.15) -> list[list[Block]]:
    """Projection-profile column segmentation on block x-intervals.

    Project block x-extents onto the x-axis; maximal runs separated by a
    horizontal gap wider than ``gap_frac`` × median block width become
    columns (classic recursive-XY-cut building block). Returns columns
    ordered left→right; caller decides reading direction.
    """
    if not blocks:
        return []
    widths = sorted(b.width for b in blocks)
    median_w = widths[len(widths) // 2] or 1.0
    return _cluster_1d(blocks, lambda b: b.x0, lambda b: b.x1, median_w * gap_frac)


def _segment_bands(blocks: list[Block], gap_frac: float = 0.5) -> list[list[Block]]:
    """Horizontal band segmentation on block y-intervals (top→bottom)."""
    if not blocks:
        return []
    heights = sorted(b.height for b in blocks)
    median_h = heights[len(heights) // 2] or 1.0
    return _cluster_1d(blocks, lambda b: b.y0, lambda b: b.y1, median_h * gap_frac)


def _leaf_key(b: Block):
    """TOTAL ordering key for blocks inside a leaf region: geometry first,
    then content — so reading order is invariant to input order even for
    degenerate documents with blocks at identical coordinates (hypothesis
    found the tie; stable-sort-by-geometry-alone leaked input order)."""
    return (b.y0, b.x0, b.x1, b.y1, b.text, b.kind, b.conf)


def xy_cut(blocks: list[Block], rtl: bool) -> list[Block]:
    """Recursive XY-cut (public classic of document layout analysis):
    split on y-projection gaps into bands (read top→bottom), within a band
    split on x-projection gaps into columns (read left→right, or
    right→left for vertical-CJK pages), recurse; a leaf region is read
    by (y0, x0). Fully deterministic — no float products, only
    comparisons against gap thresholds derived from sorted medians.
    """
    if len(blocks) <= 1:
        return list(blocks)
    bands = _segment_bands(blocks)
    if len(bands) > 1:
        out: list[Block] = []
        for band in bands:
            out.extend(_xy_cut_columns(band, rtl))
        return out
    return _xy_cut_columns(blocks, rtl, from_band=True)


def _xy_cut_columns(blocks: list[Block], rtl: bool, from_band: bool = False) -> list[Block]:
    if len(blocks) <= 1:
        return list(blocks)
    cols = segment_columns(blocks)
    if len(cols) > 1:
        if rtl:
            cols = list(reversed(cols))
        out: list[Block] = []
        for col in cols:
            out.extend(xy_cut(col, rtl) if not from_band else _leaf_or_bands(col, rtl))
        return out
    return sorted(blocks, key=_leaf_key)


def _leaf_or_bands(blocks: list[Block], rtl: bool) -> list[Block]:
    """Inside a column of a band: allow one more y-split level, else leaf."""
    bands = _segment_bands(blocks)
    if len(bands) > 1:
        out: list[Block] = []
        for band in bands:
            out.extend(sorted(band, key=_leaf_key))
        return out
    return sorted(blocks, key=_leaf_key)


def reading_order(blocks: list[Block], vertical_page: bool) -> list[Block]:
    """Resolve reading order (reference W3 semantics,
    ``core/pdf_processor.py:667-702``):

    * vertical CJK page: columns right→left, within a column top→bottom
      (the ``rotate=270`` top-right-anchor flow);
    * horizontal page: bands top→bottom, columns left→right within a band,
      lines top→bottom within a column (textbox insertion order).

    Structure comes from :func:`xy_cut`, so a two-column academic page with
    a full-width heading reads heading → column 1 → column 2 instead of
    interleaving lines.
    """
    return xy_cut(list(blocks), rtl=vertical_page)
