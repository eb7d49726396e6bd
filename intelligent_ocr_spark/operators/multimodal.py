"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side contract (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. The codec layer is three-tier:
PIL when importable (not in this container), a REAL in-container decoder
for BMP (24-bit uncompressed), PPM/PGM, **PNG** (stdlib-zlib inflate +
numpy scanline unfiltering, all five filter types, color types
0/2/3/4/6, sequential and Adam7), **GIF** (pure-Python LZW, interlace,
local/global color tables) and **JPEG** — baseline (canonical Huffman
from DHT, matrix IDCT, 4:2:0/4:2:2/4:4:4, restart markers, grayscale)
AND progressive (T.81 Annex G spectral selection + successive
approximation) — each spec-faithful, round-trip tested against its
encoder twin plus hand-computed known-answer byte vectors — and a
deterministic fake for anything else so every downstream stage still
runs real numpy on real shapes. Only video codecs beyond MJPEG (see
``video.py``) remain the environment-bound seam.

Pattern mirrors the extraction engine: decode + feature-extract fused into
ONE ``mapInPandas`` stage, module-level singleton for any heavyweight codec
state (reference per-worker warm-up, ``core/parallel_ocr.py:149-173``),
small Arrow batches because media rows are fat (same reasoning as the
reference's JPEG-compressed IPC, ``core/parallel_ocr.py:226-241`` — Arrow
replaces the hand-rolled compression).
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from intelligent_ocr_spark.functions.image_kernels import adaptive_zoom, is_blank_image
from intelligent_ocr_spark.util import ensure_parallelism

__all__ = [
    "MEDIA_META_SCHEMA",
    "media_type_col",
    "decode_image_stats",
    "sample_frames",
    "fake_decode_u8",
    "decode_bmp",
    "decode_ppm",
    "decode_png",
    "decode_gif",
    "decode_jpeg",
    "encode_bmp",
    "encode_png",
    "encode_gif",
    "encode_jpeg",
    "encode_jpeg_progressive",
]

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("is_blank", T.BooleanType(), True),
        T.StructField("render_zoom", T.DoubleType(), True),
        T.StructField("content_md5", T.StringType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_md5", T.StringType(), False),
    ]
)


def media_type_col(media):
    """Magic-byte media-type sniff as a PURE JVM column expression —
    no Python in the plan, whole-stage-codegen'd, so content-type
    stats over a 100 TB media column run at scan speed. Matches the
    same signatures the Python decoders check: PNG/GIF/BMP/netpbm/JPEG
    plus the RIFF containers (WAVE vs AVI disambiguated by the form
    type at offset 8).
    """
    from pyspark.sql import functions as F

    if isinstance(media, str):
        media = F.col(media)

    def sig(start, hexs):
        return F.hex(F.substring(media, start, len(hexs) // 2)) == hexs.upper()

    return (
        F.when(media.isNull() | (F.length(media) == 0), "empty")
        .when(sig(1, "89504e470d0a1a0a"), "image/png")
        .when(sig(1, "474946383761") | sig(1, "474946383961"), "image/gif")
        .when(sig(1, "424d"), "image/bmp")
        .when(sig(1, "5035") | sig(1, "5036"), "image/x-portable-pixmap")
        .when(sig(1, "ffd8"), "image/jpeg")
        .when(sig(1, "52494646") & sig(9, "57415645"), "audio/wav")
        .when(sig(1, "52494646") & sig(9, "41564920"), "video/avi")
        .otherwise("unknown")
    )


def _try_real_decode(payload: bytes):
    """Seam for a real image decoder (PIL is not in this container).

    When Pillow IS importable, the payload is decoded for real; any decode
    failure (or PIL absent) returns ``None`` so the caller degrades to the
    deterministic fake instead of crashing the task — the quarantine-over-
    crash rule every other decode path here follows.
    """
    try:
        import io

        import PIL.Image
    except ImportError:
        return None
    try:
        with PIL.Image.open(io.BytesIO(payload)) as im:
            arr = np.asarray(im.convert("RGB"))
        h, w, c = arr.shape
        return arr, w, h, c
    except Exception:  # undecodable bytes: degrade, never crash
        return None


def decode_ppm(payload: bytes):
    """Pure-numpy netpbm decode: binary PPM (``P6``, RGB) and PGM
    (``P5``, grayscale), maxval ≤ 255. Returns (arr, w, h, c) or None
    if the payload is not a parseable netpbm image."""
    if payload[:2] not in (b"P6", b"P5"):
        return None
    try:
        # header = magic, width, height, maxval as whitespace-separated
        # tokens, '#' comments allowed between them (netpbm spec)
        tokens: list[int] = []
        pos = 2
        while len(tokens) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                pos = payload.index(b"\n", pos) + 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(payload[start:pos]))
        pos += 1  # single whitespace after maxval, then raster
        w, h, maxval = tokens
        if not (0 < w and 0 < h and 0 < maxval <= 255):
            return None
        c = 3 if payload[:2] == b"P6" else 1
        n = w * h * c
        raster = payload[pos : pos + n]
        if len(raster) != n:
            return None
        arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, c)
        if c == 1:
            arr = np.repeat(arr, 3, axis=2)
            c = 3
        return arr, w, h, c
    except (ValueError, IndexError):
        return None


def decode_bmp(payload: bytes):
    """Pure-numpy decode of uncompressed 24-bit BMP (BITMAPINFOHEADER,
    BI_RGB): bottom-up or top-down, 4-byte row padding, BGR→RGB.
    Returns (arr, w, h, 3) or None for any other BMP flavor."""
    if payload[:2] != b"BM" or len(payload) < 54:
        return None
    try:
        data_off = int.from_bytes(payload[10:14], "little")
        hdr_size = int.from_bytes(payload[14:18], "little")
        if hdr_size < 40:
            return None  # BITMAPCOREHEADER etc. — not supported
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or compression != 0 or w <= 0 or h == 0:
            return None
        top_down = h < 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
        raster = payload[data_off : data_off + stride * h]
        if len(raster) != stride * h:
            return None
        rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
        arr = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
        if not top_down:
            arr = arr[::-1]
        return np.ascontiguousarray(arr), w, h, 3
    except (ValueError, IndexError):
        return None


def encode_bmp(arr: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP writer (test-fixture twin of
    ``decode_bmp`` — deterministic, no libraries)."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, flip
    body = raster.tobytes()
    header = (
        b"BM"
        + (54 + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + body


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type → samples per pixel at bit depth 8
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


# Adam7 pass grid: (first row, first col, row step, col step) per pass.
_ADAM7 = [
    (0, 0, 8, 8),
    (0, 4, 8, 8),
    (4, 0, 8, 4),
    (0, 2, 4, 4),
    (2, 0, 4, 2),
    (0, 1, 2, 2),
    (1, 0, 2, 1),
]


def _png_unfilter(rows: np.ndarray, w: int, h: int, nch: int):
    """Invert the five RFC 2083 §6 row filters over a (h, stride+1)
    byte matrix (filter byte first). Returns (h, stride) or None on an
    unknown filter type.

    Filter 1 (Sub) is a per-byte-lane running sum — vectorized as a
    modular cumsum; 2 (Up) is a whole-row vector add. Average/Paeth
    recurse on the left neighbor, so those rows walk pixel positions in
    Python with numpy ops on the channel lane — O(width) per row, fine
    for the metadata-stat sizes this tier serves.
    """
    stride = w * nch
    filters = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(filters[y])
        cur = rows[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else zero_row
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: modular cumsum per byte lane
            lanes = cur.reshape(w, nch)
            rec = np.cumsum(lanes, axis=0, dtype=np.int64).reshape(stride) & 0xFF
        elif f == 2:  # Up
            rec = (cur + prior) & 0xFF
        elif f == 3:  # Average
            rec = cur
            left = np.zeros(nch, dtype=np.int32)
            pri = prior.reshape(w, nch)
            px = rec.reshape(w, nch)
            for x in range(w):
                px[x] = (px[x] + ((left + pri[x]) >> 1)) & 0xFF
                left = px[x]
            rec = px.reshape(stride)
        elif f == 4:  # Paeth
            rec = cur
            a = np.zeros(nch, dtype=np.int32)  # left
            c = np.zeros(nch, dtype=np.int32)  # upper-left
            pri = prior.reshape(w, nch)
            px = rec.reshape(w, nch)
            for x in range(w):
                b = pri[x]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                px[x] = (px[x] + pred) & 0xFF
                a, c = px[x].copy(), b
            rec = px.reshape(stride)
        else:
            return None
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(payload: bytes):
    """Real PNG decode with no image library: chunk walk, stdlib-``zlib``
    inflate of the concatenated IDAT stream, then scanline unfiltering
    (all five filter types 0-4 per RFC 2083 §6). Supports bit depth 8,
    color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
    6 (RGBA), sequential AND Adam7-interlaced (each pass unfiltered as
    its own sub-image per §2.6, then scattered onto the pass grid).
    Alpha is dropped, gray replicated, palette resolved — output is
    always RGB. Returns (arr, w, h, 3) or None for any other PNG flavor
    (16-bit) or undecodable bytes.
    """
    if payload[:8] != _PNG_SIG:
        return None
    try:
        import zlib

        pos = 8
        ihdr = None
        plte = None
        idat = bytearray()
        while pos + 8 <= len(payload):
            ln = int.from_bytes(payload[pos : pos + 4], "big")
            typ = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + ln]
            if len(data) != ln:
                return None
            if typ == b"IHDR":
                ihdr = data
            elif typ == b"PLTE":
                plte = data
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                break
            pos += 12 + ln  # len + type + data + CRC
        if ihdr is None or len(ihdr) < 13:
            return None
        w = int.from_bytes(ihdr[0:4], "big")
        h = int.from_bytes(ihdr[4:8], "big")
        depth, ctype, interlace = ihdr[8], ihdr[9], ihdr[12]
        nch = _PNG_CHANNELS.get(ctype)
        if depth != 8 or interlace not in (0, 1) or nch is None or w <= 0 or h <= 0:
            return None
        raw = zlib.decompress(bytes(idat))
        stride = w * nch
        if interlace == 0:
            if len(raw) != h * (stride + 1):
                return None
            rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
            out = _png_unfilter(rows, w, h, nch)
            if out is None:
                return None
        else:  # Adam7: 7 independently-filtered sub-images, concatenated
            grid = np.zeros((h, w, nch), dtype=np.uint8)
            at = 0
            for r0, c0, rs, cs in _ADAM7:
                pw = (w - c0 + cs - 1) // cs
                ph = (h - r0 + rs - 1) // rs
                if pw <= 0 or ph <= 0:
                    continue  # empty pass emits no scanlines at all
                pstride = pw * nch
                need = ph * (pstride + 1)
                if at + need > len(raw):
                    return None
                rows = np.frombuffer(raw[at : at + need], dtype=np.uint8)
                at += need
                sub = _png_unfilter(rows.reshape(ph, pstride + 1), pw, ph, nch)
                if sub is None:
                    return None
                grid[r0::rs, c0::cs, :] = sub.reshape(ph, pw, nch)
            if at != len(raw):
                return None
            out = grid.reshape(h, stride)
        px = out.reshape(h, w, nch)
        if ctype == 0:
            arr = np.repeat(px, 3, axis=2)
        elif ctype == 2:
            arr = px
        elif ctype == 3:
            if plte is None or len(plte) % 3:
                return None
            table = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
            idx = px[:, :, 0]
            if int(idx.max(initial=0)) >= len(table):
                return None
            arr = table[idx]
        elif ctype == 4:
            arr = np.repeat(px[:, :, :1], 3, axis=2)  # drop alpha
        else:  # 6
            arr = px[:, :, :3]  # drop alpha
        return np.ascontiguousarray(arr), w, h, 3
    except Exception:
        return None


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + typ
        + data
        + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _png_filter_rows(arr: np.ndarray, filters) -> bytearray:
    """Forward-filter an (h, w, 3) image into PNG scanlines (filter
    byte + filtered row each) — the spec's §6 equations, written
    independently of the decoder's inverse forms."""
    h, w, _ = arr.shape
    a32 = arr.astype(np.int32)
    stride = w * 3
    lines = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        cur = a32[y].reshape(stride)
        prior = a32[y - 1].reshape(stride) if y else np.zeros(stride, dtype=np.int32)
        left = np.concatenate([np.zeros(3, dtype=np.int32), cur[:-3]])
        ul = np.concatenate([np.zeros(3, dtype=np.int32), prior[:-3]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - left) & 0xFF
        elif f == 2:
            enc = (cur - prior) & 0xFF
        elif f == 3:
            enc = (cur - ((left + prior) >> 1)) & 0xFF
        else:  # 4 Paeth
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul))
            enc = (cur - pred) & 0xFF
        lines.append(f)
        lines += enc.astype(np.uint8).tobytes()
    return lines


def encode_png(arr: np.ndarray, filters=None, interlace: bool = False) -> bytes:
    """Deterministic PNG writer (fixture twin of :func:`decode_png`):
    8-bit RGB (color type 2), one filter byte per row. ``filters`` picks
    the per-row filter type (int, or list cycled over rows; default
    cycles 0..4 so round-trip tests exercise every unfilter path).
    ``interlace=True`` writes Adam7: each pass extracted on the pass
    grid and filtered as its own sub-image, empty passes omitted."""
    h, w, _ = arr.shape
    if filters is None:
        filters = [0, 1, 2, 3, 4]
    elif isinstance(filters, int):
        filters = [filters]
    if interlace:
        lines = bytearray()
        for r0, c0, rs, cs in _ADAM7:
            sub = arr[r0::rs, c0::cs, :]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            lines += _png_filter_rows(np.ascontiguousarray(sub), filters)
    else:
        lines = _png_filter_rows(arr, filters)
    import zlib

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, int(interlace)])  # depth 8, RGB, deflate, adaptive
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def _gif_lzw_decode(data: bytes, min_code: int, n_pixels: int):
    """GIF-variant LZW: variable code width starting ``min_code + 1``,
    CLEAR/EOI codes, table cap 4096, LSB-first bit packing."""
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            return None
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_pixels]) if len(out) >= n_pixels else None


# GIF interlace passes: (row offset, row step) in order
_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes):
    """Real GIF decode with no image library: logical screen descriptor,
    global/local color tables, pure-Python LZW (variable width, CLEAR,
    the KwKwK case, 4096-entry cap), 4-pass interlace reorder. Decodes
    the FIRST image block; extensions are skipped by sub-block walking.
    Output is the frame resolved through its color table as RGB.
    Returns (arr, w, h, 3) or None."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        pos = 6
        packed = payload[pos + 4]
        gct = None
        pos += 7
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        while pos < len(payload):
            b0 = payload[pos]
            pos += 1
            if b0 == 0x21:  # extension: label + sub-blocks
                pos += 1
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            elif b0 == 0x2C:  # image descriptor
                w = int.from_bytes(payload[pos + 4 : pos + 6], "little")
                h = int.from_bytes(payload[pos + 6 : pos + 8], "little")
                ipacked = payload[pos + 8]
                pos += 9
                table = gct
                if ipacked & 0x80:
                    n = 2 << (ipacked & 0x07)
                    table = np.frombuffer(
                        payload[pos : pos + 3 * n], dtype=np.uint8
                    ).reshape(n, 3)
                    pos += 3 * n
                if table is None or w <= 0 or h <= 0:
                    return None
                min_code = payload[pos]
                pos += 1
                lzw = bytearray()
                while payload[pos] != 0:
                    ln = payload[pos]
                    lzw += payload[pos + 1 : pos + 1 + ln]
                    pos += 1 + ln
                idx_bytes = _gif_lzw_decode(bytes(lzw), min_code, w * h)
                if idx_bytes is None:
                    return None
                idx = np.frombuffer(idx_bytes, dtype=np.uint8).reshape(h, w)
                if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
                    ordered = np.empty_like(idx)
                    src = 0
                    for off, step in _GIF_PASSES:
                        for y in range(off, h, step):
                            ordered[y] = idx[src]
                            src += 1
                    idx = ordered
                if int(idx.max(initial=0)) >= len(table):
                    return None
                return np.ascontiguousarray(table[idx]), w, h, 3
            elif b0 == 0x3B:  # trailer
                return None
            else:
                return None
        return None
    except (ValueError, IndexError):
        return None


def _gif_lzw_encode(indices: bytes, min_code: int) -> bytes:
    """Proper GIF LZW encoder (fixture twin): dictionary growth, width
    bumps, CLEAR on table overflow — so round-trips exercise the
    decoder's real table dynamics, not just literal codes."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code + 1
    table = {bytes([i]): i for i in range(clear)}
    nxt = eoi + 1
    emit(clear, width)
    cur = b""
    for byte in indices:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        if nxt < 4096:
            table[cand] = nxt
            nxt += 1
            if nxt - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            nxt = eoi + 1
            width = min_code + 1
        cur = bytes([byte])
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Deterministic GIF87a writer (fixture twin of :func:`decode_gif`):
    palettizes the array (≤256 distinct colors required), global color
    table, single image block, real LZW, optional interlacing."""
    h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    n = len(colors)
    if n > 256:
        raise ValueError("encode_gif needs <=256 distinct colors")
    bits = max(1, int(n - 1).bit_length())
    size = 1 << bits
    palette = np.zeros((size, 3), dtype=np.uint8)
    palette[:n] = colors
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        rows = [idx[y] for off, step in _GIF_PASSES for y in range(off, h, step)]
        raster = np.stack(rows).tobytes()
    else:
        raster = idx.tobytes()
    min_code = max(2, bits)
    lzw = _gif_lzw_encode(raster, min_code)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        piece = lzw[i : i + 255]
        blocks.append(len(piece))
        blocks += piece
    blocks.append(0)
    header = (
        b"GIF87a"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0x80 | (bits - 1), 0, 0])
        + palette.tobytes()
    )
    img = (
        b"\x2c"
        + b"\x00\x00\x00\x00"
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
        + bytes([0x40 if interlace else 0x00, min_code])
        + bytes(blocks)
    )
    return header + img + b"\x3b"


# JFIF zigzag scan order: index i of the zigzag stream → (row, col)
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis M: forward DCT = M·b·Mᵀ, inverse =
    Mᵀ·B·M. Matrix form keeps both transforms as two numpy matmuls."""
    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    m[0] /= np.sqrt(2.0)
    return m


_DCT_M = _dct_matrix()


def _huff_canonical(bits: list[int], vals: bytes) -> dict:
    """DHT payload → {(length, code): symbol} via the canonical code
    assignment of ITU-T T.81 Annex C (codes count up within a length,
    shift left when the length grows)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment that has
    already had its 0xFF00 byte stuffing removed."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("bitstream exhausted")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: low-order ``size`` bits → signed value."""
    if size and v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


def _exif_orientation(app1: bytes) -> int:
    """Orientation (1-8) from an APP1 Exif segment: 'Exif\\0\\0' header,
    TIFF byte-order mark, IFD0 walk for tag 0x0112. Returns 1 (normal)
    for anything malformed — metadata must never fail a decode."""
    try:
        if app1[:6] != b"Exif\x00\x00":
            return 1
        t = app1[6:]
        if t[:2] == b"II":
            bo = "little"
        elif t[:2] == b"MM":
            bo = "big"
        else:
            return 1
        if int.from_bytes(t[2:4], bo) != 42:
            return 1
        ifd = int.from_bytes(t[4:8], bo)
        n = int.from_bytes(t[ifd : ifd + 2], bo)
        for i in range(n):
            e = t[ifd + 2 + 12 * i : ifd + 14 + 12 * i]
            if int.from_bytes(e[0:2], bo) == 0x0112 and int.from_bytes(
                e[2:4], bo
            ) == 3:
                v = int.from_bytes(e[8:10], bo)
                return v if 1 <= v <= 8 else 1
        return 1
    except (IndexError, ValueError):
        return 1


def _apply_orientation(arr: np.ndarray, orientation: int) -> np.ndarray:
    """Map decoded pixels to display orientation per the Exif spec's
    eight cases (5-8 swap width and height)."""
    if orientation == 2:
        arr = arr[:, ::-1]
    elif orientation == 3:
        arr = arr[::-1, ::-1]
    elif orientation == 4:
        arr = arr[::-1, :]
    elif orientation == 5:  # transpose
        arr = arr.transpose(1, 0, 2)
    elif orientation == 6:  # rotate 90 CW
        arr = arr.transpose(1, 0, 2)[:, ::-1]
    elif orientation == 7:  # transverse
        arr = arr.transpose(1, 0, 2)[::-1, ::-1]
    elif orientation == 8:  # rotate 90 CCW
        arr = arr.transpose(1, 0, 2)[::-1, :]
    return np.ascontiguousarray(arr)


def decode_jpeg(payload: bytes):
    """Real JPEG decode with no image library: marker walk, canonical
    Huffman tables read from DHT, run-length/EOB AC expansion,
    dequantize, un-zigzag, matrix IDCT, chroma upsampling, JFIF
    YCbCr→RGB. Supports baseline DCT (SOF0) with sampling factors 1-2
    (4:4:4, 4:2:0, 4:2:2) and restart markers, AND progressive DCT
    (SOF2, T.81 Annex G): multi-scan accumulation with spectral
    selection and successive approximation — DC first/refine, AC first
    with EOB runs, AC refinement with correction bits. 8-bit, 1 or 3
    components. Returns (arr, w, h, 3) or None for 12-bit/arithmetic/
    lossless flavors or undecodable bytes.

    Per-bit Huffman walking is Python-speed — right for the fixture and
    metadata-stat sizes this tier serves; the surrounding Spark plumbing
    is identical whether this or a native codec sits behind the seam.
    """
    if payload[:2] != b"\xff\xd8":
        return None
    try:
        pos = 2
        qt: dict[int, np.ndarray] = {}
        huff_dc: dict[int, dict] = {}
        huff_ac: dict[int, dict] = {}
        frame = None
        progressive = False
        coefs = None  # per comp: (BH, BW, 64) zigzag-order accumulators
        restart_interval = 0
        orientation = 1
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            pos += 2
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue
            if marker == 0xD9:  # EOI
                break
            ln = int.from_bytes(payload[pos : pos + 2], "big")
            seg = payload[pos + 2 : pos + ln]
            if marker == 0xDB:  # DQT
                s = 0
                while s < len(seg):
                    pq, tq = seg[s] >> 4, seg[s] & 0x0F
                    if pq != 0:
                        return None  # 16-bit tables: not baseline-8
                    qt[tq] = np.frombuffer(
                        seg[s + 1 : s + 65], dtype=np.uint8
                    ).astype(np.int32)
                    s += 65
            elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
                prec = seg[0]
                h = int.from_bytes(seg[1:3], "big")
                w = int.from_bytes(seg[3:5], "big")
                nc = seg[5]
                if prec != 8 or nc not in (1, 3) or not w or not h:
                    return None
                comps = []
                for i in range(nc):
                    cid, sf, tq = seg[6 + 3 * i : 9 + 3 * i]
                    comps.append({"id": cid, "h": sf >> 4, "v": sf & 0x0F, "tq": tq})
                frame = (w, h, comps)
                progressive = marker == 0xC2
                if progressive:
                    if not all(
                        1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps
                    ):
                        return None
                    hmax = max(c["h"] for c in comps)
                    vmax = max(c["v"] for c in comps)
                    mcux = -(-w // (8 * hmax))
                    mcuy = -(-h // (8 * vmax))
                    coefs = [
                        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
                        for c in comps
                    ]
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
                return None  # extended/lossless/arithmetic frame types
            elif marker == 0xC4:  # DHT
                s = 0
                while s < len(seg):
                    tc, th = seg[s] >> 4, seg[s] & 0x0F
                    bits = list(seg[s + 1 : s + 17])
                    nv = sum(bits)
                    vals = seg[s + 17 : s + 17 + nv]
                    (huff_dc if tc == 0 else huff_ac)[th] = _huff_canonical(bits, vals)
                    s += 17 + nv
            elif marker == 0xE1:  # APP1: Exif orientation (display transform)
                orientation = _exif_orientation(bytes(seg))
            elif marker == 0xDD:  # DRI
                restart_interval = int.from_bytes(seg[0:2], "big")
            elif marker == 0xDA:  # SOS: entropy-coded data follows
                if frame is None:
                    return None
                ns = seg[0]
                scan = []
                for i in range(ns):
                    cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                    scan.append((cs, tables >> 4, tables & 0x0F))
                data_start = pos + ln
                if not progressive:
                    return _orient_result(
                        _jpeg_scan(
                            payload, data_start, frame, scan, qt, huff_dc,
                            huff_ac, restart_interval,
                        ),
                        orientation,
                    )
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
                pos = _jpeg_prog_scan(
                    payload, data_start, frame, coefs, scan, ss, se, ah, al,
                    huff_dc, huff_ac, restart_interval,
                )
                if pos is None:
                    return None
                continue
            pos += ln
        if not progressive or frame is None or coefs is None:
            return None
        return _orient_result(_jpeg_prog_reconstruct(frame, coefs, qt), orientation)
    except (ValueError, IndexError, KeyError):
        return None


def _orient_result(res, orientation: int):
    """Apply an Exif orientation to a decode result, swapping the
    reported dims for the transposing cases (5-8)."""
    if res is None or orientation == 1:
        return res
    arr, _w, _h, c = res
    arr = _apply_orientation(arr, orientation)
    return arr, arr.shape[1], arr.shape[0], c


def _entropy_segments(payload, pos):
    """Split an entropy-coded stream starting at ``pos``: stuffed
    0xFF00 collapses to 0xFF, RSTn markers split segments, any other
    marker ends the stream. Returns (segments, end_pos) with end_pos at
    the terminating marker's 0xFF."""
    segments = []
    cur = bytearray()
    while pos + 1 < len(payload):
        b0 = payload[pos]
        if b0 != 0xFF:
            cur.append(b0)
            pos += 1
            continue
        b1 = payload[pos + 1]
        if b1 == 0x00:
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= b1 <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # EOI or any other marker ends the scan
            break
    segments.append(bytes(cur))
    return segments, pos


def _jpeg_scan(payload, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    """Decode the (single, interleaved) scan: split the entropy stream on
    restart markers, Huffman-expand each MCU, assemble component planes,
    upsample and color-convert."""
    w, h, comps = frame
    if len(scan) != len(comps):
        return None
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    segments, _ = _entropy_segments(payload, pos)

    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    n_mcus = mcux * mcuy
    per_seg = restart_interval or n_mcus
    mcu = 0
    for seg_bytes in segments:
        if mcu >= n_mcus:
            break
        reader = _BitReader(seg_bytes)
        pred = [0] * len(comps)
        for _ in range(min(per_seg, n_mcus - mcu)):
            my, mx = divmod(mcu, mcux)
            for ci, c in enumerate(comps):
                sc = scan[ci]
                dct = huff_dc.get(sc[1])
                act = huff_ac.get(sc[2])
                quant = qt.get(c["tq"])
                if dct is None or act is None or quant is None:
                    return None
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        size = reader.huff(dct)
                        pred[ci] += _extend(reader.bits(size), size)
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.huff(act)
                            run, sz = rs >> 4, rs & 0x0F
                            if sz == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                return None
                            coef[k] = _extend(reader.bits(sz), sz)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coef * quant  # both zigzag-ordered
                        pix = _DCT_M.T @ block.reshape(8, 8) @ _DCT_M
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu += 1
    if mcu != n_mcus:
        return None
    return _jpeg_colorize(w, h, comps, planes)


def _jpeg_colorize(w, h, comps, planes):
    """Crop component planes to their true dims, upsample chroma, and
    apply the JFIF YCbCr→RGB transform (shared by the baseline and
    progressive paths)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for ci, c in enumerate(comps):
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        p = planes[ci][:ch, :cw] + 128.0
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2), w, h, 3
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    arr = np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
    return arr, w, h, 3


def _ac_first(reader, blk, act, ss, se, al, eobrun):
    """Progressive AC first pass for one block (T.81 G.1.2.2): run/size
    expansion into the spectral band with EOB-run accounting. ``blk`` is
    the block's 64-entry zigzag accumulator; returns the new EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.huff(act)
        run, sz = rs >> 4, rs & 0x0F
        if sz == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << run) - 1
            if run:
                eobrun += reader.bits(run)
            break
        k += run
        if k > se:
            raise ValueError("AC band overflow")
        blk[k] = _extend(reader.bits(sz), sz) << al
        k += 1
    return eobrun


def _ac_refine(reader, blk, act, ss, se, al, eobrun):
    """Progressive AC refinement for one block (T.81 G.1.2.3): place
    newly-nonzero ±2^Al coefficients and apply one correction bit to
    every history-nonzero coefficient the walk crosses — including the
    block tails consumed by an EOB run. Returns the new EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.huff(act)
            run, sz = rs >> 4, rs & 0x0F
            newval = 0
            if sz == 0:
                if run < 15:  # EOBn: band tail handled below
                    eobrun = 1 << run
                    if run:
                        eobrun += reader.bits(run)
                    break
                # ZRL: skip 16 zero-history positions with corrections
            else:
                if sz != 1:
                    raise ValueError("refine size must be 1")
                newval = p1 if reader.bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if reader.bit() and not (abs(int(blk[k])) & p1):
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if k <= se and newval:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                if reader.bit() and not (abs(int(blk[k])) & p1):
                    blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_prog_scan(
    payload, pos, frame, coefs, scan, ss, se, ah, al, huff_dc, huff_ac,
    restart_interval,
):
    """Decode one progressive scan into the per-component coefficient
    accumulators. Interleaved scans (ns > 1, DC only) walk the MCU grid;
    single-component scans walk that component's own ceil(dim/8) block
    raster per G.2. DC predictors and EOB runs reset at restart markers.
    Returns the stream position after the scan's entropy data, or None.
    """
    w, h, comps = frame
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    if any(cs not in by_id for cs, _, _ in scan):
        return None
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    interleaved = len(scan) > 1
    if ss == 0:
        if se != 0 or ah > 1:
            return None  # DC scan is exactly the 0 band
    else:
        if interleaved or se > 63 or ss > se:
            return None  # AC scans are single-component
    if interleaved:
        n_units = mcux * mcuy
    else:
        ci = by_id[scan[0][0]]
        c = comps[ci]
        cw = -(-w * c["h"] // hmax)
        chh = -(-h * c["v"] // vmax)
        bw = -(-cw // 8)
        bh = -(-chh // 8)
        n_units = bw * bh
    per_seg = restart_interval or n_units
    segments, end = _entropy_segments(payload, pos)
    unit = 0
    for seg_bytes in segments:
        if unit >= n_units:
            break
        reader = _BitReader(seg_bytes)
        pred = [0] * len(comps)
        eobrun = 0
        for _ in range(min(per_seg, n_units - unit)):
            if interleaved:  # DC scan over the MCU grid
                my, mx = divmod(unit, mcux)
                for cs, td, _ta in scan:
                    cj = by_id[cs]
                    cc = comps[cj]
                    for byy in range(cc["v"]):
                        for bxx in range(cc["h"]):
                            blk = coefs[cj][my * cc["v"] + byy, mx * cc["h"] + bxx]
                            if ah == 0:
                                table = huff_dc.get(td)
                                if table is None:
                                    return None
                                size = reader.huff(table)
                                pred[cj] += _extend(reader.bits(size), size)
                                blk[0] = pred[cj] << al
                            elif reader.bit():
                                blk[0] |= 1 << al
            else:
                byy, bxx = divmod(unit, bw)
                blk = coefs[ci][byy, bxx]
                cs, td, ta = scan[0]
                if ss == 0:  # non-interleaved DC scan
                    if ah == 0:
                        table = huff_dc.get(td)
                        if table is None:
                            return None
                        size = reader.huff(table)
                        pred[ci] += _extend(reader.bits(size), size)
                        blk[0] = pred[ci] << al
                    elif reader.bit():
                        blk[0] |= 1 << al
                else:
                    table = huff_ac.get(ta)
                    if table is None:
                        return None
                    if ah == 0:
                        eobrun = _ac_first(reader, blk, table, ss, se, al, eobrun)
                    else:
                        eobrun = _ac_refine(reader, blk, table, ss, se, al, eobrun)
            unit += 1
    if unit != n_units:
        return None
    return end


def _jpeg_prog_reconstruct(frame, coefs, qt):
    """Final progressive reconstruction: dequantize the accumulated
    zigzag coefficients, un-zigzag, IDCT every block (vectorized as two
    einsum matmuls over the whole block grid), then colorize."""
    w, h, comps = frame
    planes = []
    for ci, c in enumerate(comps):
        quant = qt.get(c["tq"])
        if quant is None:
            return None
        grid = coefs[ci].astype(np.float64) * quant.astype(np.float64)
        bh, bw, _ = grid.shape
        blocks = np.zeros((bh, bw, 64), dtype=np.float64)
        blocks[:, :, _ZIGZAG] = grid
        blocks = blocks.reshape(bh, bw, 8, 8)
        pix = np.einsum("ij,abjk,kl->abil", _DCT_M.T, blocks, _DCT_M)
        planes.append(pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return _jpeg_colorize(w, h, comps, planes)


class _BitWriter:
    """MSB-first bit writer with JPEG 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-pad


def _jpeg_blocks(plane: np.ndarray, quant: np.ndarray):
    """Level-shift, forward-DCT and quantize every 8×8 block of an
    edge-padded plane; yields zigzag coefficient vectors row-major."""
    h, w = plane.shape
    shifted = plane.astype(np.float64) - 128.0
    for y0 in range(0, h, 8):
        for x0 in range(0, w, 8):
            blk = _DCT_M @ shifted[y0 : y0 + 8, x0 : x0 + 8] @ _DCT_M.T
            # reshape(64) is row-major; zigzag stream position i carries
            # flat element _ZIGZAG[i]
            yield np.rint(blk.reshape(64) / quant).astype(np.int64)[_ZIGZAG]


def _coef_symbols(zz: np.ndarray):
    """Zigzag coefficients → (dc_size, dc_bits), [(rs, sz, bits), ...]
    per T.81 F.1.2 run-length coding. DC here is the raw value; the
    caller differences it."""
    out = []
    k = 1
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    while k <= last:
        v = int(zz[k])
        if v == 0:
            run += 1
            k += 1
            continue
        while run > 15:
            out.append((0xF0, 0, 0))
            run -= 16
        size = int(abs(v)).bit_length()
        bits = v if v >= 0 else v + (1 << size) - 1
        out.append(((run << 4) | size, size, bits))
        run = 0
        k += 1
    if last < 63:
        out.append((0x00, 0, 0))  # EOB
    return out


def _exif_app1(orientation: int, byte_order: str = "little") -> bytes:
    """Minimal APP1 Exif segment body: TIFF header + a one-entry IFD0
    carrying the orientation tag (0x0112, SHORT). Both byte orders
    supported so the reader's 'II'/'MM' handling stays honest."""
    bo = byte_order
    mark = b"II" if bo == "little" else b"MM"
    entry = (
        (0x0112).to_bytes(2, bo)
        + (3).to_bytes(2, bo)  # SHORT
        + (1).to_bytes(4, bo)
        + orientation.to_bytes(2, bo)
        + b"\x00\x00"
    )
    tiff = mark + (42).to_bytes(2, bo) + (8).to_bytes(4, bo)
    tiff += (1).to_bytes(2, bo) + entry + (0).to_bytes(4, bo)
    return b"Exif\x00\x00" + tiff


def encode_jpeg(
    arr: np.ndarray, subsample: bool = False, quant: int = 1,
    restart_interval: int = 0, gray: bool = False,
    exif_orientation: int = 0, exif_byte_order: str = "little",
) -> bytes:
    """Deterministic baseline JPEG writer (fixture twin of
    :func:`decode_jpeg`): JFIF YCbCr (or single-component grayscale with
    ``gray``), flat quantization table (``quant=1`` ⇒ near-lossless —
    uniform blocks round-trip exactly), optional 4:2:0 (``subsample``)
    via 2×2 chroma mean, optional restart markers. Huffman tables are
    built from the symbols actually emitted (single shared DC + AC
    table, all codes at one canonical length), so coverage is guaranteed
    without the Annex K tables; the decoder reads whatever DHT says, as
    with any other encoder. ``subsample`` accepts False (4:4:4), True or
    ``"420"`` (4:2:0), and ``"422"`` (horizontal-only)."""
    h, w, _ = arr.shape
    if gray:
        shf = svf = 1
    elif subsample == "422":
        shf, svf = 2, 1
    elif subsample:
        shf = svf = 2
    else:
        shf = svf = 1
    mw, mh = 8 * shf, 8 * svf
    pw, ph = -(-w // mw) * mw, -(-h // mh) * mh
    a = arr.astype(np.float64)
    pad = np.pad(a, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    r, g, b = pad[:, :, 0], pad[:, :, 1], pad[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    qtab = np.full(64, max(1, min(255, quant)), dtype=np.int64)
    mcux, mcuy = pw // mw, ph // mh
    y_blocks = list(_jpeg_blocks(y, qtab))
    if not gray:
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if shf > 1 or svf > 1:
            cb = cb.reshape(ph // svf, svf, pw // shf, shf).mean(axis=(1, 3))
            cr = cr.reshape(ph // svf, svf, pw // shf, shf).mean(axis=(1, 3))
        cb_blocks = list(_jpeg_blocks(cb, qtab))
        cr_blocks = list(_jpeg_blocks(cr, qtab))
    ybx = pw // 8

    # Interleaved MCU stream of zigzag blocks: Y (shf×svf blocks), Cb, Cr.
    def mcu_stream():
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            units = []
            for by in range(svf):
                for bx in range(shf):
                    units.append((0, y_blocks[(my * svf + by) * ybx + mx * shf + bx]))
            if not gray:
                units.append((1, cb_blocks[my * mcux + mx]))
                units.append((2, cr_blocks[my * mcux + mx]))
            yield units

    # Pass 1: symbol census for the canonical fixed-length tables.
    dc_syms: set[int] = set()
    ac_syms: set[int] = set()
    pred = [0, 0, 0]
    mcu_units = list(mcu_stream())
    coded = []  # per MCU: list of (dc_size, dc_bits, ac_list)
    n_mcus = len(mcu_units)
    per_seg = restart_interval or n_mcus
    for m, units in enumerate(mcu_units):
        if m % per_seg == 0:
            pred = [0, 0, 0]
        cu = []
        for ci, zz in units:
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            size = abs(diff).bit_length()
            bits = diff if diff >= 0 else diff + (1 << size) - 1
            ac = _coef_symbols(zz)
            dc_syms.add(size)
            ac_syms.update(s for s, _, _ in ac)
            cu.append((size, bits, ac))
        coded.append(cu)

    def fixed_table(syms: set[int], length: int):
        vals = sorted(syms)
        if len(vals) >= (1 << length):
            raise ValueError("symbol set too large for fixed-length table")
        bits = [0] * 16
        bits[length - 1] = len(vals)
        codes = {v: (length, i) for i, v in enumerate(vals)}
        return bits, bytes(vals), codes

    dc_bits, dc_vals, dc_codes = fixed_table(dc_syms, 6)
    ac_bits, ac_vals, ac_codes = fixed_table(ac_syms, 9)

    wtr = _BitWriter()
    body = bytearray()
    for m, cu in enumerate(coded):
        if m and m % per_seg == 0:
            wtr.flush()
            body += wtr.out
            body += b"\xff" + bytes([0xD0 + ((m // per_seg - 1) % 8)])
            wtr = _BitWriter()
        for size, bits, ac in cu:
            ln, code = dc_codes[size]
            wtr.write(code, ln)
            if size:
                wtr.write(bits, size)
            for sym, sz, vb in ac:
                ln, code = ac_codes[sym]
                wtr.write(code, ln)
                if sz:
                    wtr.write(vb, sz)
    wtr.flush()
    body += wtr.out

    def seg(marker: int, data: bytes) -> bytes:
        return b"\xff" + bytes([marker]) + (len(data) + 2).to_bytes(2, "big") + data

    out = b"\xff\xd8"
    if exif_orientation:
        out += seg(0xE1, _exif_app1(exif_orientation, exif_byte_order))
    out += seg(0xDB, bytes([0]) + qtab.astype(np.uint8).tobytes())
    nc = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    sof += bytes([1, (shf << 4) | svf, 0])
    if not gray:
        sof += bytes([2, 0x11, 0, 3, 0x11, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([nc, 1, 0x00]) + (b"" if gray else bytes([2, 0x00, 3, 0x00]))
    out += seg(0xDA, sos + bytes([0, 63, 0]))
    out += bytes(body) + b"\xff\xd9"
    return out


def _fixed_huff(syms, length: int):
    """Canonical fixed-length Huffman table over a symbol census (same
    construction as the baseline encoder's): all codes at one length,
    values sorted — the decoder reads whatever DHT says."""
    vals = sorted(syms) or [0]
    if len(vals) >= (1 << length):
        raise ValueError("symbol set too large for fixed-length table")
    bits = [0] * 16
    bits[length - 1] = len(vals)
    codes = {v: (length, i) for i, v in enumerate(vals)}
    return bits, bytes(vals), codes


def _prog_ac_first_tokens(blocks, ss, se, al):
    """Token stream for a progressive AC first scan (one component,
    band ss..se, point transform Al): run/size symbols with EOB runs
    spanning empty block tails, exactly the stream :func:`_ac_first`
    inverts."""
    tokens = []
    eob = 0

    def flush():
        nonlocal eob
        while eob:
            run = min(eob, 32767)
            r = run.bit_length() - 1
            tokens.append(("sym", r << 4))
            if r:
                tokens.append(("bits", run - (1 << r), r))
            eob -= run

    for zz in blocks:
        band = [
            (1 if int(x) > 0 else -1) * (abs(int(x)) >> al)
            for x in zz[ss : se + 1]
        ]
        nz = [i for i, x in enumerate(band) if x]
        if not nz:
            eob += 1
            continue
        flush()
        run = 0
        for i in range(nz[-1] + 1):
            x = band[i]
            if x == 0:
                run += 1
                continue
            while run > 15:
                tokens.append(("sym", 0xF0))
                run -= 16
            size = abs(x).bit_length()
            vb = x if x >= 0 else x + (1 << size) - 1
            tokens.append(("sym", (run << 4) | size))
            tokens.append(("bits", vb, size))
            run = 0
        if nz[-1] < se - ss:
            eob += 1
    flush()
    return tokens


def _prog_ac_refine_tokens(blocks, ss, se, al):
    """Token stream for a progressive AC refinement scan: newly-nonzero
    ±2^Al placements with interleaved correction bits for every
    history-nonzero coefficient the decoder's walk crosses, EOB runs
    carrying the queued tail corrections — the stream
    :func:`_ac_refine` inverts."""
    p1 = 1 << al
    tokens = []
    eob_blocks: list[list[int]] = []  # per-run-block correction bits

    def flush():
        nonlocal eob_blocks
        if not eob_blocks:
            return
        run = len(eob_blocks)
        r = run.bit_length() - 1
        tokens.append(("sym", r << 4))
        if r:
            tokens.append(("bits", run - (1 << r), r))
        for corr in eob_blocks:
            for b in corr:
                tokens.append(("bits", b, 1))
        eob_blocks = []

    for zz in blocks:
        v = [int(x) for x in zz]
        mag = [abs(x) >> al for x in v]
        hist = [m >= 2 for m in mag]  # nonzero after earlier scans
        newly = [k for k in range(ss, se + 1) if mag[k] == 1]
        if not newly:
            eob_blocks.append(
                [mag[k] & 1 for k in range(ss, se + 1) if hist[k]]
            )
            if len(eob_blocks) == 32767:
                flush()
            continue
        flush()
        run = 0
        pend: list[int] = []
        for k in range(ss, newly[-1] + 1):
            if hist[k]:
                pend.append(mag[k] & 1)
            elif mag[k] == 1:
                tokens.append(("sym", (run << 4) | 1))
                tokens.append(("bits", 1 if v[k] > 0 else 0, 1))
                tokens.extend(("bits", b, 1) for b in pend)
                pend = []
                run = 0
            else:
                run += 1
                if run == 16:
                    tokens.append(("sym", 0xF0))
                    tokens.extend(("bits", b, 1) for b in pend)
                    pend = []
                    run = 0
        if newly[-1] < se:
            eob_blocks.append(
                [mag[k] & 1 for k in range(newly[-1] + 1, se + 1) if hist[k]]
            )
    flush()
    return tokens


def encode_jpeg_progressive(
    arr: np.ndarray, gray: bool = False, quant: int = 1,
    successive: bool = True, bands=((1, 5), (6, 63)),
) -> bytes:
    """Deterministic progressive JPEG writer (fixture twin of the SOF2
    path in :func:`decode_jpeg`): 4:4:4 (or grayscale), spectral
    selection into ``bands``, and — with ``successive`` — one level of
    successive approximation (DC first at Al=1 + bit refine; AC first
    at Al=1 + correction refine), so every Annex G decode path is
    exercised. At ``quant=1`` the refined coefficients equal the
    baseline encoder's exactly, making progressive-vs-baseline decode
    equality a bit-exact differential test."""
    h, w, _ = arr.shape
    pw, ph = -(-w // 8) * 8, -(-h // 8) * 8
    a = arr.astype(np.float64)
    pad = np.pad(a, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    r, g, b = pad[:, :, 0], pad[:, :, 1], pad[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    qtab = np.full(64, max(1, min(255, quant)), dtype=np.int64)
    comp_blocks = [list(_jpeg_blocks(y, qtab))]
    if not gray:
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        comp_blocks.append(list(_jpeg_blocks(cb, qtab)))
        comp_blocks.append(list(_jpeg_blocks(cr, qtab)))
    nc = len(comp_blocks)
    n_blocks = (pw // 8) * (ph // 8)
    al1 = 1 if successive else 0

    def seg(marker: int, data: bytes) -> bytes:
        return b"\xff" + bytes([marker]) + (len(data) + 2).to_bytes(2, "big") + data

    def write_tokens(tokens, codes) -> bytes:
        wtr = _BitWriter()
        for kind, *payload_ in tokens:
            if kind == "sym":
                ln, code = codes[payload_[0]]
                wtr.write(code, ln)
            else:
                vb, n = payload_
                if n:
                    wtr.write(vb, n)
        wtr.flush()
        return bytes(wtr.out)

    def sos(scan_comps, ss, se, ah, al) -> bytes:
        body = bytes([len(scan_comps)])
        for cid in scan_comps:
            body += bytes([cid, 0x00])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + qtab.astype(np.uint8).tobytes())
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += seg(0xC2, sof)

    # DC first scan: interleaved diffs of the Al-shifted DC values.
    tokens = []
    pred = [0] * nc
    for m in range(n_blocks):
        for ci in range(nc):
            d = int(comp_blocks[ci][m][0]) >> al1
            diff = d - pred[ci]
            pred[ci] = d
            size = abs(diff).bit_length()
            vb = diff if diff >= 0 else diff + (1 << size) - 1
            tokens.append(("sym", size))
            tokens.append(("bits", vb, size))
    dc_bits, dc_vals, dc_codes = _fixed_huff(
        {t[1] for t in tokens if t[0] == "sym"}, 6
    )
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
    out += sos(list(range(1, nc + 1)), 0, 0, 0, al1)
    out += write_tokens(tokens, dc_codes)

    # AC first scans: one per component per spectral band.
    for ci in range(nc):
        for ss, se in bands:
            tokens = _prog_ac_first_tokens(comp_blocks[ci], ss, se, al1)
            ac_bits, ac_vals, ac_codes = _fixed_huff(
                {t[1] for t in tokens if t[0] == "sym"}, 9
            )
            out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)
            out += sos([ci + 1], ss, se, 0, al1)
            out += write_tokens(tokens, ac_codes)

    if successive:
        # DC refinement: one raw bit per block, no Huffman coding.
        wtr = _BitWriter()
        for m in range(n_blocks):
            for ci in range(nc):
                wtr.write(int(comp_blocks[ci][m][0]) & 1, 1)
        wtr.flush()
        out += sos(list(range(1, nc + 1)), 0, 0, 1, 0)
        out += bytes(wtr.out)
        # AC refinement scans.
        for ci in range(nc):
            for ss, se in bands:
                tokens = _prog_ac_refine_tokens(comp_blocks[ci], ss, se, 0)
                ac_bits, ac_vals, ac_codes = _fixed_huff(
                    {t[1] for t in tokens if t[0] == "sym"}, 9
                )
                out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)
                out += sos([ci + 1], ss, se, 1, 0)
                out += write_tokens(tokens, ac_codes)

    return out + b"\xff\xd9"


def _decode_uncompressed(payload: bytes):
    """The real in-container codec tier: BMP, netpbm, PNG, GIF, JPEG."""
    return (
        decode_bmp(payload)
        or decode_ppm(payload)
        or decode_png(payload)
        or decode_gif(payload)
        or decode_jpeg(payload)
    )


def fake_decode_u8(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    """Deterministic fake decode: md5-derived dimensions, byte-tiled pixels.

    Stands in for the codec so every downstream stage (blank detection,
    adaptive zoom, frame sampling) runs real numpy on real shapes.
    """
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    channels = 3
    n = width * height * channels
    reps = -(-n // max(len(payload), 1))
    arr = np.frombuffer((payload * reps)[:n], dtype=np.uint8).reshape(height, width, channels)
    return arr, width, height, channels


def decode_image_stats(df: DataFrame, media_col: str = "media", id_col: str = "doc_id") -> DataFrame:
    """binary media → typed metadata row, fused decode+analyze mapInPandas.

    Runs blank detection (reference gradient kernel) and the adaptive-zoom
    render guard (reference ``core/pdf_processor.py:796-836``) on the
    decoded array. NULL media → quarantined row (width NULL), never a crash.
    """
    pruned = ensure_parallelism(df.select(id_col, media_col))

    def op(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                # NULL and zero-length media are both quarantined (an empty
                # blob is undecodable, not a 0×0 image) — never a task crash
                if payload is None or len(payload) == 0:
                    out.append(
                        {
                            "doc_id": doc_id,
                            "n_bytes": 0,
                            "width": None,
                            "height": None,
                            "channels": None,
                            "is_blank": None,
                            "render_zoom": None,
                            "content_md5": hashlib.md5(b"").hexdigest(),
                        }
                    )
                    continue
                payload = bytes(payload)
                real = _try_real_decode(payload) or _decode_uncompressed(payload)
                arr, w, h, c = real if real is not None else fake_decode_u8(payload)
                out.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(payload),
                        "width": w,
                        "height": h,
                        "channels": c,
                        "is_blank": bool(is_blank_image(arr)),
                        "render_zoom": adaptive_zoom(w, h, 300 / 72.0),
                        "content_md5": hashlib.md5(payload).hexdigest(),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return pruned.mapInPandas(op, MEDIA_META_SCHEMA)


def sample_frames(
    df: DataFrame, every_n: int = 4, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """Container-agnostic frame sampling plumbing: split the payload
    into fixed 4KiB 'frames', keep every ``every_n``-th, emit one row
    per kept frame.

    The REAL container demuxer this byte-slicer stands in for exists as
    :func:`video.sample_video_frames` (MJPEG-in-AVI, decoded pixels);
    this variant stays for media whose container format is unknown —
    the fan-out shape (1 row → m rows inside mapInPandas) is identical.
    """
    pruned = ensure_parallelism(df.select(id_col, media_col))

    def op(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                if payload is None:
                    continue
                payload = bytes(payload)
                n_frames = max(1, len(payload) // 4096)
                for idx in range(0, n_frames, every_n):
                    chunk = payload[idx * 4096 : (idx + 1) * 4096]
                    out.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "frame_md5": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return pruned.mapInPandas(op, FRAME_SCHEMA)
