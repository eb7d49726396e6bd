"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side contract (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. The codec layer is three-tier:
PIL when importable (compressed formats — not in this container), a
REAL pure-numpy decoder for uncompressed BMP (24-bit) and PPM/PGM
payloads (``decode_bmp``/``decode_ppm`` — spec-faithful, round-trip
tested), and a deterministic fake for anything else so every downstream
stage still runs real numpy on real shapes. Only the compressed-format
tier remains an environment-bound seam.

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
    "decode_image_stats",
    "sample_frames",
    "fake_decode_u8",
    "decode_bmp",
    "decode_ppm",
    "encode_bmp",
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


def _decode_uncompressed(payload: bytes):
    """The real in-container codec tier: BMP then netpbm."""
    return decode_bmp(payload) or decode_ppm(payload)


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
    """Video-style frame sampling plumbing: split the payload into fixed
    4KiB 'frames', keep every ``every_n``-th, emit one row per kept frame.

    Real implementation swaps the byte-slicer for a container demuxer; the
    fan-out shape (1 row → m rows inside mapInPandas) is the part Spark
    cares about and is real here.
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
