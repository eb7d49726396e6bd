"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side contract (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec calls are STUBBED because
this container ships no image/audio libraries — each stub is a clearly
marked seam (`NotImplementedError` or a deterministic fake) where
PIL/ffmpeg/torchcodec drops in on a real cluster.

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
                real = _try_real_decode(payload)
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
