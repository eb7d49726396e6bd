"""Video columns: MJPEG-in-AVI as an opaque ``binary`` column with a
real per-frame demux — the video tier that closes the loop between
``sample_frames`` (byte-slicer plumbing) and the real image codecs.

The demuxer is a spec-faithful RIFF/AVI walker: word-aligned chunk
iteration, ``LIST`` recursion (``hdrl`` → ``avih``/``strl`` →
``strh``/``strf``, ``movi`` → ``00dc``/``00db`` frame chunks, nested
``rec `` groups), fps recovered from the stream header's rate/scale
pair. Each frame payload is decoded by the in-container baseline-JPEG
decoder (``multimodal.decode_jpeg``) so the per-frame stats are
computed from REAL pixels, not header echoes — a lying ``strf`` width
cannot fool the output. Non-MJPEG or undecodable frames are counted
and skipped; non-AVI payloads produce one quarantined row (NULL
frame_idx), never a task crash.

Spark shape: demux + per-frame analyze fused into ONE ``mapInPandas``
stage with a 1-row→n-frames fan-out — the same zero-exchange scan
shape as ``decode_image_stats``, so frame extraction over a 100 TB
media column is embarrassingly parallel.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from intelligent_ocr_spark.functions.image_kernels import is_blank_image
from intelligent_ocr_spark.operators.audio import decode_fmt_data
from intelligent_ocr_spark.operators.multimodal import decode_jpeg, encode_jpeg
from intelligent_ocr_spark.util import ensure_parallelism

__all__ = [
    "VIDEO_FRAME_SCHEMA",
    "AV_STATS_SCHEMA",
    "decode_avi",
    "encode_avi_mjpeg",
    "sample_video_frames",
    "decode_av_stats",
]

AV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("fps", T.DoubleType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("v_duration_s", T.DoubleType(), True),
        T.StructField("a_rate", T.IntegerType(), True),
        T.StructField("a_channels", T.IntegerType(), True),
        T.StructField("a_frames", T.LongType(), True),
        T.StructField("a_duration_s", T.DoubleType(), True),
        T.StructField("a_rms", T.DoubleType(), True),
        T.StructField("a_peak", T.DoubleType(), True),
    ]
)

VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("fps", T.DoubleType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("is_blank", T.BooleanType(), True),
        T.StructField("frame_md5", T.StringType(), True),
    ]
)


def _riff_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) with RIFF word alignment."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body_start = pos + 8
        body_end = body_start + size
        if body_end > end:
            return  # truncated chunk: stop at the last whole one
        yield cid, body_start, body_end
        pos = body_end + (size & 1)


def _collect_chunks(buf: bytes, pos: int, end: int, out: list) -> None:
    """Recurse through a ``movi`` body collecting ``##dc``/``##db``
    video and ``##wb`` audio payloads in stream order (``rec `` LISTs
    group interleaved records on disk; chunks inside keep their
    order)."""
    for cid, s, e in _riff_chunks(buf, pos, end):
        if cid == b"LIST" and buf[s : s + 4] == b"rec ":
            _collect_chunks(buf, s + 4, e, out)
        elif len(cid) == 4 and cid[2:4] in (b"dc", b"db", b"wb"):
            out.append((bytes(cid), buf[s:e]))


def decode_avi(payload: bytes):
    """RIFF/AVI MJPEG → (frames, meta) or ``None`` for non-AVI bytes.

    ``frames`` is a list of decoded RGB uint8 arrays (undecodable frame
    chunks are skipped and counted in ``meta["n_undecodable"]``).
    ``meta`` carries the container's declared width/height/total frames
    (``avih``), the stream fps (``strh`` rate/scale, falling back to
    ``avih`` µs-per-frame), and the raw frame-chunk count.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    meta = {
        "width": None,
        "height": None,
        "n_frames_declared": None,
        "fps": None,
        "n_chunks": 0,
        "n_undecodable": 0,
        "audio": None,
    }
    raw_chunks: list[tuple[bytes, bytes]] = []
    us_per_frame = None
    audio_fmt = None
    audio_stream = None
    stream_no = -1
    for cid, s, e in _riff_chunks(payload, 12, len(payload)):
        if cid != b"LIST":
            continue
        sub = payload[s : s + 4]
        if sub == b"hdrl":
            for c2, s2, e2 in _riff_chunks(payload, s + 4, e):
                if c2 == b"avih" and e2 - s2 >= 40:
                    us_per_frame = int.from_bytes(payload[s2 : s2 + 4], "little")
                    meta["n_frames_declared"] = int.from_bytes(
                        payload[s2 + 16 : s2 + 20], "little"
                    )
                    meta["width"] = int.from_bytes(payload[s2 + 32 : s2 + 36], "little")
                    meta["height"] = int.from_bytes(
                        payload[s2 + 36 : s2 + 40], "little"
                    )
                elif c2 == b"LIST" and payload[s2 : s2 + 4] == b"strl":
                    stream_no += 1
                    strh_type = None
                    for c3, s3, e3 in _riff_chunks(payload, s2 + 4, e2):
                        if c3 == b"strh" and e3 - s3 >= 32:
                            strh_type = payload[s3 : s3 + 4]
                            if strh_type == b"vids":
                                scale = int.from_bytes(
                                    payload[s3 + 20 : s3 + 24], "little"
                                )
                                rate = int.from_bytes(
                                    payload[s3 + 24 : s3 + 28], "little"
                                )
                                if scale > 0 and rate > 0:
                                    meta["fps"] = rate / scale
                        elif c3 == b"strf" and strh_type == b"auds":
                            audio_fmt = payload[s3:e3]
                            audio_stream = b"%02d" % stream_no
        elif sub == b"movi":
            _collect_chunks(payload, s + 4, e, raw_chunks)
    if meta["fps"] is None and us_per_frame:
        meta["fps"] = 1e6 / us_per_frame
    frames = []
    audio_data = bytearray()
    for cid, raw in raw_chunks:
        if cid[2:4] == b"wb":
            if audio_stream is None or cid[:2] == audio_stream:
                audio_data += raw
            continue
        meta["n_chunks"] += 1
        decoded = decode_jpeg(raw)
        if decoded is None:
            meta["n_undecodable"] += 1
        else:
            frames.append(decoded[0])
    if audio_fmt is not None and audio_data:
        meta["audio"] = decode_fmt_data(bytes(audio_fmt), bytes(audio_data))
    return frames, meta


def encode_avi_mjpeg(frames, fps: int = 30, quality_subsample=False, audio=None) -> bytes:
    """Deterministic MJPEG-in-AVI writer (fixture twin of
    :func:`decode_avi`): one ``vids``/``MJPG`` stream, each frame an
    ``encode_jpeg`` payload in its own ``00dc`` chunk, plus an ``idx1``
    keyframe index. ``audio=(samples, rate)`` (float64 (n, ch) in
    [-1, 1]) adds a second ``auds`` PCM16 stream: a WAVEFORMAT ``strf``
    and the sample bytes in a ``01wb`` chunk. Assembled little-endian
    field by field from the MainAVIHeader / AVIStreamHeader /
    BITMAPINFOHEADER layouts, independently of the reader's offsets."""

    def u32(v: int) -> bytes:
        return int(v).to_bytes(4, "little")

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + u32(len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    jpegs = [
        encode_jpeg(np.asarray(f, dtype=np.uint8), subsample=quality_subsample)
        for f in frames
    ]
    h0, w0 = (frames[0].shape[0], frames[0].shape[1]) if frames else (0, 0)
    max_buf = max((len(j) for j in jpegs), default=0)

    avih = (
        u32(1_000_000 // fps)  # dwMicroSecPerFrame
        + u32(max_buf * fps)  # dwMaxBytesPerSec
        + u32(0)  # dwPaddingGranularity
        + u32(0x10)  # dwFlags: AVIF_HASINDEX
        + u32(len(jpegs))  # dwTotalFrames
        + u32(0)  # dwInitialFrames
        + u32(2 if audio is not None else 1)  # dwStreams
        + u32(max_buf)  # dwSuggestedBufferSize
        + u32(w0)
        + u32(h0)
        + u32(0) * 4  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + u32(0)  # dwFlags
        + (0).to_bytes(2, "little")  # wPriority
        + (0).to_bytes(2, "little")  # wLanguage
        + u32(0)  # dwInitialFrames
        + u32(1)  # dwScale
        + u32(fps)  # dwRate
        + u32(0)  # dwStart
        + u32(len(jpegs))  # dwLength
        + u32(max_buf)  # dwSuggestedBufferSize
        + u32(0xFFFFFFFF)  # dwQuality (default)
        + u32(0)  # dwSampleSize
        + (0).to_bytes(2, "little") * 2  # rcFrame left/top
        + w0.to_bytes(2, "little")
        + h0.to_bytes(2, "little")
    )
    strf = (
        u32(40)  # biSize
        + u32(w0)
        + u32(h0)
        + (1).to_bytes(2, "little")  # biPlanes
        + (24).to_bytes(2, "little")  # biBitCount
        + b"MJPG"  # biCompression
        + u32(w0 * h0 * 3)  # biSizeImage
        + u32(0) * 4  # ppm/clr fields
    )
    strl = chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl_body = b"hdrl" + chunk(b"avih", avih) + strl
    pcm = b""
    if audio is not None:
        samples, a_rate = audio
        samples = np.asarray(samples, dtype=np.float64)
        if samples.ndim == 1:
            samples = samples[:, None]
        a_ch = samples.shape[1]
        pcm = (
            np.clip(samples.reshape(-1) * 32768.0, -32768, 32767)
            .astype("<i2")
            .tobytes()
        )
        block = a_ch * 2
        a_strh = (
            b"auds"
            + b"\x00\x00\x00\x00"  # fccHandler: PCM
            + u32(0)
            + (0).to_bytes(2, "little") * 2
            + u32(0)
            + u32(1)  # dwScale
            + u32(a_rate)  # dwRate
            + u32(0)
            + u32(samples.shape[0])  # dwLength (frames)
            + u32(len(pcm))
            + u32(0xFFFFFFFF)
            + u32(block)  # dwSampleSize
            + (0).to_bytes(2, "little") * 4
        )
        a_strf = (
            (1).to_bytes(2, "little")  # WAVE_FORMAT_PCM
            + a_ch.to_bytes(2, "little")
            + u32(a_rate)
            + u32(a_rate * block)
            + block.to_bytes(2, "little")
            + (16).to_bytes(2, "little")
        )
        hdrl_body += chunk(
            b"LIST", b"strl" + chunk(b"strh", a_strh) + chunk(b"strf", a_strf)
        )
    hdrl = chunk(b"LIST", hdrl_body)

    movi_body = bytearray(b"movi")
    offsets = []
    for j in jpegs:
        offsets.append(len(movi_body))  # offset of the '00dc' fourcc
        movi_body += chunk(b"00dc", j)
    if pcm:
        movi_body += chunk(b"01wb", pcm)
    movi = chunk(b"LIST", bytes(movi_body))

    idx1 = bytearray()
    for off, j in zip(offsets, jpegs):
        idx1 += b"00dc" + u32(0x10) + u32(off) + u32(len(j))  # AVIIF_KEYFRAME
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx1))
    return b"RIFF" + u32(len(body)) + body


def sample_video_frames(
    df: DataFrame, every_n: int = 2, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """binary AVI → one row per kept frame (every ``every_n``-th), with
    per-frame stats computed from the DECODED pixels: width/height from
    the JPEG frame itself, blankness from the gradient kernel, md5 over
    the RGB bytes. Non-AVI / undecodable media → one quarantined row
    (frame_idx NULL) so drops stay visible downstream.
    """
    pruned = ensure_parallelism(df.select(id_col, media_col))
    cols = [f.name for f in VIDEO_FRAME_SCHEMA.fields]

    def op(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                decoded = (
                    decode_avi(bytes(payload)) if payload is not None else None
                )
                if decoded is None or not decoded[0]:
                    out.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": None,
                            "n_frames": None,
                            "fps": None,
                            "width": None,
                            "height": None,
                            "is_blank": None,
                            "frame_md5": None,
                        }
                    )
                    continue
                frames, meta = decoded
                for idx in range(0, len(frames), every_n):
                    arr = frames[idx]
                    out.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "n_frames": len(frames),
                            "fps": meta["fps"],
                            "width": arr.shape[1],
                            "height": arr.shape[0],
                            "is_blank": bool(is_blank_image(arr)),
                            "frame_md5": hashlib.md5(
                                np.ascontiguousarray(arr).tobytes()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    return pruned.mapInPandas(op, VIDEO_FRAME_SCHEMA)


def decode_av_stats(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """binary AVI → one joint audio/video stats row per doc: decoded
    frame count / dims / fps plus the ``auds`` stream's rate, channels,
    frame count, duration and exact RMS/peak — the container-level gate
    a multimodal training pipeline applies before expensive per-frame
    work (drop silent clips, broken streams, A/V duration mismatches).
    Non-AVI media → quarantined row (n_frames NULL); an AVI with no
    audio stream reports audio columns as NULL, not zero.

    Spark shape: the same zero-exchange Scan→MapInPandas stage as every
    other media tier."""
    import numpy as np  # noqa: F811 (local for the worker closure)

    pruned = ensure_parallelism(df.select(id_col, media_col))
    cols = [f.name for f in AV_STATS_SCHEMA.fields]

    def op(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                row = {c: None for c in cols}
                row["doc_id"] = doc_id
                decoded = (
                    decode_avi(bytes(payload)) if payload is not None else None
                )
                if decoded is not None:
                    frames, meta = decoded
                    row["n_frames"] = len(frames)
                    row["fps"] = meta["fps"]
                    if frames:
                        row["width"] = frames[0].shape[1]
                        row["height"] = frames[0].shape[0]
                    if meta["fps"]:
                        row["v_duration_s"] = len(frames) / meta["fps"]
                    if meta["audio"] is not None:
                        samples, a_rate, a_ch, _bits = meta["audio"]
                        row["a_rate"] = a_rate
                        row["a_channels"] = a_ch
                        row["a_frames"] = samples.shape[0]
                        row["a_duration_s"] = samples.shape[0] / a_rate
                        row["a_rms"] = float(
                            np.sqrt(np.mean(samples * samples))
                        ) if samples.size else 0.0
                        row["a_peak"] = (
                            float(np.max(np.abs(samples))) if samples.size else 0.0
                        )
                out.append(row)
            yield pd.DataFrame(out, columns=cols)

    return pruned.mapInPandas(op, AV_STATS_SCHEMA)
