"""Perceptual image hashing + banded near-dup pairs — the IMAGE twin of
SimHash text dedup (LAION-style image dedup for multimodal training
corpora).

Two public hashes over decoded pixels:

* **dHash** (difference hash): nearest-neighbor sample of the integer
  channel-sum plane to a 9×8 grid, bit = right neighbor strictly
  brighter. Exactly invariant under uniform brightness offset (every
  grid value shifts by the same integer, strict comparisons keep their
  outcome — the oracle query leans on this provable invariance).
* **pHash** (DCT hash): 32×32 grid → orthonormal 2-D DCT → the 8×8
  low-frequency block EXCLUDING DC, bit = coefficient above the block
  median. A constant offset moves only the DC coefficient, so pHash is
  offset-invariant too — by construction, not by luck.

Near-dup pairs reuse the SimHash LSH plan shape wholesale: the 64-bit
hash splits into four 16-bit chunks that double as bands; by pigeonhole
any pair within Hamming distance 3 shares a band, so recall is exact at
the default threshold and the join is band-blocked — NEVER all-pairs.
Exact distance is verified JVM-side with ``bit_count(xor)`` per chunk.

Spark shape: decode+hash is the standard zero-exchange mapInPandas
media stage; the pair join adds one band exchange — identical plan
economics to ``dedup.simhash_near_dups`` at any scale.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from intelligent_ocr_spark.operators.multimodal import (
    _decode_uncompressed,
    _try_real_decode,
    fake_decode_u8,
)
from intelligent_ocr_spark.util import ensure_parallelism

__all__ = [
    "IMAGE_HASH_SCHEMA",
    "VIDEO_HASH_SCHEMA",
    "dhash64",
    "phash64",
    "image_hashes",
    "image_near_dups",
    "video_frame_hashes",
    "video_near_dups",
]

IMAGE_HASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("c0", T.LongType(), True),
        T.StructField("c1", T.LongType(), True),
        T.StructField("c2", T.LongType(), True),
        T.StructField("c3", T.LongType(), True),
        T.StructField("phex", T.StringType(), True),
    ]
)


def _gray_grid(arr: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Integer channel-sum plane sampled to (rows, cols) by
    deterministic nearest-neighbor indexing — exact under uniform
    offsets (a +c per channel shifts every grid cell by exactly 3c)."""
    gray = arr.astype(np.int64).sum(axis=2)
    h, w = gray.shape
    ys = (np.arange(rows) * h) // rows
    xs = (np.arange(cols) * w) // cols
    return gray[ys][:, xs]


def dhash64(arr: np.ndarray) -> int:
    """64-bit difference hash: 8 rows × 8 adjacent-column comparisons
    over a 9-column grid, row-major, bit set when the right neighbor is
    strictly brighter."""
    g = _gray_grid(arr, 8, 9)
    bits = (g[:, 1:] > g[:, :-1]).reshape(64)
    v = 0
    for i in range(64):
        if bits[i]:
            v |= 1 << i
    return v


def _dct_basis(n: int) -> np.ndarray:
    x = np.arange(n)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT32 = _dct_basis(32)


def phash64(arr: np.ndarray) -> int:
    """64-bit DCT hash: 32×32 grid → 2-D DCT → 8×8 low-frequency block
    minus the DC term (63 coefficients), bit set above the median. Bit
    63 is always 0 (the dropped DC slot)."""
    g = _gray_grid(arr, 32, 32).astype(np.float64)
    coef = (_DCT32 @ g @ _DCT32.T)[:8, :8].reshape(64)[1:]
    # snap float-dust coefficients (uint8-scale input leaves ~1e-13
    # residue on analytically-zero terms) so flat regions hash stably
    coef[np.abs(coef) < 1e-6] = 0.0
    med = np.median(coef)
    v = 0
    for i in range(63):
        if coef[i] > med:
            v |= 1 << i
    return v


def image_hashes(
    df: DataFrame,
    method: str = "dhash",
    media_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """binary media → 64-bit perceptual hash as four 16-bit chunk
    columns ``c0..c3`` (the LSH bands — same signed-safe representation
    as ``dedup.simhash64``) plus the packed hex string. Undecodable
    media hashes the deterministic fake (same degrade rule as
    ``decode_image_stats``); NULL media → NULL hash row."""
    fn = {"dhash": dhash64, "phash": phash64}[method]
    pruned = ensure_parallelism(df.select(id_col, media_col))
    cols = [f.name for f in IMAGE_HASH_SCHEMA.fields]

    def op(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                if payload is None or len(payload) == 0:
                    out.append(dict.fromkeys(cols) | {"doc_id": doc_id})
                    continue
                payload = bytes(payload)
                real = _try_real_decode(payload) or _decode_uncompressed(payload)
                arr = (real if real is not None else fake_decode_u8(payload))[0]
                v = fn(arr)
                out.append(
                    {
                        "doc_id": doc_id,
                        **{f"c{k}": (v >> (16 * k)) & 0xFFFF for k in range(4)},
                        "phex": f"{v:016x}",
                    }
                )
            yield pd.DataFrame(out, columns=cols)

    return pruned.mapInPandas(op, IMAGE_HASH_SCHEMA)


def image_near_dups(
    df: DataFrame,
    method: str = "dhash",
    max_hamming: int = 3,
    media_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """Perceptual near-dup image pairs at Hamming distance ≤
    ``max_hamming``, band-blocked on the four 16-bit chunks exactly as
    ``dedup.simhash_near_dups`` (pigeonhole-exact recall for the
    default threshold 3; never an all-pairs join)."""
    hashed = image_hashes(df, method, media_col, id_col).filter(
        F.col("c0").isNotNull()
    )
    banded = hashed.select(
        "doc_id",
        *[f"c{k}" for k in range(4)],
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("band"), F.col(f"c{k}").alias("chunk"))
                    for k in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "c0", "c1", "c2", "c3", "bb.band", "bb.chunk")
    a, b = banded.alias("a"), banded.alias("b")
    hamming = sum(
        F.bit_count(F.col(f"a.c{k}").bitwiseXOR(F.col(f"b.c{k}"))) for k in range(4)
    )
    return (
        a.join(b, ["band", "chunk"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


VIDEO_HASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("c0", T.LongType(), True),
        T.StructField("c1", T.LongType(), True),
        T.StructField("c2", T.LongType(), True),
        T.StructField("c3", T.LongType(), True),
        T.StructField("phex", T.StringType(), True),
    ]
)


def video_frame_hashes(
    df: DataFrame,
    every_n: int = 2,
    method: str = "dhash",
    media_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """binary AVI → one perceptual-hash row per sampled keyframe (every
    ``every_n``-th decoded frame): the video extension of
    ``image_hashes``. Demux + decode + hash fuse into the standard
    zero-exchange ``mapInPandas`` media stage (1 row → n keyframes);
    non-AVI / undecodable media → one quarantined row (NULL
    ``frame_idx``) so drops stay visible, exactly like
    ``video.sample_video_frames``.

    Reference parity note: the reference pipeline has no video dedup —
    this is part of the training-data tier SURVEY.md §6 adds on top
    (LAION-style near-dedup lifted from images to video keyframes).
    """
    from intelligent_ocr_spark.operators.video import decode_avi

    fn = {"dhash": dhash64, "phash": phash64}[method]
    pruned = ensure_parallelism(df.select(id_col, media_col))
    cols = [f.name for f in VIDEO_HASH_SCHEMA.fields]

    def op(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                decoded = decode_avi(bytes(payload)) if payload is not None else None
                if decoded is None or not decoded[0]:
                    out.append(dict.fromkeys(cols) | {"doc_id": doc_id})
                    continue
                frames, _meta = decoded
                for idx in range(0, len(frames), every_n):
                    v = fn(frames[idx])
                    out.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            **{f"c{k}": (v >> (16 * k)) & 0xFFFF for k in range(4)},
                            "phex": f"{v:016x}",
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    return pruned.mapInPandas(op, VIDEO_HASH_SCHEMA)


def video_near_dups(
    df: DataFrame,
    every_n: int = 2,
    method: str = "dhash",
    max_hamming: int = 3,
    min_frame_pairs: int = 1,
    media_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate VIDEO pairs via keyframe perceptual hashes: two
    videos pair when at least ``min_frame_pairs`` of their sampled
    keyframe pairs sit within Hamming distance ``max_hamming``.
    Re-encodes of the same clip (identical or brightness-shifted
    pixels) collide exactly — MJPEG decode is deterministic, so a
    byte-identical source frame decodes to byte-identical pixels and a
    provably identical dHash.

    Plan shape is ``image_near_dups`` lifted one level: keyframe hashes
    band-block on the four 16-bit chunks (pigeonhole-exact recall at
    the default threshold 3 — never an all-pairs join across videos),
    the frame-level matches verify with JVM ``bit_count(xor)``, and a
    final groupBy rolls frame matches up to video pairs with
    ``n_frame_pairs`` / ``min_hamming`` evidence columns. At 100 TB the
    only exchanges are the band shuffle and the rollup — both keyed on
    short integers, both AQE-managed."""
    hashed = video_frame_hashes(df, every_n, method, media_col, id_col).filter(
        F.col("c0").isNotNull()
    )
    banded = hashed.select(
        "doc_id",
        "frame_idx",
        *[f"c{k}" for k in range(4)],
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("band"), F.col(f"c{k}").alias("chunk"))
                    for k in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "frame_idx", "c0", "c1", "c2", "c3", "bb.band", "bb.chunk")
    a, b = banded.alias("a"), banded.alias("b")
    hamming = sum(
        F.bit_count(F.col(f"a.c{k}").bitwiseXOR(F.col(f"b.c{k}"))) for k in range(4)
    )
    frame_pairs = (
        a.join(b, ["band", "chunk"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.frame_idx").alias("frame_a"),
            F.col("b.frame_idx").alias("frame_b"),
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return (
        frame_pairs.groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_frame_pairs"),
            F.min("hamming").alias("min_hamming"),
        )
        .filter(F.col("n_frame_pairs") >= min_frame_pairs)
    )
