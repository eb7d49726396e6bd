# -*- coding: utf-8 -*-
"""Perceptual image hashing + banded near-dup pairs (operators/imagehash.py).

The load-bearing property is PROVABLE offset invariance: dHash compares
integer channel-sums that all shift by the same amount under a uniform
brightness change, and pHash drops the DC coefficient — so both hashes
are bit-identical across brightness replicas (no clipping), which is
exactly what the driver oracle exercises. Sensitivity is pinned the
other way: structurally different images must land far apart.
"""

import numpy as np
import pytest

from intelligent_ocr_spark.operators.imagehash import (
    dhash64,
    image_near_dups,
    phash64,
)
from intelligent_ocr_spark.operators.multimodal import encode_png


def _noise(seed, h=24, w=24, lo=40, hi=190):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("fn", [dhash64, phash64])
def test_offset_invariance_exact(fn):
    for seed in range(6):
        base = _noise(seed)
        for off in (-25, -9, 7, 30):
            shifted = (base.astype(np.int16) + off).astype(np.uint8)  # no clip
            assert fn(shifted) == fn(base), (fn.__name__, seed, off)


@pytest.mark.parametrize("fn", [dhash64, phash64])
def test_different_images_far_apart(fn):
    hashes = [fn(_noise(s)) for s in range(8)]
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            d = bin(hashes[i] ^ hashes[j]).count("1")
            assert d > 10, (fn.__name__, i, j, d)


def test_dhash_known_answer():
    # 2x18 gradient: every right neighbor strictly brighter in both grid
    # rows -> all 64 difference bits set
    arr = np.tile(np.arange(10, 190, 10, dtype=np.uint8), (2, 1))
    arr = np.repeat(arr[:, :, None], 3, axis=2)
    assert dhash64(arr) == (1 << 64) - 1
    # uniform image: no strict inequalities anywhere
    assert dhash64(np.full((8, 9, 3), 77, dtype=np.uint8)) == 0


def test_phash_uniform_is_zero():
    # constant image: every non-DC coefficient is 0 == median, no bits
    assert phash64(np.full((16, 16, 3), 130, dtype=np.uint8)) == 0


def test_image_near_dups_groups(spark):
    # 3 brightness replicas per base image -> within-group pairs at
    # hamming 0; across groups the noise hashes are far apart
    rows = []
    for g in range(5):
        base = _noise(g)
        for r, off in enumerate((0, 7, -9)):
            img = (base.astype(np.int16) + off).astype(np.uint8)
            rows.append((g + 10 * r, bytearray(encode_png(img))))
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in image_near_dups(df, max_hamming=3).collect()
    }
    expect = {
        (g, g + 10): 0 for g in range(5)
    } | {(g, g + 20): 0 for g in range(5)} | {(g + 10, g + 20): 0 for g in range(5)}
    assert got == expect


def test_null_media_dropped_from_pairs(spark):
    df = spark.createDataFrame(
        [(0, bytearray(encode_png(_noise(1)))), (1, None)],
        "doc_id long, media binary",
    )
    assert image_near_dups(df).count() == 0


# ---------------------------------------------------------------------------
# video keyframe near-dedup (video_frame_hashes / video_near_dups)
# ---------------------------------------------------------------------------

from intelligent_ocr_spark.operators.imagehash import (  # noqa: E402
    video_frame_hashes,
    video_near_dups,
)
from intelligent_ocr_spark.operators.video import encode_avi_mjpeg  # noqa: E402


def _clip(group, replica, n=4):
    """4-frame clip: even frames are group-shared noise (identical bytes
    across replicas), odd frames are replica-private noise."""
    frames = []
    for k in range(n):
        if k % 2 == 0:
            frames.append(_noise(1000 * group + k))
        else:
            frames.append(_noise(777 + 100 * group + 10 * replica + k))
    return encode_avi_mjpeg(frames, fps=10)


def test_video_frame_hashes_sampling_and_quarantine(spark):
    df = spark.createDataFrame(
        [(0, bytearray(_clip(0, 0))), (1, bytearray(b"not an avi at all"))],
        "doc_id long, media binary",
    )
    rows = video_frame_hashes(df, every_n=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 0: frames 0 and 2 sampled, real hashes
    assert sorted(r.frame_idx for r in by_doc[0]) == [0, 2]
    assert all(r.phex is not None for r in by_doc[0])
    # doc 1: one quarantined row, NULL frame_idx and hash
    assert len(by_doc[1]) == 1
    assert by_doc[1][0].frame_idx is None and by_doc[1][0].c0 is None


def test_video_near_dups_replica_groups(spark):
    # 3 groups x 2 replicas: the two sampled keyframes (0, 2) are
    # byte-identical across replicas -> MJPEG decode is deterministic ->
    # dhash identical -> each group pairs with n_frame_pairs=2 at
    # hamming 0; odd (unsampled) frames differ so the clips are not
    # byte-identical overall
    rows = []
    for g in range(3):
        for r in range(2):
            rows.append((g + 10 * r, bytearray(_clip(g, r))))
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {
        (p.doc_a, p.doc_b): (p.n_frame_pairs, p.min_hamming)
        for p in video_near_dups(df, every_n=2, max_hamming=3).collect()
    }
    assert got == {(g, g + 10): (2, 0) for g in range(3)}


def test_video_near_dups_min_frame_pairs_gate(spark):
    rows = [(r * 10, bytearray(_clip(0, r))) for r in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    # 2 matching keyframe pairs exist; requiring 3 filters the pair out
    assert video_near_dups(df, every_n=2, min_frame_pairs=3).count() == 0
    assert video_near_dups(df, every_n=2, min_frame_pairs=2).count() == 1
