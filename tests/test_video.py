# -*- coding: utf-8 -*-
"""MJPEG-in-AVI real demux tier (operators/video.py).

The demuxer is pinned by round-trips against the encoder twin (chunk
layout, fps rate/scale, declared meta), by structural edge cases the
twin does not emit (``rec `` record groups, odd-size word alignment,
injected undecodable frames, truncation) and by reject tests. Frame
pixel content is JPEG-lossy, so pixel assertions check decoded SHAPE,
order-preserving per-frame identity (uniform frames reconstruct to
within quantization error) and blankness — never exact bytes.
"""

import numpy as np
import pytest

from intelligent_ocr_spark.operators.video import (
    decode_avi,
    encode_avi_mjpeg,
    sample_video_frames,
)


def _uniform(w, h, val):
    return np.full((h, w, 3), val, dtype=np.uint8)


def _gradient(w, h, seed):
    g = np.linspace(seed % 50, 200 + seed % 55, h * w).reshape(h, w)
    return np.repeat(g.astype(np.uint8)[:, :, None], 3, axis=2)


def test_round_trip_meta_and_frames():
    frames = [_uniform(24, 16, 40 + 30 * i) for i in range(5)]
    payload = encode_avi_mjpeg(frames, fps=24)
    decoded, meta = decode_avi(payload)
    assert len(decoded) == 5
    assert meta["n_chunks"] == 5 and meta["n_undecodable"] == 0
    assert meta["fps"] == 24.0
    assert meta["n_frames_declared"] == 5
    assert (meta["width"], meta["height"]) == (24, 16)
    for i, arr in enumerate(decoded):
        assert arr.shape == (16, 24, 3)
        # uniform frames survive quantization to within a few codes,
        # and stay in emitted order
        assert abs(float(arr.mean()) - (40 + 30 * i)) < 4.0


def test_gradient_frames_decode_to_true_dims():
    frames = [_gradient(20, 28, 7), _gradient(20, 28, 9)]
    payload = encode_avi_mjpeg(frames, fps=10)
    decoded, meta = decode_avi(payload)
    assert [a.shape for a in decoded] == [(28, 20, 3)] * 2


def test_rec_list_grouping():
    frames = [_uniform(16, 16, 60), _uniform(16, 16, 180)]
    payload = encode_avi_mjpeg(frames, fps=10)
    # rebuild: wrap each 00dc chunk of the movi body in a LIST 'rec '
    decoded0, _ = decode_avi(payload)
    # walk to the movi LIST (first LIST is hdrl)
    pos = 12
    segs = []
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        segs.append((cid, pos, pos + 8 + size + (size & 1)))
        pos += 8 + size + (size & 1)
    movi = next(
        (s, e) for cid, s, e in segs
        if cid == b"LIST" and payload[s + 8 : s + 12] == b"movi"
    )
    s, e = movi
    body = payload[s + 12 : e]
    wrapped = bytearray(b"movi")
    bp = 0
    while bp + 8 <= len(body):
        size = int.from_bytes(body[bp + 4 : bp + 8], "little")
        chunk = body[bp : bp + 8 + size + (size & 1)]
        inner = b"rec " + chunk
        wrapped += b"LIST" + len(inner).to_bytes(4, "little") + inner
        bp += 8 + size + (size & 1)
    new_movi = b"LIST" + len(wrapped).to_bytes(4, "little") + bytes(wrapped)
    rebuilt = payload[:s] + new_movi + payload[e:]
    rebuilt = rebuilt[:4] + (len(rebuilt) - 8).to_bytes(4, "little") + rebuilt[8:]
    decoded, meta = decode_avi(rebuilt)
    assert meta["n_chunks"] == 2
    assert [a.mean() for a in decoded] == [a.mean() for a in decoded0]


def test_undecodable_frame_counted_and_skipped():
    frames = [_uniform(16, 16, 100)]
    payload = encode_avi_mjpeg(frames, fps=10)
    junk = b"00dc" + (7).to_bytes(4, "little") + b"notjpeg" + b"\x00"
    # splice the junk frame into the movi body (before the real one)
    at = payload.find(b"movi") + 4
    patched = payload[:at] + junk + payload[at:]
    # grow the two enclosing sizes: RIFF and the movi LIST
    movi_list_at = payload.find(b"movi") - 8
    old_movi = int.from_bytes(payload[movi_list_at + 4 : movi_list_at + 8], "little")
    patched = (
        patched[: movi_list_at + 4]
        + (old_movi + len(junk)).to_bytes(4, "little")
        + patched[movi_list_at + 8 :]
    )
    patched = patched[:4] + (len(patched) - 8).to_bytes(4, "little") + patched[8:]
    decoded, meta = decode_avi(patched)
    assert meta["n_chunks"] == 2 and meta["n_undecodable"] == 1
    assert len(decoded) == 1


def test_truncation_stops_at_last_whole_chunk():
    frames = [_uniform(16, 16, 60), _uniform(16, 16, 200)]
    payload = encode_avi_mjpeg(frames, fps=10)
    decoded, meta = decode_avi(payload[:-20])  # chops idx1, keeps movi
    assert len(decoded) == 2


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"RIFF\x04\x00\x00\x00WAVE",
        b"RIFX\x10\x00\x00\x00AVI " + b"\x00" * 8,
        b"not even riff at all",
    ],
)
def test_rejects(payload):
    assert decode_avi(payload) is None


def test_sample_video_frames(spark):
    frames = [
        _uniform(16, 16, 50),
        _gradient(16, 16, 3),
        _uniform(16, 16, 90),
        _gradient(16, 16, 5),
        _uniform(16, 16, 130),
    ]
    good = encode_avi_mjpeg(frames, fps=30)
    df = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(b"garbage")), (2, None)],
        "doc_id long, media binary",
    )
    rows = sample_video_frames(df, every_n=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    kept = sorted(r.frame_idx for r in by_doc[0])
    assert kept == [0, 2, 4]
    for r in by_doc[0]:
        assert (r.width, r.height, r.n_frames, r.fps) == (16, 16, 5, 30.0)
        assert r.is_blank is True  # sampled frames 0/2/4 are uniform
    assert len(by_doc[1]) == 1 and by_doc[1][0].frame_idx is None
    assert len(by_doc[2]) == 1 and by_doc[2][0].frame_idx is None


# ------------------------------------------------------------- A/V (auds)


def _square(n, amp):
    pat = np.array([amp, amp, -amp, -amp], dtype=np.float64)
    return np.tile(pat, n // 4 + 1)[:n]


def test_avi_audio_stream_roundtrip():
    frames = [_uniform(16, 16, 80)] * 3
    aud = _square(40, 0.25)[:, None]
    payload = encode_avi_mjpeg(frames, fps=10, audio=(aud, 8000))
    decoded, meta = decode_avi(payload)
    assert len(decoded) == 3 and meta["n_chunks"] == 3  # wb not a frame
    samples, rate, ch, bits = meta["audio"]
    assert (rate, ch, bits) == (8000, 1, 16)
    np.testing.assert_array_equal(samples, aud)


def test_avi_without_audio_has_none():
    payload = encode_avi_mjpeg([_uniform(16, 16, 90)], fps=10)
    _, meta = decode_avi(payload)
    assert meta["audio"] is None


def test_decode_av_stats_exact(spark):
    from intelligent_ocr_spark.operators.video import decode_av_stats

    frames = [_gradient(16, 16, k) for k in range(4)]
    aud = np.column_stack([_square(100, 0.5)] * 2)
    good = encode_avi_mjpeg(frames, fps=10, audio=(aud, 16000))
    silent = encode_avi_mjpeg(frames[:2], fps=24)
    df = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(silent)), (2, bytearray(b"junk"))],
        "doc_id long, media binary",
    )
    rows = {r.doc_id: r for r in decode_av_stats(df).collect()}
    r0 = rows[0]
    assert (r0.n_frames, r0.fps, r0.width, r0.height) == (4, 10.0, 16, 16)
    assert r0.v_duration_s == 4 / 10.0
    assert (r0.a_rate, r0.a_channels, r0.a_frames) == (16000, 2, 100)
    assert r0.a_duration_s == 100 / 16000
    assert r0.a_rms == 0.5 and r0.a_peak == 0.5
    r1 = rows[1]
    assert r1.n_frames == 2 and r1.a_rate is None and r1.a_rms is None
    assert rows[2].n_frames is None
