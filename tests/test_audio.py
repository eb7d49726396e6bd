# -*- coding: utf-8 -*-
"""RIFF/WAVE real-decode tier (operators/audio.py).

Round-trips against the encoder twin cover every supported bit depth,
but a symmetric spec misunderstanding would cancel out — so the decoder
is additionally pinned by a HAND-ASSEMBLED byte vector laid out straight
from the canonical WAVE chunk diagram, plus chunk-walk edge cases (odd
sizes word-aligned, unknown chunks skipped, truncation stops at the last
whole chunk) and reject tests for the formats it honestly refuses.
Stats are pinned by closed-form signals: square waves (exact dyadic RMS
/ peak / ZCR), full-scale-negative clipping, digital silence.
"""

import numpy as np
import pytest

from intelligent_ocr_spark.operators.audio import (
    decode_audio_stats,
    decode_wav,
    encode_wav,
)


def _square(n, amp, period=4):
    """+amp,+amp,-amp,-amp,... — dyadic amplitudes make exact stats."""
    half = period // 2
    pat = np.array([amp] * half + [-amp] * half, dtype=np.float64)
    return np.tile(pat, n // period + 1)[:n]


# ---------------------------------------------------------------- decode


def test_hand_assembled_wav_vector():
    # 16-bit mono 8 kHz, 4 frames: +16384, -16384, +8192, -32768 —
    # every field written out by hand per the RIFF/WAVE layout.
    data = b"\x00\x40" + b"\x00\xc0" + b"\x00\x20" + b"\x00\x80"
    fmt = (
        b"\x01\x00"  # PCM
        + b"\x01\x00"  # 1 channel
        + b"\x40\x1f\x00\x00"  # 8000 Hz
        + b"\x80\x3e\x00\x00"  # byte rate 16000
        + b"\x02\x00"  # block align
        + b"\x10\x00"  # 16 bits
    )
    payload = (
        b"RIFF"
        + (36 + len(data)).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + (16).to_bytes(4, "little")
        + fmt
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
    )
    samples, rate, ch, bits = decode_wav(payload)
    assert (rate, ch, bits) == (8000, 1, 16)
    np.testing.assert_array_equal(
        samples[:, 0], np.array([0.5, -0.5, 0.25, -1.0])
    )


@pytest.mark.parametrize("bits", [8, 16, 24, 32, -32])
@pytest.mark.parametrize("channels", [1, 2])
def test_round_trip_all_depths(bits, channels):
    rng = np.random.RandomState(7 * channels + abs(bits))
    # dyadic grid representable at every depth ≥ 8 bits
    base = rng.randint(-127, 128, size=(50, channels)) / 128.0
    payload = encode_wav(base, 44100, bits=bits)
    samples, rate, ch, got_bits = decode_wav(payload)
    assert (rate, ch) == (44100, channels)
    assert got_bits == abs(bits)
    np.testing.assert_array_equal(samples, base)


def test_unknown_chunks_skipped_and_odd_size_padded():
    base = encode_wav(_square(8, 0.5)[:, None], 8000, bits=16)
    # splice a 3-byte junk chunk (odd size ⇒ 1 pad byte) before fmt
    junk = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    payload = base[:12] + junk + base[12:]
    payload = payload[:4] + (len(payload) - 8).to_bytes(4, "little") + payload[8:]
    samples, rate, ch, bits = decode_wav(payload)
    assert samples.shape == (8, 1)
    np.testing.assert_array_equal(samples[:, 0], _square(8, 0.5))


def test_truncated_data_chunk_rejected():
    payload = encode_wav(_square(16, 0.5)[:, None], 8000, bits=16)
    assert decode_wav(payload[:-5]) is None  # data chunk now short


def test_extensible_subformat_resolved():
    base = encode_wav(_square(8, 0.25)[:, None], 16000, bits=16)
    # rebuild fmt as WAVE_FORMAT_EXTENSIBLE wrapping PCM
    fmt = base[20:36]
    ext = (
        b"\xfe\xff"
        + fmt[2:16]
        + (22).to_bytes(2, "little")  # cbSize
        + (16).to_bytes(2, "little")  # valid bits
        + (1).to_bytes(4, "little")  # channel mask (mono)
        + (1).to_bytes(4, "little")  # SubFormat: PCM GUID prefix
        + b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    )
    payload = (
        base[:16]
        + len(ext).to_bytes(4, "little")
        + ext
        + base[36:]
    )
    payload = payload[:4] + (len(payload) - 8).to_bytes(4, "little") + payload[8:]
    samples, rate, ch, bits = decode_wav(payload)
    assert (rate, ch, bits) == (16000, 1, 16)
    np.testing.assert_array_equal(samples[:, 0], _square(8, 0.25))


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: b"RIFX" + p[4:],  # wrong magic
        lambda p: p[:8] + b"AVI " + p[12:],  # not WAVE
        lambda p: p[:20] + b"\x02\x00" + p[22:],  # ADPCM tag
        lambda p: p[:34] + b"\x0c\x00" + p[36:],  # 12-bit PCM
        lambda p: p[:36] + b"junk" + p[40:],  # data chunk id gone
    ],
)
def test_rejects(mutate):
    payload = encode_wav(_square(8, 0.5)[:, None], 8000, bits=16)
    assert decode_wav(mutate(payload)) is None


# ----------------------------------------------------------------- stats


def _stats_of(payload, spark):
    df = spark.createDataFrame([(0, bytearray(payload))], "doc_id long, media binary")
    return decode_audio_stats(df).collect()[0]


def test_square_wave_stats_exact(spark):
    # 16-bit square amp 8192/32768 = 0.25, 10 frames: + + - - + + - - + +
    payload = encode_wav(_square(10, 0.25)[:, None], 8000, bits=16)
    row = _stats_of(payload, spark)
    assert row.rms == 0.25 and row.peak == 0.25
    assert row.zero_cross_rate == 4 / 9  # sign flips at i = 2,4,6,8
    assert row.clip_frac == 0.0
    assert row.is_silence is False
    assert row.duration_s == 10 / 8000
    assert row.n_frames == 10 and row.sample_rate == 8000


def test_clipping_counts_full_scale_negative(spark):
    x = np.array([0.5, -1.0, 0.5, -1.0], dtype=np.float64)[:, None]
    payload = encode_wav(x, 8000, bits=16)  # -1.0 ⇒ int16 -32768
    row = _stats_of(payload, spark)
    assert row.clip_frac == 0.5 and row.peak == 1.0


def test_silence_flag(spark):
    payload = encode_wav(np.zeros((32, 1)), 8000, bits=16)
    row = _stats_of(payload, spark)
    assert row.is_silence is True
    assert row.rms == 0.0 and row.zero_cross_rate == 0.0


def test_quarantine_rows_never_crash(spark):
    df = spark.createDataFrame(
        [(0, None), (1, bytearray(b"")), (2, bytearray(b"not a wav at all"))],
        "doc_id long, media binary",
    )
    rows = {r.doc_id: r for r in decode_audio_stats(df).collect()}
    assert len(rows) == 3
    for r in rows.values():
        assert r.sample_rate is None and r.rms is None
    assert rows[2].n_bytes == 16


def test_stereo_stats_match_mono(spark):
    mono = _square(12, 0.5)
    payload = encode_wav(np.column_stack([mono, mono]), 16000, bits=16)
    row = _stats_of(payload, spark)
    assert row.n_channels == 2 and row.n_frames == 12
    assert row.rms == 0.5 and row.peak == 0.5
    assert row.zero_cross_rate == 5 / 11


# ----------------------------------------------------------- G.711 (tags 6/7)


def test_g711_known_answer_bytes():
    # spec-derived codewords: full-scale and zero/minimum codes computed
    # by hand from the G.711 segment formulas (bias 0x84; 0x55 toggle)
    from intelligent_ocr_spark.operators.audio import _ALAW_TABLE, _ULAW_TABLE

    assert _ULAW_TABLE[0x00] * 32768 == -32124  # seg 7, mantissa 15, neg
    assert _ULAW_TABLE[0x80] * 32768 == 32124
    assert _ULAW_TABLE[0xFF] == 0.0  # both zero codes decode to 0
    assert _ULAW_TABLE[0x7F] == 0.0
    assert _ALAW_TABLE[0x2A] * 32768 == -32256  # seg 7, mantissa 15
    assert _ALAW_TABLE[0xAA] * 32768 == 32256
    assert _ALAW_TABLE[0xD5] * 32768 == 8  # seg 0 minimum magnitude
    assert _ALAW_TABLE[0x55] * 32768 == -8


@pytest.mark.parametrize("codec", ["ulaw", "alaw"])
def test_g711_roundtrip_on_codewords(codec):
    from intelligent_ocr_spark.operators.audio import _ALAW_TABLE, _ULAW_TABLE

    table = _ULAW_TABLE if codec == "ulaw" else _ALAW_TABLE
    vals = np.unique(table)  # every decodable level, once
    payload = encode_wav(vals[:, None], 8000, bits=codec)
    samples, rate, ch, bits = decode_wav(payload)
    assert bits == 8 and ch == 1
    np.testing.assert_array_equal(samples[:, 0], vals)


def test_g711_square_stats_exact(spark):
    # µ-law full-scale square: ±32124/32768 — all stats closed-form
    amp = 32124 / 32768
    payload = encode_wav(_square(10, amp)[:, None], 8000, bits="ulaw")
    row = _stats_of(payload, spark)
    assert row.rms == amp and row.peak == amp
    assert row.zero_cross_rate == 4 / 9 and row.clip_frac == 0.0


# ----------------------------------------------------------- segmentation


def _bursty(bursts, gap, amp):
    """bursts of square wave separated by `gap` silent frames."""
    from numpy import concatenate, zeros

    parts = []
    for ln in bursts:
        parts.append(_square(ln, amp))
        parts.append(zeros(gap))
    return concatenate(parts)


def _segments_of(payload, spark, **kw):
    from intelligent_ocr_spark.operators.audio import segment_audio

    df = spark.createDataFrame([(0, bytearray(payload))], "doc_id long, media binary")
    return sorted(segment_audio(df, **kw).collect(), key=lambda r: r.seg_idx or 0)


def test_segment_bounds_and_stats_exact(spark):
    payload = encode_wav(_bursty([12, 8], 6, 0.25)[:, None], 8000, bits=16)
    rows = _segments_of(payload, spark, min_gap=4)
    assert [(r.start_frame, r.end_frame) for r in rows] == [(0, 12), (18, 26)]
    for r in rows:
        assert r.rms == 0.25 and r.peak == 0.25
    assert rows[0].duration_s == 12 / 8000 and rows[0].n_frames == 12


def test_short_gaps_merge(spark):
    payload = encode_wav(_bursty([8, 8], 3, 0.5)[:, None], 8000, bits=16)
    rows = _segments_of(payload, spark, min_gap=4)
    # 3 < min_gap: one merged segment spanning first to last active frame
    assert [(r.start_frame, r.end_frame) for r in rows] == [(0, 19)]


def test_leading_silence_trimmed(spark):
    sig = np.concatenate([np.zeros(10), _square(8, 0.5), np.zeros(10)])
    payload = encode_wav(sig[:, None], 8000, bits=16)
    rows = _segments_of(payload, spark, min_gap=4)
    assert [(r.start_frame, r.end_frame) for r in rows] == [(10, 18)]


def test_all_silence_yields_no_segments(spark):
    payload = encode_wav(np.zeros((40, 1)), 8000, bits=16)
    from intelligent_ocr_spark.operators.audio import segment_audio

    df = spark.createDataFrame([(0, bytearray(payload))], "doc_id long, media binary")
    assert segment_audio(df).count() == 0


def test_segment_quarantine_row(spark):
    from intelligent_ocr_spark.operators.audio import segment_audio

    df = spark.createDataFrame(
        [(7, bytearray(b"not audio"))], "doc_id long, media binary"
    )
    rows = segment_audio(df).collect()
    assert len(rows) == 1 and rows[0].seg_idx is None and rows[0].doc_id == 7


# ------------------------------------------------------- IMA ADPCM (tag 0x11)


def test_ima_hand_computed_nibble_vector():
    # header: predictor 100, step index 20 (step 50); nibbles 0x3, 0xC,
    # then six zero codes — every predictor/index transition computed by
    # hand from the IMA step/index tables:
    #   0x3: diff 6+12+25=43  -> 143, idx 19
    #   0xC: diff 5+45  =50 (-) ->  93, idx 21
    #   0x0 six times: +6 +6 +5 +5 +4 +4 with idx 21->20->19->18->17->16
    from intelligent_ocr_spark.operators.audio import _ima_decode_block

    block = (100).to_bytes(2, "little", signed=True) + bytes([20, 0])
    block += bytes([0xC3, 0x00, 0x00, 0x00])
    (out,) = _ima_decode_block(block, 1)
    assert out == [100, 143, 93, 99, 105, 110, 115, 119, 123]


def test_ima_expand_clamps():
    from intelligent_ocr_spark.operators.audio import _ima_expand_nibble

    pred, idx = _ima_expand_nibble(0x7, 32000, 88)  # max positive diff
    assert pred == 32767 and idx == 88  # clamp both ways
    pred, idx = _ima_expand_nibble(0xF, -32000, 88)
    assert pred == -32768
    _, idx = _ima_expand_nibble(0x0, 0, 0)
    assert idx == 0  # index floor


def test_ima_roundtrip_constant_exact_and_sine_close():
    x = np.full((67, 2), -20000 / 32768.0)
    samples, rate, ch, bits = decode_wav(encode_wav(x, 8000, bits="ima"))
    assert bits == 4 and ch == 2
    np.testing.assert_array_equal(samples, x)  # fact chunk trims pad
    t = np.linspace(0, 4 * np.pi, 200)
    sine = (0.5 * np.sin(t))[:, None]
    dec, *_ = decode_wav(encode_wav(sine, 8000, bits="ima"))
    # after the inherent index-0 cold start the quantizer tracks closely
    assert np.max(np.abs(dec[16:, 0] - sine[16:, 0])) < 0.02


def test_ima_stats_through_operator(spark):
    x = np.full((50, 1), 8192 / 32768.0)
    row = _stats_of(encode_wav(x, 8000, bits="ima"), spark)
    assert row.bits == 4 and row.n_frames == 50
    assert row.rms == 0.25 and row.peak == 0.25 and row.zero_cross_rate == 0.0


def test_ima_bad_block_align_rejected():
    payload = encode_wav(np.zeros((40, 1)), 8000, bits="ima")
    # corrupt block_align to a non-conforming value
    bad = payload[:32] + (7).to_bytes(2, "little") + payload[34:]
    assert decode_wav(bad) is None


# ---------------------------------------------------------------------------
# linear resampling
# ---------------------------------------------------------------------------


def test_resample_linear_known_answers():
    from intelligent_ocr_spark.operators.audio import resample_linear

    v = np.array([[0.0], [1.0]])
    # 2x upsample: midpoint appears exactly
    assert resample_linear(v, 8000, 16000).ravel().tolist() == [0.0, 0.5, 1.0]
    # 2x downsample: every other frame, no interpolation
    ramp = (np.arange(7, dtype=np.float64)[:, None] * 3 - 4) / 32768
    down = resample_linear(ramp, 8000, 4000)
    assert (down.ravel() * 32768).tolist() == [-4.0, 2.0, 8.0, 14.0]
    # non-dyadic ratio still evaluates the ramp at j*sr_in/sr_out
    up = resample_linear(ramp, 8000, 12000)
    expect = np.arange(10) * (8000 / 12000) * 3 - 4
    assert np.allclose(up.ravel() * 32768, expect, atol=1e-9)
    # identity + degenerate inputs
    assert resample_linear(ramp, 8000, 8000) is not ramp
    assert resample_linear(ramp[:1], 8000, 16000).shape == (1, 1)
    assert resample_linear(ramp[:0], 8000, 16000).shape == (0, 1)


def test_resample_linear_multichannel_and_mean_exactness():
    from intelligent_ocr_spark.operators.audio import resample_linear

    n, c0, c1 = 57, -133.0, 4.0
    left = c0 + c1 * np.arange(n)
    stereo = np.stack([left, -left], axis=1) / 32768
    out = resample_linear(stereo, 8000, 16000)
    m = (n - 1) * 16000 // 8000 + 1
    assert out.shape == (m, 2)
    assert np.array_equal(out[:, 0], -out[:, 1])
    # dyadic ratio + integer ramp => the mean equals the closed form
    # BIT-EXACTLY (this is the driver-oracle contract)
    closed = (c0 + c1 * (8000.0 / 16000) * (m - 1) / 2) / 32768
    assert float(np.mean(out[:, 0])) == closed


def test_resample_audio_reencodes_and_quarantines(spark):
    from intelligent_ocr_spark.operators.audio import (
        decode_wav,
        encode_wav,
        resample_audio,
    )

    ramp = (np.arange(9, dtype=np.float64)[:, None] * 2 - 8) / 32768
    rows = [
        (0, bytearray(encode_wav(ramp, 8000, bits=16))),
        (1, bytearray(b"not a wav")),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r.doc_id: r.media for r in resample_audio(df, 16000).collect()}
    assert got[1] is None and got[2] is None
    samples, rate, nc, bits = decode_wav(bytes(got[0]))
    assert (rate, nc, bits) == (16000, 1, 16)
    assert samples.shape[0] == 17
    # dyadic ramp values round-trip the int16 re-encode exactly
    assert (samples.ravel() * 32768).tolist() == [
        -8.0, -7.0, -6.0, -5.0, -4.0, -3.0, -2.0, -1.0, 0.0,
        1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0,
    ]


def test_resample_audio_stats_operator(spark):
    from intelligent_ocr_spark.operators.audio import (
        encode_wav,
        resample_audio_stats,
    )

    ramp = (np.arange(5, dtype=np.float64)[:, None] * 4) / 32768
    rows = [(0, bytearray(encode_wav(ramp, 8000, bits=16))), (1, None)]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r.doc_id: r for r in resample_audio_stats(df, 4000).collect()}
    r0 = got[0]
    assert (r0.sr_in, r0.sr_out, r0.n_in, r0.n_out) == (8000, 4000, 5, 3)
    assert r0.mean_out == (0.0 + 8.0 + 16.0) / 3 / 32768
    assert got[1].sr_in is None and got[1].n_out is None
