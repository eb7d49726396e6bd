# -*- coding: utf-8 -*-
"""PNG and GIF real-decode tier (operators/multimodal.py).

Round-trips against the encoder twins exercise every PNG filter type and
the GIF LZW table dynamics, but a symmetric misunderstanding of a spec
would cancel out in a round-trip — so the decoders are additionally
pinned by HAND-ASSEMBLED byte vectors computed straight from RFC 2083
(PNG filters, chunk layout) and GIF89a appendix F (LZW packing), plus
reject tests for the flavors the decoders honestly do not support.
"""

import zlib

import numpy as np
import pytest

from intelligent_ocr_spark.operators.multimodal import (
    decode_gif,
    decode_image_stats,
    decode_png,
    encode_gif,
    encode_png,
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big")
        + typ
        + data
        + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _png(w, h, depth, ctype, raw_scanlines: bytes, extra=b"", interlace=0) -> bytes:
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([depth, ctype, 0, 0, interlace])
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw_scanlines))
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# PNG round-trips (encoder twin)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("filt", [None, 0, 1, 2, 3, 4, [4, 3, 2, 1, 0]])
def test_png_roundtrip_every_filter(filt):
    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (2, 2), (7, 5), (33, 17)]:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        dec = decode_png(encode_png(arr, filt))
        assert dec is not None
        out, ow, oh, oc = dec
        assert (ow, oh, oc) == (w, h, 3)
        assert np.array_equal(out, arr)


def test_png_roundtrip_gradient_stresses_predictors():
    # smooth gradients are where Sub/Average/Paeth predictions are
    # non-trivial (near-zero residuals); exact recovery pins the inverse
    g = (np.arange(48 * 48 * 3, dtype=np.uint32).reshape(48, 48, 3) % 256).astype(
        np.uint8
    )
    for filt in (1, 3, 4):
        out = decode_png(encode_png(g, filt))
        assert out is not None and np.array_equal(out[0], g)


# ---------------------------------------------------------------------------
# PNG hand-assembled known answers (decoder alone, no twin)
# ---------------------------------------------------------------------------


def test_png_hand_vector_up_filter_rgb():
    # 2x2 RGB. Row 0 filter 0 (raw), row 1 filter 2 (Up):
    # Recon(row1) = Filt(row1) + Recon(row0) per RFC 2083 §6.4, computed
    # by hand below.
    row0 = bytes([0, 10, 20, 30, 40, 50, 60])
    row1 = bytes([2, 1, 2, 3, 4, 5, 6])  # filtered bytes
    payload = _png(2, 2, 8, 2, row0 + row1)
    dec = decode_png(payload)
    assert dec is not None
    out = dec[0]
    expect = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[11, 22, 33], [44, 55, 66]]], dtype=np.uint8
    )
    assert np.array_equal(out, expect)


def test_png_hand_vector_sub_filter_wraps_mod_256():
    # 1x3 RGB, filter 1 (Sub): Recon(x) = Filt(x) + Recon(x-3) mod 256.
    # 250 + 10 = 260 → 4: the modular wrap is the part a naive cumsum gets
    # wrong.
    row = bytes([1, 250, 0, 0, 10, 1, 1, 10, 1, 1])
    dec = decode_png(_png(3, 1, 8, 2, row))
    assert dec is not None
    expect = np.array([[[250, 0, 0], [4, 1, 1], [14, 2, 2]]], dtype=np.uint8)
    assert np.array_equal(dec[0], expect)


def test_png_hand_vector_gray_and_palette_and_alpha():
    # ctype 0 gray 8-bit, one 2-px row, raw filter
    dec = decode_png(_png(2, 1, 8, 0, bytes([0, 7, 200])))
    assert dec is not None
    assert np.array_equal(
        dec[0], np.array([[[7, 7, 7], [200, 200, 200]]], dtype=np.uint8)
    )
    # ctype 3 palette: PLTE maps 0→red, 1→blue
    plte = _chunk(b"PLTE", bytes([255, 0, 0, 0, 0, 255]))
    dec = decode_png(_png(2, 1, 8, 3, bytes([0, 1, 0]), extra=plte))
    assert dec is not None
    assert np.array_equal(
        dec[0], np.array([[[0, 0, 255], [255, 0, 0]]], dtype=np.uint8)
    )
    # ctype 6 RGBA: alpha dropped, not composited
    dec = decode_png(_png(1, 1, 8, 6, bytes([0, 9, 8, 7, 128])))
    assert dec is not None
    assert np.array_equal(dec[0], np.array([[[9, 8, 7]]], dtype=np.uint8))


def test_png_unsupported_flavors_return_none():
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    good = encode_png(arr)
    assert decode_png(good) is not None
    # 16-bit depth
    assert decode_png(_png(1, 1, 16, 2, bytes([0] + [0] * 6))) is None
    # interlace method 2 does not exist
    assert decode_png(_png(1, 1, 8, 2, bytes([0, 1, 2, 3]), interlace=2)) is None
    # truncated IDAT (inflate fails or wrong length)
    assert decode_png(good[:-20]) is None
    # palette index out of range
    plte = _chunk(b"PLTE", bytes([1, 2, 3]))
    assert decode_png(_png(1, 1, 8, 3, bytes([0, 5]), extra=plte)) is None
    # bad filter type byte
    assert decode_png(_png(1, 1, 8, 2, bytes([9, 1, 2, 3]))) is None


# ---------------------------------------------------------------------------
# PNG Adam7 interlace
# ---------------------------------------------------------------------------


def test_png_adam7_hand_vector():
    # 2×2 RGB Adam7 populates exactly passes 1 (px 0,0), 6 (px 0,1) and
    # 7 (row 1) — in THAT order in the stream, each with its own filter
    # byte. Scanlines written straight from the spec's pass grid.
    raw = (
        bytes([0, 10, 11, 12])  # pass 1: (0,0)
        + bytes([0, 20, 21, 22])  # pass 6: (0,1)
        + bytes([0, 30, 31, 32, 40, 41, 42])  # pass 7: (1,0) (1,1)
    )
    dec = decode_png(_png(2, 2, 8, 2, raw, interlace=1))
    assert dec is not None
    arr, w, h, _ = dec
    assert (w, h) == (2, 2)
    expect = np.array(
        [[[10, 11, 12], [20, 21, 22]], [[30, 31, 32], [40, 41, 42]]],
        dtype=np.uint8,
    )
    assert np.array_equal(arr, expect)


def test_png_adam7_roundtrip_odd_dims_all_filters():
    rng = np.random.default_rng(11)
    # dims straddling every pass-emptiness boundary, incl. sub-8 tiles
    for h, w in [(1, 1), (2, 2), (3, 9), (5, 4), (8, 8), (9, 5), (17, 13)]:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for filters in [0, 1, 2, 3, 4, None]:
            payload = encode_png(arr, filters=filters, interlace=True)
            dec = decode_png(payload)
            assert dec is not None, (h, w, filters)
            assert np.array_equal(dec[0], arr), (h, w, filters)
            # and the interlaced file decodes identically to sequential
            seq = decode_png(encode_png(arr, filters=filters))
            assert np.array_equal(dec[0], seq[0])


def test_png_adam7_wrong_stream_length_rejected():
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_png(arr, interlace=True)
    import zlib

    # rebuild the IDAT with one trailing garbage byte appended
    assert decode_png(good) is not None
    pos = good.find(b"IDAT") - 4
    ln = int.from_bytes(good[pos : pos + 4], "big")
    stream = zlib.decompress(good[pos + 8 : pos + 8 + ln])
    bad = zlib.compress(stream + b"\x00", 6)
    rebuilt = (
        good[:pos]
        + _chunk(b"IDAT", bad)
        + good[pos + 12 + ln :]
    )
    assert decode_png(rebuilt) is None


# ---------------------------------------------------------------------------
# GIF round-trips (encoder twin)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip(interlace):
    rng = np.random.default_rng(5)
    for h, w, ncol in [(1, 1, 1), (3, 2, 2), (8, 8, 4), (16, 16, 256), (23, 11, 17)]:
        pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
        arr = pal[rng.integers(0, ncol, size=(h, w), dtype=np.uint8)]
        dec = decode_gif(encode_gif(arr, interlace=interlace))
        assert dec is not None
        out, ow, oh, oc = dec
        assert (ow, oh, oc) == (w, h, 3)
        assert np.array_equal(out, arr)


def test_gif_lzw_table_growth_width_bumps_and_clear():
    # 120x120 quasi-random 251-color image: the LZW dictionary grows
    # through every width bump 9→12 and wraps past 4096 (encoder emits
    # CLEAR mid-stream), so the decoder's table dynamics — including the
    # KwKwK case — are all exercised on one fixture.
    rng = np.random.default_rng(3)
    idx = (np.arange(120 * 120) * 7919 // 13 % 251).astype(np.uint8).reshape(120, 120)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    arr = pal[idx]
    dec = decode_gif(encode_gif(arr))
    assert dec is not None and np.array_equal(dec[0], arr)


# ---------------------------------------------------------------------------
# GIF hand-assembled known answer
# ---------------------------------------------------------------------------


def test_gif_hand_vector_lzw_packing():
    # 3x1 two-color image, pixels [1, 1, 0]. min_code=2 → CLEAR=4 EOI=5,
    # width 3. Literal-only stream (decoder builds entries itself):
    # codes 4,1,1,0,5 packed LSB-first = 0b101_000_001_001_100 =
    # 0x504C → bytes 4C 50 (appendix F packing order).
    pal = bytes([0, 0, 0, 255, 255, 255]) + bytes(6)  # size-4 table, 2 used
    payload = (
        b"GIF87a"
        + (3).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + bytes([0x81, 0, 0])  # GCT flag, size bits 1 → 4 entries
        + pal
        + b"\x2c"
        + bytes(4)
        + (3).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + bytes([0x00, 2])  # not interlaced, min code size 2
        + bytes([2, 0x4C, 0x50, 0])  # one 2-byte sub-block, terminator
        + b"\x3b"
    )
    dec = decode_gif(payload)
    assert dec is not None
    out, w, h, c = dec
    assert (w, h, c) == (3, 1, 3)
    expect = np.array([[[255, 255, 255], [255, 255, 255], [0, 0, 0]]], dtype=np.uint8)
    assert np.array_equal(out, expect)


def test_gif_rejects_garbage_and_truncation():
    assert decode_gif(b"GIF87a") is None
    assert decode_gif(b"notagif") is None
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_gif(arr)
    assert decode_gif(good) is not None
    assert decode_gif(good[: len(good) // 2]) is None


def test_encode_gif_rejects_truecolor():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_gif(arr)


# ---------------------------------------------------------------------------
# Spark integration: the stats operator recovers REAL dims from PNG/GIF
# ---------------------------------------------------------------------------


def test_decode_image_stats_reads_png_and_gif(spark):
    rng = np.random.default_rng(2)
    png_arr = rng.integers(0, 256, size=(19, 31, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    gif_arr = pal[rng.integers(0, 8, size=(13, 27), dtype=np.uint8)]
    blank_png = np.full((10, 10, 3), 42, dtype=np.uint8)
    rows = [
        (1, bytearray(encode_png(png_arr))),
        (2, bytearray(encode_gif(gif_arr, interlace=True))),
        (3, bytearray(encode_png(blank_png))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {
        r["doc_id"]: r
        for r in decode_image_stats(df).collect()
    }
    assert (got[1]["width"], got[1]["height"]) == (31, 19)
    assert (got[2]["width"], got[2]["height"]) == (27, 13)
    assert got[3]["is_blank"] is True
    assert got[1]["channels"] == got[2]["channels"] == 3


# ---------------------------------------------------------------------------
# JPEG (baseline DCT) round-trips and hand vectors
# ---------------------------------------------------------------------------

from intelligent_ocr_spark.operators.multimodal import (  # noqa: E402
    decode_jpeg,
    encode_jpeg,
)


def test_jpeg_uniform_roundtrip_exact():
    # Uniform blocks are DC-only: with a flat quant=1 table the DC
    # coefficient 8*(v-128) is integer-exact, so reconstruction is exact.
    for h, w in [(8, 8), (24, 40), (13, 21)]:
        arr = np.full((h, w, 3), 200, dtype=np.uint8)
        dec, gw, gh, c = decode_jpeg(encode_jpeg(arr))
        assert (gw, gh, c) == (w, h, 3)
        assert np.array_equal(dec, arr)


def test_jpeg_random_444_tight_roundtrip():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(30, 50, 3), dtype=np.uint8)
    dec, w, h, _ = decode_jpeg(encode_jpeg(arr))
    assert (w, h) == (50, 30)
    # only float DCT + YCbCr rounding; noise survives within +-3
    assert np.abs(dec.astype(int) - arr.astype(int)).max() <= 3


@pytest.mark.parametrize("mode", [False, True, "422"])
def test_jpeg_neutral_gradient_all_samplings(mode):
    # Color-neutral content has uniform chroma, so even 4:2:0/4:2:2
    # chroma decimation is lossless and the luma gradient must survive.
    g = np.linspace(0, 255, 30 * 50).reshape(30, 50).astype(np.uint8)
    arr = np.repeat(g[:, :, None], 3, axis=2)
    dec, w, h, _ = decode_jpeg(encode_jpeg(arr, subsample=mode))
    assert (w, h) == (50, 30)
    assert np.abs(dec.astype(int) - arr.astype(int)).max() <= 2


def test_jpeg_grayscale_single_component():
    g = np.linspace(10, 250, 17 * 29).reshape(17, 29).astype(np.uint8)
    arr = np.repeat(g[:, :, None], 3, axis=2)
    payload = encode_jpeg(arr, gray=True)
    # SOF0 declares exactly one component
    sof = payload.index(b"\xff\xc0")
    assert payload[sof + 9] == 1
    dec, w, h, c = decode_jpeg(payload)
    assert (w, h, c) == (29, 17, 3)
    assert np.abs(dec.astype(int) - arr.astype(int)).max() <= 1


def test_jpeg_restart_markers_roundtrip():
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, size=(33, 41, 3), dtype=np.uint8)
    payload = encode_jpeg(arr, restart_interval=3)
    # DRI segment present and RST0.. markers actually emitted in order
    assert b"\xff\xdd\x00\x04\x00\x03" in payload
    assert b"\xff\xd0" in payload and b"\xff\xd1" in payload
    dec, w, h, _ = decode_jpeg(payload)
    assert (w, h) == (41, 33)
    assert np.abs(dec.astype(int) - arr.astype(int)).max() <= 3


def test_jpeg_chroma_subsampled_color_recovers_dims_means():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(29, 37, 3), dtype=np.uint8)
    dec, w, h, _ = decode_jpeg(encode_jpeg(arr, subsample=True))
    assert (w, h) == (37, 29)
    # chroma noise is decimated, but luma (and thus channel means)
    # survive: per-image mean within a few levels
    assert abs(dec.mean() - arr.mean()) < 4


def test_jpeg_lossy_quant_smooth_content():
    g = np.linspace(0, 255, 30 * 50).reshape(30, 50).astype(np.uint8)
    arr = np.repeat(g[:, :, None], 3, axis=2)
    dec, w, h, _ = decode_jpeg(encode_jpeg(arr, quant=8))
    assert (w, h) == (50, 30)
    assert np.abs(dec.astype(int) - arr.astype(int)).max() <= 8


def _hand_jpeg_gray_dc_only(dc_size: int, entropy: bytes) -> bytes:
    """Minimal 8x8 single-component JPEG assembled straight from T.81:
    flat quant table 1, a one-code DC table (code '0' -> dc_size), a
    one-code AC table (code '0' -> EOB), caller supplies the packed
    entropy bytes."""

    def seg(marker, data):
        return bytes([0xFF, marker]) + (len(data) + 2).to_bytes(2, "big") + data

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))
    out += seg(0xC0, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    dc_bits = bytes([1] + [0] * 15)  # one code, length 1
    out += seg(0xC4, bytes([0x00]) + dc_bits + bytes([dc_size]))
    out += seg(0xC4, bytes([0x10]) + dc_bits + bytes([0x00]))  # EOB
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return out + entropy + b"\xff\xd9"


def test_jpeg_hand_vector_positive_dc():
    # Pixel value 130 -> level shift +2 -> orthonormal DC = 16 -> size 5,
    # magnitude bits 10000. Stream: huff('0') 10000 huff('0') -> 7 bits,
    # 1-padded: 0b01000001 = 0x41. Decoder must reproduce uniform 130.
    dec, w, h, _ = decode_jpeg(_hand_jpeg_gray_dc_only(5, b"\x41"))
    assert (w, h) == (8, 8)
    assert np.array_equal(dec, np.full((8, 8, 3), 130, dtype=np.uint8))


def test_jpeg_hand_vector_negative_dc_extend():
    # Pixel value 126 -> DC = -16 -> size 5, EXTEND bits -16+31=15 =
    # 01111. Stream 0 01111 0 + pad -> 0b00111101 = 0x3D.
    dec, w, h, _ = decode_jpeg(_hand_jpeg_gray_dc_only(5, b"\x3d"))
    assert (w, h) == (8, 8)
    assert np.array_equal(dec, np.full((8, 8, 3), 126, dtype=np.uint8))


def test_jpeg_rejects_unsupported_flavors():
    arr = np.full((8, 8, 3), 99, dtype=np.uint8)
    good = encode_jpeg(arr)
    assert decode_jpeg(b"NOTAJPEG") is None
    assert decode_jpeg(good[:40]) is None  # truncated mid-headers
    # a baseline stream relabeled SOF2 is malformed progressive: its
    # SOS (Ss=0, Se=63) is neither a DC nor a legal AC scan header
    prog = good.replace(b"\xff\xc0", b"\xff\xc2")
    assert decode_jpeg(prog) is None
    # 16-bit quant table (Pq=1) is not baseline-8
    bad_q = good.replace(b"\xff\xdb\x00\x43\x00", b"\xff\xdb\x00\x43\x10")
    assert decode_jpeg(bad_q) is None


def test_decode_image_stats_reads_jpeg(spark):
    rng = np.random.default_rng(4)
    noisy = rng.integers(0, 256, size=(19, 31, 3), dtype=np.uint8)
    blank = np.full((10, 14, 3), 77, dtype=np.uint8)
    rows = [
        (1, bytearray(encode_jpeg(noisy))),
        (2, bytearray(encode_jpeg(blank, subsample=True))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r["doc_id"]: r for r in decode_image_stats(df).collect()}
    assert (got[1]["width"], got[1]["height"]) == (31, 19)
    assert (got[2]["width"], got[2]["height"]) == (14, 10)
    assert got[2]["is_blank"] is True and got[1]["is_blank"] is False


# ---------------------------------------------------------------------------
# Progressive JPEG (T.81 Annex G)
# ---------------------------------------------------------------------------


def _seg(marker: int, data: bytes) -> bytes:
    return b"\xff" + bytes([marker]) + (len(data) + 2).to_bytes(2, "big") + data


def test_jpeg_progressive_hand_vector_spectral_selection():
    # 8x8 grayscale, flat quant 1, coefficients (zigzag order):
    # DC=10, AC k=1 -> 3, k=5 -> -1, rest 0. Two scans: DC then AC 1..63.
    # DC DHT: single symbol 4 at code length 1 (code '0');
    # stream '0'+1010 padded -> 0x57.
    # AC DHT: symbols {0x00, 0x02, 0x31} at length 2 (codes 00/01/10);
    # stream: 0x02('01')+bits'11', 0x31('10')+bit'0', EOB('00')
    # = 011110000 padded -> 0x78 0x7F.
    payload = (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0]) + bytes([1] * 64))
        + _seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
        + _seg(0xC4, bytes([0x00, 1] + [0] * 15 + [4]))
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
        + bytes([0x57])
        + _seg(0xC4, bytes([0x10, 0, 3] + [0] * 14 + [0x00, 0x02, 0x31]))
        + _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
        + bytes([0x78, 0x7F])
        + b"\xff\xd9"
    )
    dec = decode_jpeg(payload)
    assert dec is not None
    arr, w, h, _ = dec
    assert (w, h) == (8, 8)
    from intelligent_ocr_spark.operators.multimodal import _DCT_M, _ZIGZAG

    zz = np.zeros(64)
    zz[0], zz[1], zz[5] = 10, 3, -1
    block = np.zeros(64)
    block[_ZIGZAG] = zz
    expect = np.clip(
        np.rint(_DCT_M.T @ block.reshape(8, 8) @ _DCT_M + 128.0), 0, 255
    ).astype(np.uint8)
    assert np.array_equal(arr, np.repeat(expect[:, :, None], 3, axis=2))


def test_jpeg_progressive_hand_vector_restart_resets_dc_pred():
    # 16x8 grayscale, two blocks, DRI=1: each restart segment must reset
    # the DC predictor, so both blocks code the SAME size-7 diff of 80
    # ('0'+1010000 = 0x50) and decode to two flat 138 tiles. Without the
    # reset the second block would decode 160.
    payload = (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0]) + bytes([1] * 64))
        + _seg(0xC2, bytes([8, 0, 8, 0, 16, 1, 1, 0x11, 0]))
        + _seg(0xC4, bytes([0x00, 1] + [0] * 15 + [7]))
        + _seg(0xDD, bytes([0, 1]))
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
        + bytes([0x50])
        + b"\xff\xd0"
        + bytes([0x50])
        + b"\xff\xd9"
    )
    dec = decode_jpeg(payload)
    assert dec is not None
    arr, w, h, _ = dec
    assert (w, h) == (16, 8)
    assert np.array_equal(arr, np.full((8, 16, 3), 138, dtype=np.uint8))


def test_jpeg_progressive_matches_baseline_bit_exactly():
    # At quant=1 the progressive coefficient accumulation must land on
    # exactly the baseline encoder's integers, so the decoded images are
    # equal BIT FOR BIT -- a differential that catches any defect in DC/
    # AC first scans, EOB runs, refinement corrections or band stitching.
    from intelligent_ocr_spark.operators.multimodal import encode_jpeg_progressive

    rng = np.random.default_rng(23)
    cases = []
    noise = rng.integers(0, 256, size=(21, 13, 3), dtype=np.uint8)
    cases.append(noise)
    sparse = np.full((17, 26, 3), 128, dtype=np.uint8)
    sparse[3, 5] = (255, 0, 9)
    sparse[12, 20] = (0, 255, 17)
    cases.append(sparse)  # long zero runs: ZRL + EOB-run stress
    for arr in cases:
        for gray in (False, True):
            ref = decode_jpeg(encode_jpeg(arr, gray=gray))[0]
            for successive in (False, True):
                for bands in (((1, 5), (6, 63)), ((1, 63),)):
                    payload = encode_jpeg_progressive(
                        arr, gray=gray, successive=successive, bands=bands
                    )
                    got = decode_jpeg(payload)
                    assert got is not None, (gray, successive, bands)
                    assert np.array_equal(got[0], ref), (gray, successive, bands)


def test_jpeg_progressive_emits_refinement_scans():
    # guard: successive=True must really write Ah=1 scans (DC refine +
    # one AC refine per band), or the refinement decode paths would be
    # silently untested by the differential above.
    from intelligent_ocr_spark.operators.multimodal import encode_jpeg_progressive

    arr = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    payload = encode_jpeg_progressive(arr, gray=True, successive=True)
    # scans: DC first + 2 AC first + DC refine + 2 AC refine = 6
    assert payload.count(b"\xff\xda") == 6
    plain = encode_jpeg_progressive(arr, gray=True, successive=False)
    assert plain.count(b"\xff\xda") == 3


# ---------------------------------------------------------------------------
# Exif orientation (APP1)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("byte_order", ["little", "big"])
def test_exif_orientation_all_eight(byte_order):
    from intelligent_ocr_spark.operators.multimodal import (
        _apply_orientation,
        encode_jpeg,
    )

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, size=(10, 18, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(arr))[0]
    for o in range(1, 9):
        payload = encode_jpeg(arr, exif_orientation=o, exif_byte_order=byte_order)
        got = decode_jpeg(payload)
        exp = _apply_orientation(base, o)
        assert got is not None
        assert np.array_equal(got[0], exp), (o, byte_order)
        assert (got[1], got[2]) == (exp.shape[1], exp.shape[0])


def test_exif_malformed_app1_ignored():
    from intelligent_ocr_spark.operators.multimodal import encode_jpeg

    arr = np.full((8, 16, 3), 90, dtype=np.uint8)
    good = encode_jpeg(arr, exif_orientation=6)
    base = decode_jpeg(encode_jpeg(arr))
    # corrupt the TIFF byte-order mark: decode proceeds unrotated
    bad = good.replace(b"Exif\x00\x00II", b"Exif\x00\x00XX")
    got = decode_jpeg(bad)
    assert got is not None and (got[1], got[2]) == (base[1], base[2])
    # APP1 that is not Exif at all (e.g. XMP) is also ignored
    # (same-length prefix swap keeps the segment length field honest)
    xmp = good.replace(b"Exif\x00\x00", b"http:/")
    got = decode_jpeg(xmp)
    assert got is not None and (got[1], got[2]) == (base[1], base[2])


def test_exif_hand_vector_big_endian():
    # hand-assembled MM (big-endian) APP1: orientation 8 = rotate 90 CCW
    from intelligent_ocr_spark.operators.multimodal import _exif_orientation

    tiff = (
        b"MM" + (42).to_bytes(2, "big") + (8).to_bytes(4, "big")
        + (1).to_bytes(2, "big")
        + (0x0112).to_bytes(2, "big") + (3).to_bytes(2, "big")
        + (1).to_bytes(4, "big") + (8).to_bytes(2, "big") + b"\x00\x00"
        + (0).to_bytes(4, "big")
    )
    assert _exif_orientation(b"Exif\x00\x00" + tiff) == 8
    # out-of-range orientation value falls back to normal
    bad = tiff.replace((8).to_bytes(2, "big") + b"\x00\x00", (9).to_bytes(2, "big") + b"\x00\x00", 1)
    assert _exif_orientation(b"Exif\x00\x00" + bad) == 1
