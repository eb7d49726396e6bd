# -*- coding: utf-8 -*-
"""Embedded media metadata extraction (operators/metadata.py).

Each parser is pinned against its deterministic builder twin, and —
load-bearing for the composition story — every spliced payload must
STILL decode through the codec tier (the walkers skip unknown chunks /
segments / extensions)."""

import numpy as np
import pytest

from intelligent_ocr_spark.operators.audio import decode_wav, encode_wav
from intelligent_ocr_spark.operators.metadata import (
    encode_exif,
    encode_id3v1_tail,
    encode_id3v2,
    extract_media_metadata,
    gif_with_comment,
    jpeg_with_comment,
    jpeg_with_exif,
    parse_media_metadata,
    png_with_text,
    with_riff_metadata,
)
from intelligent_ocr_spark.operators.multimodal import (
    decode_gif,
    decode_jpeg,
    decode_png,
    encode_gif,
    encode_jpeg,
    encode_png,
)
from intelligent_ocr_spark.operators.video import decode_avi, encode_avi_mjpeg

_IMG = np.full((8, 8, 3), 90, dtype=np.uint8)


def test_riff_info_and_embedded_id3v2_wav():
    wav = with_riff_metadata(
        encode_wav(np.zeros((16, 1)), 8000),
        info={"INAM": "Song", "IART": "Artist", "ICRD": "2001-02-03"},
        id3_tags={"TIT2": "Song", "TPE1": "Ünïcode"},
    )
    got = parse_media_metadata(wav)
    assert ("riff_info", "title", "INAM", "Song") in got
    assert ("riff_info", "date", "ICRD", "2001-02-03") in got
    assert ("id3v2", "artist", "TPE1", "Ünïcode") in got  # UTF-16 path
    dec = decode_wav(wav)
    assert dec is not None and dec[0].shape == (16, 1)


def test_riff_info_avi_stays_decodable():
    avi = with_riff_metadata(
        encode_avi_mjpeg([_IMG], fps=10), info={"ISFT": "tool v1", "ICMT": "odd"}
    )
    got = dict(((s, k), v) for s, k, _r, v in parse_media_metadata(avi))
    assert got[("riff_info", "software")] == "tool v1"
    assert got[("riff_info", "comment")] == "odd"  # odd len: pad byte honored
    frames, _meta = decode_avi(avi)
    assert len(frames) == 1


@pytest.mark.parametrize("version", [3, 4])
def test_id3v2_versions_roundtrip(version):
    tag = encode_id3v2(
        {"TIT2": "Title", "TALB": "Älbum", "TRCK": "7", "TXXX": "custom"},
        version=version,
    )
    got = {r: (k, v) for _s, k, r, v in parse_media_metadata(tag + b"\x00" * 64)}
    assert got["TIT2"] == ("title", "Title")
    assert got["TALB"] == ("album", "Älbum")
    assert got["TRCK"] == ("track", "7")
    assert got["TXXX"] == ("txxx", "custom")  # unmapped id falls through


def test_id3v1_and_v11_track():
    base = b"\x00" * 256
    v1 = parse_media_metadata(base + encode_id3v1_tail(title="T", comment="c" * 30))
    assert ("id3v1", "comment", "comment", "c" * 30) in v1
    assert all(k != "track" for _s, k, _r, _v in v1)
    v11 = parse_media_metadata(
        base + encode_id3v1_tail(title="T", comment="c", genre=17, track=9)
    )
    d = {k: v for _s, k, _r, v in v11}
    assert d["track"] == "9" and d["genre"] == "17" and d["comment"] == "c"


def test_png_text_and_itxt():
    png = png_with_text(encode_png(_IMG), {"Title": "hello"})
    png = png_with_text(png, {"Comment": "wörld"}, itxt=True)
    got = {(r, k): v for _s, k, r, v in parse_media_metadata(png)}
    assert got[("tEXt", "Title")] == "hello"
    assert got[("iTXt", "Comment")] == "wörld"
    assert decode_png(png) is not None


def test_jpeg_comments_ordered():
    jp = jpeg_with_comment(encode_jpeg(_IMG), "first", "second")
    assert [(k, v) for _s, k, _r, v in parse_media_metadata(jp)] == [
        ("comment", "first"),
        ("comment1", "second"),
    ]
    assert decode_jpeg(jp) is not None


def test_gif_comment_long_subblock_split():
    text = "x" * 600  # forces three 255/255/90 sub-blocks
    gf = gif_with_comment(encode_gif(_IMG), text)
    got = parse_media_metadata(gf)
    assert got == [("gif_comment", "comment", "0xFE", text)]
    assert decode_gif(gf) is not None


_EXIF_TAGS = {
    0x010F: "CamCo",
    0x0110: "Model X",
    0x0132: "2024:01:02 03:04:05",
    0x0112: 6,
    0xA002: 123456,  # > 65535 forces the LONG branch
    0x829A: (1, 250),  # RATIONAL, offset-indirect (8 bytes)
}
_EXIF_GPS = {
    1: "N",
    2: [(37, 1), (48, 1), (3045, 100)],
    3: "W",
    4: [(122, 1), (25, 1), (0, 1)],
    6: (52, 10),
}


@pytest.mark.parametrize("byte_order", ["little", "big"])
def test_exif_tags_both_byte_orders(byte_order):
    jp = jpeg_with_exif(encode_jpeg(_IMG), _EXIF_TAGS, _EXIF_GPS, byte_order)
    got = {(s, k): (r, v) for s, k, r, v in parse_media_metadata(jp)}
    assert got[("exif", "make")] == ("0x010f", "CamCo")
    assert got[("exif", "model")] == ("0x0110", "Model X")
    assert got[("exif", "datetime")] == ("0x0132", "2024:01:02 03:04:05")
    assert got[("exif", "orientation")] == ("0x0112", "6")
    assert got[("exif", "pixel_x_dimension")] == ("0xa002", "123456")
    assert got[("exif", "exposure_time")] == ("0x829a", "1/250")
    assert got[("exif_gps", "gps_latitude_ref")] == ("0x0001", "N")
    assert got[("exif_gps", "gps_latitude")] == ("0x0002", "37/1 48/1 3045/100")
    assert got[("exif_gps", "gps_longitude")] == ("0x0004", "122/1 25/1 0/1")
    assert got[("exif_gps", "gps_altitude")] == ("0x0006", "52/10")
    # the spliced segment must not break the decoder, and the
    # orientation tag it carries (6 = rotate 90 CW) must be HONORED by
    # the codec tier — metadata and decode read the same bytes
    dec = decode_jpeg(jp)
    assert dec is not None and dec[0].shape == (8, 8, 3)


def test_exif_bare_tiff_and_malformed():
    body = encode_exif({0x0131: "toolX"})
    # bare TIFF payload (no Exif\0\0 prefix) dispatches by II*/MM* magic
    assert parse_media_metadata(body[6:]) == [
        ("exif", "software", "0x0131", "toolX")
    ]
    # truncation anywhere must not raise and yields a (possibly empty) prefix
    for cut in range(0, len(body), 3):
        _parsed = parse_media_metadata(body[6:cut])
    # cyclic IFD pointer chain terminates (seen-set guard): rewrite the
    # sole entry's value field (TIFF offset 18..22) to point back at IFD0
    evil = bytearray(encode_exif({0x8769: 1}, byte_order="little"))
    evil[24:28] = (8).to_bytes(4, "little")
    parse_media_metadata(bytes(evil[6:]))


@pytest.mark.parametrize("byte_order", ["little", "big"])
def test_exif_ifd1_thumbnail_roundtrip(byte_order):
    from intelligent_ocr_spark.operators.metadata import (
        encode_exif,
        exif_thumbnail,
    )

    big = np.full((16, 16, 3), 120, dtype=np.uint8)
    thumb = encode_jpeg(np.full((4, 4, 3), 70, dtype=np.uint8))
    jp = jpeg_with_exif(
        encode_jpeg(big), _EXIF_TAGS, _EXIF_GPS, byte_order, thumbnail=thumb
    )
    # extraction returns the exact embedded bytes, which decode as JPEG
    assert exif_thumbnail(jp) == thumb
    dec = decode_jpeg(exif_thumbnail(jp))
    assert dec is not None and dec[0].shape == (4, 4, 3)
    # the IFD1 census rows surface alongside the IFD0/GPS ones
    got = {(s, k): v for s, k, _r, v in parse_media_metadata(jp)}
    assert got[("exif_thumb", "compression")] == "6"
    assert got[("exif_thumb", "thumbnail_length")] == str(len(thumb))
    assert got[("exif", "make")] == "CamCo"
    # the host image still decodes, and absence returns None
    assert decode_jpeg(jp) is not None
    assert exif_thumbnail(jpeg_with_exif(encode_jpeg(big), _EXIF_TAGS)) is None
    # bare TIFF payloads resolve the thumbnail too
    assert exif_thumbnail(encode_exif({0x010F: "X"}, thumbnail=thumb)[6:]) == thumb


def test_no_metadata_and_garbage_safe():
    assert parse_media_metadata(encode_png(_IMG)) == []
    assert parse_media_metadata(b"") == []
    assert parse_media_metadata(b"RIFF\xff\xff\xff\xffWAVEgarbage") == []
    # truncated spliced payloads must not raise
    tagged = with_riff_metadata(
        encode_wav(np.zeros((8, 1)), 8000), info={"INAM": "t"}
    )
    for cut in (10, 20, len(tagged) // 2, len(tagged) - 3):
        parse_media_metadata(tagged[:cut])


def test_extract_media_metadata_operator(spark):
    rows = [
        (0, bytearray(with_riff_metadata(
            encode_wav(np.zeros((8, 1)), 8000), info={"INAM": "w"}))),
        (1, bytearray(jpeg_with_comment(encode_jpeg(_IMG), "jc"))),
        (2, bytearray(encode_png(_IMG))),  # no tags -> no rows
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = sorted(
        (r.doc_id, r.source, r.key, r.value)
        for r in extract_media_metadata(df).collect()
    )
    assert got == [
        (0, "riff_info", "title", "w"),
        (1, "jpeg_com", "comment", "jc"),
    ]
