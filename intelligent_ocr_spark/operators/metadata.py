"""Embedded media metadata extraction — RIFF INFO, ID3v1/v2, PNG
tEXt/iTXt, JPEG COM and GIF comment blocks, as one long-format Spark
operator.

A crawl pipeline wants the tags *inside* media payloads (title, artist,
creation date, authoring software, free-text comments) for provenance,
licensing triage and quality filtering — without handing the bytes to a
full decoder. This tier parses exactly the container-level metadata
structures of the formats the codec tier already speaks:

* **RIFF ``LIST``/``INFO``** (WAV + AVI): fourcc → NUL-terminated
  string sub-chunks (``INAM`` title, ``IART`` artist, ``ICRD`` date,
  ``ISFT`` software, …), word-aligned exactly like the codec walkers.
* **ID3v2.3/2.4** — either standalone at the payload head or embedded
  in a RIFF ``id3 `` chunk (the common WAV arrangement): syncsafe
  header size, per-version frame size rules (v2.3 plain big-endian,
  v2.4 syncsafe), text frames in all four declared encodings
  (latin-1, UTF-16 w/BOM, UTF-16BE, UTF-8), padding stop.
* **ID3v1/1.1**: the fixed 128-byte ``TAG`` trailer, with the v1.1
  comment[28]==0 track convention.
* **PNG ``tEXt``/``iTXt``** (uncompressed): keyword→value pairs per
  the PNG chunk walk; iTXt text is UTF-8 with language/translated
  keyword fields skipped.
* **JPEG ``COM``** segments: marker walk up to SOS, any count.
* **GIF comment extensions** (0x21 0xFE): full block walk including
  image sub-block skipping, so comments after the first frame are
  still found.

Every parser has a deterministic builder twin that SPLICES tags into
an existing encoder payload (``with_riff_metadata``, ``png_with_text``,
``jpeg_with_comment``, ``gif_with_comment``, ``encode_id3v2``,
``encode_id3v1_tail``) — the spliced payload stays decodable by the
codec tier (its walkers skip unknown chunks/segments/extensions), which
the tests pin.

Spark shape: ``extract_media_metadata`` is the standard zero-exchange
Scan→MapInPandas media stage with a 1-row→n-tags fan-out; rows carry
(source, key, raw_key, value) so a 100 TB metadata census is a plain
groupBy away.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from intelligent_ocr_spark.util import ensure_parallelism

__all__ = [
    "MEDIA_METADATA_SCHEMA",
    "parse_media_metadata",
    "extract_media_metadata",
    "encode_id3v2",
    "encode_id3v1_tail",
    "riff_info_list",
    "with_riff_metadata",
    "png_with_text",
    "jpeg_with_comment",
    "jpeg_with_exif",
    "gif_with_comment",
    "encode_exif",
    "exif_thumbnail",
]

MEDIA_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("key", T.StringType(), True),
        T.StructField("raw_key", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
    ]
)

# RIFF INFO fourcc → normalized key (the widely-used subset)
_RIFF_INFO_KEYS = {
    b"INAM": "title",
    b"IART": "artist",
    b"IPRD": "album",
    b"ICRD": "date",
    b"ICMT": "comment",
    b"ISFT": "software",
    b"IGNR": "genre",
    b"ICOP": "copyright",
    b"IENG": "engineer",
    b"ISBJ": "subject",
}

# ID3v2 text-frame id → normalized key
_ID3V2_KEYS = {
    "TIT2": "title",
    "TPE1": "artist",
    "TALB": "album",
    "TYER": "year",
    "TDRC": "date",
    "TCON": "genre",
    "TRCK": "track",
    "TCOM": "composer",
    "TENC": "encoder",
    "TSSE": "software",
}


def _zstr(body: bytes) -> str:
    """NUL-terminated RIFF string: cut at the first NUL, decode UTF-8
    with a latin-1 fallback (INFO is historically cp1252-ish)."""
    raw = body.split(b"\x00", 1)[0]
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def _syncsafe(n: int) -> bytes:
    return bytes((n >> s) & 0x7F for s in (21, 14, 7, 0))


def _read_syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


# Exif IFD0 / Exif-IFD tag → normalized key (the provenance subset)
_EXIF_KEYS = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0131: "software",
    0x0132: "datetime",
    0x829A: "exposure_time",
    0x8827: "iso",
    0x920A: "focal_length",
    0x9003: "datetime_original",
    0xA002: "pixel_x_dimension",
    0xA003: "pixel_y_dimension",
}
_GPS_KEYS = {
    0x0001: "gps_latitude_ref",
    0x0002: "gps_latitude",
    0x0003: "gps_longitude_ref",
    0x0004: "gps_longitude",
    0x0005: "gps_altitude_ref",
    0x0006: "gps_altitude",
}
# IFD1 (thumbnail IFD) tags worth surfacing in a census; the offset tag
# 0x0201 is layout, not metadata — exif_thumbnail() follows it instead.
_THUMB_KEYS = {
    0x0103: "compression",
    0x0112: "orientation",
    0x0202: "thumbnail_length",
}
# TIFF field type → byte size (the types Exif actually uses)
_TIFF_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


# ---------------------------------------------------------------------------
# parsers
# ---------------------------------------------------------------------------


def _parse_id3v2(buf: bytes) -> list[tuple[str, str, str]]:
    """ID3v2.3/2.4 text frames → (source, key, raw_key, value) triples
    (source omitted — caller adds it). Unknown/binary frames skipped;
    stops at padding. Returns [] for non-ID3 bytes."""
    if len(buf) < 10 or buf[:3] != b"ID3":
        return []
    major = buf[3]
    if major not in (3, 4):
        return []
    flags = buf[5]
    size = _read_syncsafe(buf[6:10])
    end = min(10 + size, len(buf))
    pos = 10
    if flags & 0x40 and pos + 4 <= end:  # extended header: skip it
        ext = (
            _read_syncsafe(buf[pos : pos + 4])
            if major == 4
            else int.from_bytes(buf[pos : pos + 4], "big") + 4
        )
        pos += ext
    out: list[tuple[str, str, str]] = []
    while pos + 10 <= end:
        fid = buf[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        fsize = (
            _read_syncsafe(buf[pos + 4 : pos + 8])
            if major == 4
            else int.from_bytes(buf[pos + 4 : pos + 8], "big")
        )
        body = buf[pos + 10 : pos + 10 + fsize]
        pos += 10 + fsize
        if len(body) < 1 or not fid.startswith(b"T"):
            continue
        enc, text = body[0], body[1:]
        try:
            if enc == 0:
                val = text.decode("latin-1")
            elif enc == 1:
                val = text.decode("utf-16")
            elif enc == 2:
                val = text.decode("utf-16-be")
            elif enc == 3:
                val = text.decode("utf-8")
            else:
                continue
        except UnicodeDecodeError:
            continue
        val = val.rstrip("\x00")
        raw = fid.decode("ascii", "replace")
        out.append((_ID3V2_KEYS.get(raw, raw.lower()), raw, val))
    return out


def _parse_id3v1(payload: bytes) -> list[tuple[str, str, str]]:
    """ID3v1/1.1 trailer (last 128 bytes == 'TAG' + fixed fields)."""
    if len(payload) < 128:
        return []
    t = payload[-128:]
    if t[:3] != b"TAG":
        return []

    def field(lo: int, hi: int) -> str:
        return t[lo:hi].split(b"\x00", 1)[0].decode("latin-1").strip()

    out = []
    for key, lo, hi in (
        ("title", 3, 33),
        ("artist", 33, 63),
        ("album", 63, 93),
        ("year", 93, 97),
    ):
        v = field(lo, hi)
        if v:
            out.append((key, key, v))
    if t[125] == 0 and t[126] != 0:  # ID3v1.1: track in comment[29]
        c = field(97, 125)
        if c:
            out.append(("comment", "comment", c))
        out.append(("track", "track", str(t[126])))
    else:
        c = field(97, 127)
        if c:
            out.append(("comment", "comment", c))
    out.append(("genre", "genre", str(t[127])))
    return out


def _parse_riff(payload: bytes) -> list[tuple[str, str, str, str]]:
    """RIFF (WAV/AVI): LIST/INFO sub-chunks + an embedded ``id3 ``
    chunk. Walks top-level chunks only — INFO lists sit at top level in
    both containers."""
    out: list[tuple[str, str, str, str]] = []
    pos, n = 12, len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            break
        if cid == b"LIST" and body[:4] == b"INFO":
            sub = 4
            while sub + 8 <= len(body):
                scid = body[sub : sub + 4]
                ssize = int.from_bytes(body[sub + 4 : sub + 8], "little")
                sbody = body[sub + 8 : sub + 8 + ssize]
                if len(sbody) < ssize:
                    break
                raw = scid.decode("ascii", "replace")
                out.append(
                    (
                        "riff_info",
                        _RIFF_INFO_KEYS.get(scid, raw.lower()),
                        raw,
                        _zstr(sbody),
                    )
                )
                sub += 8 + ssize + (ssize & 1)
        elif cid in (b"id3 ", b"ID3 "):
            out.extend(("id3v2", k, r, v) for k, r, v in _parse_id3v2(body))
        pos += 8 + size + (size & 1)
    return out


def _parse_png_text(payload: bytes) -> list[tuple[str, str, str, str]]:
    out: list[tuple[str, str, str, str]] = []
    pos, n = 8, len(payload)
    while pos + 8 <= n:
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            break
        if typ == b"tEXt" and b"\x00" in data:
            kw, val = data.split(b"\x00", 1)
            out.append(
                ("png_text", kw.decode("latin-1"), "tEXt", val.decode("latin-1"))
            )
        elif typ == b"iTXt" and data.count(b"\x00") >= 4:
            kw, rest = data.split(b"\x00", 1)
            if len(rest) >= 2 and rest[0] == 0:  # uncompressed only
                _lang, rest2 = rest[2:].split(b"\x00", 1)
                _tkw, text = rest2.split(b"\x00", 1)
                try:
                    out.append(
                        ("png_text", kw.decode("latin-1"), "iTXt", text.decode("utf-8"))
                    )
                except UnicodeDecodeError:
                    pass
        elif typ == b"IEND":
            break
        pos += 12 + ln
    return out


def _tiff_value(t: bytes, bo: str, typ: int, count: int, entry_val: bytes) -> str | None:
    """One TIFF entry's value as a canonical string: ASCII verbatim
    (NUL-stripped), integer types space-joined decimal, RATIONALs
    space-joined ``num/den``. Values wider than 4 bytes follow the
    entry's offset indirection. None for unknown types / truncation."""
    size = _TIFF_SIZES.get(typ)
    if size is None or count <= 0 or count > 1 << 16:
        return None
    total = size * count
    if total <= 4:
        raw = entry_val[:total]
    else:
        off = int.from_bytes(entry_val, bo)
        raw = t[off : off + total]
    if len(raw) < total:
        return None
    if typ == 2:
        return raw.split(b"\x00", 1)[0].decode("latin-1")
    vals = []
    for i in range(count):
        chunk = raw[i * size : (i + 1) * size]
        if typ in (5, 10):  # (S)RATIONAL
            signed = typ == 10
            num = int.from_bytes(chunk[:4], bo, signed=signed)
            den = int.from_bytes(chunk[4:], bo, signed=signed)
            vals.append(f"{num}/{den}")
        else:
            vals.append(str(int.from_bytes(chunk, bo, signed=typ == 9)))
    return " ".join(vals)


def _parse_exif(app1: bytes) -> list[tuple[str, str, str, str]]:
    """APP1 Exif → (source, key, raw_key, value) rows: IFD0 walk plus
    the Exif-IFD (0x8769) and GPS-IFD (0x8825) pointer chains, both
    byte orders, offset-indirect ASCII/RATIONAL values. Unknown tags
    are skipped (the census is over the provenance subset); malformed
    structures yield whatever parsed before the break — metadata must
    never fail a payload."""
    out: list[tuple[str, str, str, str]] = []
    try:
        if app1[:6] != b"Exif\x00\x00":
            return out
        t = app1[6:]
        bo = {b"II": "little", b"MM": "big"}.get(t[:2])
        if bo is None or int.from_bytes(t[2:4], bo) != 42:
            return out
        queue = [(int.from_bytes(t[4:8], bo), _EXIF_KEYS, "exif", True)]
        seen: set[int] = set()
        while queue:
            ifd, keys, source, is_ifd0 = queue.pop(0)
            if ifd in seen or len(seen) > 8:
                continue
            seen.add(ifd)
            n = int.from_bytes(t[ifd : ifd + 2], bo)
            for i in range(min(n, 256)):
                e = t[ifd + 2 + 12 * i : ifd + 14 + 12 * i]
                if len(e) < 12:
                    break
                tag = int.from_bytes(e[0:2], bo)
                typ = int.from_bytes(e[2:4], bo)
                count = int.from_bytes(e[4:8], bo)
                if tag == 0x8769:
                    queue.append(
                        (int.from_bytes(e[8:12], bo), _EXIF_KEYS, "exif", False)
                    )
                elif tag == 0x8825:
                    queue.append(
                        (int.from_bytes(e[8:12], bo), _GPS_KEYS, "exif_gps", False)
                    )
                elif tag in keys:
                    v = _tiff_value(t, bo, typ, count, e[8:12])
                    if v is not None:
                        out.append((source, keys[tag], f"0x{tag:04x}", v))
            if is_ifd0:  # IFD0's next-IFD pointer chains to the thumbnail IFD
                nxt = int.from_bytes(t[ifd + 2 + 12 * n : ifd + 6 + 12 * n], bo)
                if nxt:
                    queue.append((nxt, _THUMB_KEYS, "exif_thumb", False))
    except (IndexError, ValueError):
        pass
    return out


def _tiff_thumbnail(t: bytes, bo: str) -> bytes | None:
    """The IFD1 JPEG thumbnail bytes (tags 0x0201/0x0202), or None."""
    try:
        ifd = int.from_bytes(t[4:8], bo)
        n = int.from_bytes(t[ifd : ifd + 2], bo)
        ifd1 = int.from_bytes(t[ifd + 2 + 12 * n : ifd + 6 + 12 * n], bo)
        if not ifd1:
            return None
        off = length = None
        n1 = int.from_bytes(t[ifd1 : ifd1 + 2], bo)
        for i in range(min(n1, 256)):
            e = t[ifd1 + 2 + 12 * i : ifd1 + 14 + 12 * i]
            if len(e) < 12:
                return None
            tag = int.from_bytes(e[0:2], bo)
            if tag == 0x0201:
                off = int.from_bytes(e[8:12], bo)
            elif tag == 0x0202:
                length = int.from_bytes(e[8:12], bo)
        if off is None or not length:
            return None
        raw = t[off : off + length]
        return raw if len(raw) == length else None
    except (IndexError, ValueError):
        return None


def exif_thumbnail(payload: bytes) -> bytes | None:
    """The embedded Exif IFD1 thumbnail (itself a JPEG) from a JPEG
    payload's APP1 segment, or from a bare TIFF payload — None when
    absent or malformed. The extracted bytes feed straight back into
    the codec tier (``decode_jpeg``)."""
    candidates: list[bytes] = []
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        candidates.append(payload)
    elif payload[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(payload) and payload[pos] == 0xFF:
            marker = payload[pos + 1]
            pos += 2
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue
            if marker in (0xD9, 0xDA):
                break
            ln = int.from_bytes(payload[pos : pos + 2], "big")
            if marker == 0xE1 and payload[pos + 2 : pos + 8] == b"Exif\x00\x00":
                candidates.append(payload[pos + 8 : pos + ln])
            pos += ln
    for t in candidates:
        bo = {b"II": "little", b"MM": "big"}.get(t[:2])
        if bo is None:
            continue
        thumb = _tiff_thumbnail(t, bo)
        if thumb is not None:
            return thumb
    return None


def _parse_jpeg_comments(payload: bytes) -> list[tuple[str, str, str, str]]:
    out: list[tuple[str, str, str, str]] = []
    if payload[:2] != b"\xff\xd8":
        return out
    pos, idx = 2, 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            break
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS: comments precede scans
            break
        ln = int.from_bytes(payload[pos : pos + 2], "big")
        if marker == 0xFE:
            try:
                val = payload[pos + 2 : pos + ln].decode("utf-8")
            except UnicodeDecodeError:
                val = payload[pos + 2 : pos + ln].decode("latin-1")
            out.append(("jpeg_com", f"comment{idx}" if idx else "comment", "COM", val))
            idx += 1
        elif marker == 0xE1:  # APP1: Exif provenance tags
            out.extend(_parse_exif(payload[pos + 2 : pos + ln]))
        pos += ln
    return out


def _parse_gif_comments(payload: bytes) -> list[tuple[str, str, str, str]]:
    out: list[tuple[str, str, str, str]] = []
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        return out
    try:
        pos = 6
        packed = payload[pos + 4]
        pos += 7
        if packed & 0x80:
            pos += 3 * (2 << (packed & 0x07))
        idx = 0
        while pos < len(payload):
            b0 = payload[pos]
            pos += 1
            if b0 == 0x21:
                label = payload[pos]
                pos += 1
                parts = bytearray()
                while payload[pos] != 0:
                    ln = payload[pos]
                    parts += payload[pos + 1 : pos + 1 + ln]
                    pos += 1 + ln
                pos += 1
                if label == 0xFE:
                    out.append(
                        (
                            "gif_comment",
                            f"comment{idx}" if idx else "comment",
                            "0xFE",
                            bytes(parts).decode("utf-8", "replace"),
                        )
                    )
                    idx += 1
            elif b0 == 0x2C:  # image: descriptor + LCT + lzw sub-blocks
                ipacked = payload[pos + 8]
                pos += 9
                if ipacked & 0x80:
                    pos += 3 * (2 << (ipacked & 0x07))
                pos += 1  # LZW min code size
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            elif b0 == 0x3B:
                break
            else:
                break
    except IndexError:
        pass
    return out


def parse_media_metadata(payload: bytes) -> list[tuple[str, str, str, str]]:
    """binary payload → [(source, key, raw_key, value)] in parse order.
    Dispatch is by magic bytes; a payload with no recognized metadata
    (or no metadata at all) returns []."""
    if payload[:4] == b"RIFF":
        out = _parse_riff(payload)
        out.extend(("id3v1", k, r, v) for k, r, v in _parse_id3v1(payload))
        return out
    if payload[:3] == b"ID3":
        out = [("id3v2", k, r, v) for k, r, v in _parse_id3v2(payload)]
        out.extend(("id3v1", k, r, v) for k, r, v in _parse_id3v1(payload))
        return out
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _parse_png_text(payload)
    if payload[:2] == b"\xff\xd8":
        return _parse_jpeg_comments(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):  # bare TIFF container
        return _parse_exif(b"Exif\x00\x00" + payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _parse_gif_comments(payload)
    if len(payload) >= 128:
        return [("id3v1", k, r, v) for k, r, v in _parse_id3v1(payload)]
    return []


# ---------------------------------------------------------------------------
# builder twins (splice metadata into existing encoder payloads)
# ---------------------------------------------------------------------------


def encode_id3v2(tags: dict[str, str], version: int = 3) -> bytes:
    """ID3v2.3 or v2.4 tag block from {frame_id: value}. v2.3 frames
    use latin-1 where possible else UTF-16 w/BOM; v2.4 uses UTF-8 and
    syncsafe frame sizes."""
    if version not in (3, 4):
        raise ValueError("ID3v2.3 or v2.4 only")
    frames = bytearray()
    for fid, val in tags.items():
        if version == 4:
            body = b"\x03" + val.encode("utf-8")
        else:
            try:
                body = b"\x00" + val.encode("latin-1")
            except UnicodeEncodeError:
                body = b"\x01" + val.encode("utf-16")
        size = _syncsafe(len(body)) if version == 4 else len(body).to_bytes(4, "big")
        frames += fid.encode("ascii") + size + b"\x00\x00" + body
    return b"ID3" + bytes([version, 0, 0]) + _syncsafe(len(frames)) + bytes(frames)


def encode_id3v1_tail(
    title: str = "",
    artist: str = "",
    album: str = "",
    year: str = "",
    comment: str = "",
    genre: int = 255,
    track: int | None = None,
) -> bytes:
    """The fixed 128-byte ID3v1 (or v1.1 when ``track`` is set) trailer."""

    def pad(s: str, n: int) -> bytes:
        return s.encode("latin-1")[:n].ljust(n, b"\x00")

    if track is not None:
        cfield = pad(comment, 28) + b"\x00" + bytes([track])
    else:
        cfield = pad(comment, 30)
    return (
        b"TAG"
        + pad(title, 30)
        + pad(artist, 30)
        + pad(album, 30)
        + pad(year, 4)
        + cfield
        + bytes([genre])
    )


def riff_info_list(tags: dict[str, str]) -> bytes:
    """A RIFF ``LIST``/``INFO`` chunk from {fourcc: value} (fourcc like
    'INAM'); values are NUL-terminated and word-aligned per spec."""
    body = bytearray(b"INFO")
    for fourcc, val in tags.items():
        data = val.encode("utf-8") + b"\x00"
        body += fourcc.encode("ascii") + len(data).to_bytes(4, "little") + data
        if len(data) & 1:
            body += b"\x00"
    return b"LIST" + len(body).to_bytes(4, "little") + bytes(body)


def with_riff_metadata(
    payload: bytes,
    info: dict[str, str] | None = None,
    id3_tags: dict[str, str] | None = None,
    id3_version: int = 3,
) -> bytes:
    """Splice LIST/INFO and/or an ``id3 `` chunk onto an existing RIFF
    payload (WAV or AVI), rewriting the outer RIFF size. The codec
    walkers skip unknown chunks, so the result stays decodable."""
    if payload[:4] != b"RIFF":
        raise ValueError("not a RIFF payload")
    extra = bytearray()
    if info:
        extra += riff_info_list(info)
    if id3_tags:
        tag = encode_id3v2(id3_tags, id3_version)
        extra += b"id3 " + len(tag).to_bytes(4, "little") + tag
        if len(tag) & 1:
            extra += b"\x00"
    new_size = int.from_bytes(payload[4:8], "little") + len(extra)
    return b"RIFF" + new_size.to_bytes(4, "little") + payload[8:] + bytes(extra)


def png_with_text(payload: bytes, pairs: dict[str, str], itxt: bool = False) -> bytes:
    """Splice tEXt (latin-1) or uncompressed iTXt (UTF-8) chunks just
    before IEND of an existing PNG."""
    from intelligent_ocr_spark.operators.multimodal import _png_chunk

    iend = payload.rfind(b"IEND")
    if payload[:8] != b"\x89PNG\r\n\x1a\n" or iend < 8:
        raise ValueError("not a PNG payload")
    cut = iend - 4  # back up over the length field
    chunks = bytearray()
    for kw, val in pairs.items():
        if itxt:
            data = kw.encode("latin-1") + b"\x00\x00\x00\x00\x00" + val.encode("utf-8")
            chunks += _png_chunk(b"iTXt", data)
        else:
            chunks += _png_chunk(
                b"tEXt", kw.encode("latin-1") + b"\x00" + val.encode("latin-1")
            )
    return payload[:cut] + bytes(chunks) + payload[cut:]


def _tiff_encode_value(val, bo: str) -> tuple[int, int, bytes]:
    """Python value → (type, count, raw bytes): str → ASCII(2)
    NUL-terminated, int → SHORT(3)/LONG(4), a (num, den) int pair or an
    iterable of pairs → RATIONAL(5)."""
    if isinstance(val, str):
        data = val.encode("latin-1") + b"\x00"
        return 2, len(data), data
    if isinstance(val, int):
        if 0 <= val < 1 << 16:
            return 3, 1, val.to_bytes(2, bo)
        return 4, 1, val.to_bytes(4, bo)
    pairs = (
        [val]
        if isinstance(val, tuple) and len(val) == 2 and isinstance(val[0], int)
        else list(val)
    )
    data = b"".join(n.to_bytes(4, bo) + d.to_bytes(4, bo) for n, d in pairs)
    return 5, len(pairs), data


def encode_exif(
    tags: dict[int, object],
    gps: dict[int, object] | None = None,
    byte_order: str = "little",
    thumbnail: bytes | None = None,
) -> bytes:
    """An APP1 Exif body (``Exif\\0\\0`` + TIFF) from {tag: value}
    dicts for IFD0 and (optionally) a GPS IFD reached through the
    0x8825 pointer, plus an optional IFD1 JPEG ``thumbnail`` chained
    from IFD0's next-IFD offset (compression 6 + the 0x0201/0x0202
    offset/length pair). Values wider than 4 bytes (ASCII strings,
    RATIONALs) go to a trailing data area with offset indirection —
    i.e. the real TIFF layout, not just the inline-SHORT subset the
    orientation twin writes. Entries are tag-sorted per spec."""
    bo = byte_order
    bom = b"II" if bo == "little" else b"MM"

    def entries_of(d: dict[int, object]) -> list[tuple[int, int, int, bytes]]:
        return [(tag, *_tiff_encode_value(v, bo)) for tag, v in sorted(d.items())]

    ifd0 = entries_of(tags)
    gps_entries = entries_of(gps) if gps else []
    ifd0_n = len(ifd0) + (1 if gps_entries else 0)
    ifd0_size = 2 + 12 * ifd0_n + 4
    gps_off = 8 + ifd0_size
    gps_size = (2 + 12 * len(gps_entries) + 4) if gps_entries else 0
    ifd1_off = gps_off + gps_size
    ifd1_size = (2 + 12 * 3 + 4) if thumbnail is not None else 0
    data_off = ifd1_off + ifd1_size
    # the thumbnail sits at the head of the data area so its offset is
    # known before any IFD renders
    data = bytearray(thumbnail or b"")

    def render(
        entries: list[tuple[int, int, int, bytes]], next_off: int = 0
    ) -> bytes:
        buf = bytearray(len(entries).to_bytes(2, bo))
        for tag, typ, count, vbytes in sorted(entries):
            if len(vbytes) <= 4:
                field = vbytes.ljust(4, b"\x00")  # left-justified per TIFF
            else:
                off = data_off + len(data)
                if off & 1:  # word-align offset values
                    data.append(0)
                    off += 1
                field = off.to_bytes(4, bo)
                data.extend(vbytes)
            buf += (
                tag.to_bytes(2, bo)
                + typ.to_bytes(2, bo)
                + count.to_bytes(4, bo)
                + field
            )
        buf += next_off.to_bytes(4, bo)
        return bytes(buf)

    if gps_entries:
        ifd0 = ifd0 + [(0x8825, 4, 1, gps_off.to_bytes(4, bo))]
    out = bom + (42).to_bytes(2, bo) + (8).to_bytes(4, bo)
    out += render(ifd0, ifd1_off if thumbnail is not None else 0)
    if gps_entries:
        out += render(gps_entries)
    if thumbnail is not None:
        out += render(
            [
                (0x0103, 3, 1, (6).to_bytes(2, bo)),
                (0x0201, 4, 1, data_off.to_bytes(4, bo)),
                (0x0202, 4, 1, len(thumbnail).to_bytes(4, bo)),
            ]
        )
    return b"Exif\x00\x00" + out + bytes(data)


def jpeg_with_exif(
    payload: bytes,
    tags: dict[int, object],
    gps: dict[int, object] | None = None,
    byte_order: str = "little",
    thumbnail: bytes | None = None,
) -> bytes:
    """Insert an APP1 Exif segment right after SOI of an existing JPEG
    (the codec walk skips it; orientation-free tags don't change the
    decode)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    body = encode_exif(tags, gps, byte_order, thumbnail)
    seg = b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body
    return payload[:2] + seg + payload[2:]


def jpeg_with_comment(payload: bytes, *comments: str) -> bytes:
    """Insert COM segment(s) right after SOI of an existing JPEG."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    seg = bytearray()
    for c in comments:
        data = c.encode("utf-8")
        seg += b"\xff\xfe" + (len(data) + 2).to_bytes(2, "big") + data
    return payload[:2] + bytes(seg) + payload[2:]


def gif_with_comment(payload: bytes, *comments: str) -> bytes:
    """Insert comment extension block(s) after the (optional) global
    color table of an existing GIF; sub-blocks split at 255 bytes."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    pos = 6
    packed = payload[pos + 4]
    pos += 7
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    blocks = bytearray()
    for c in comments:
        data = c.encode("utf-8")
        blocks += b"\x21\xfe"
        for i in range(0, len(data), 255):
            part = data[i : i + 255]
            blocks += bytes([len(part)]) + part
        blocks += b"\x00"
    return payload[:pos] + bytes(blocks) + payload[pos:]


# ---------------------------------------------------------------------------
# operator
# ---------------------------------------------------------------------------


def extract_media_metadata(
    df: DataFrame, media_col: str = "media", id_col: str = "doc_id"
) -> DataFrame:
    """binary media → one row per embedded tag: (source, key, raw_key,
    value). A payload with no recognized metadata emits nothing — the
    census is over tags, and absence is a closed-form fact the oracle
    states, not a quarantine condition. Zero-exchange Scan→MapInPandas,
    1 row → n tags."""
    pruned = ensure_parallelism(df.select(id_col, media_col))
    cols = [f.name for f in MEDIA_METADATA_SCHEMA.fields]

    def op(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[media_col]):
                if payload is None:
                    continue
                for source, key, raw_key, value in parse_media_metadata(
                    bytes(payload)
                ):
                    out.append(
                        {
                            "doc_id": doc_id,
                            "source": source,
                            "key": key,
                            "raw_key": raw_key,
                            "value": value,
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    return pruned.mapInPandas(op, MEDIA_METADATA_SCHEMA)
