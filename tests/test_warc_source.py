"""WARC source tests: synthetic WARC round-trips through the reader into
the pages shape and the extraction output matches direct extraction."""

import os

from intelligent_ocr_spark.operators.extract import extract_pages
from intelligent_ocr_spark.sources.pages import gen_row, pages_df
from intelligent_ocr_spark.sources.warc import (
    parse_warc_bytes,
    read_warc_pages,
    write_synthetic_warc,
)

N = 60


def _rows():
    return [gen_row(i) for i in range(N)]


def test_parse_roundtrip_pure():
    rows = [r for r in _rows() if r["html"] is not None]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "a.warc")
        write_synthetic_warc(path, rows)
        parsed = parse_warc_bytes(open(path, "rb").read())
    assert len(parsed) == len(rows)
    by_url = {p["url"]: p for p in parsed}
    for r in rows:
        assert bytes(by_url[r["url"]]["html"]) == bytes(r["html"])


def test_warc_reader_to_extraction(spark, tmp_path):
    rows = _rows()
    # two WARC chunks, like Common Crawl segments
    write_synthetic_warc(str(tmp_path / "seg-0.warc"), rows[: N // 2])
    write_synthetic_warc(str(tmp_path / "seg-1.warc"), rows[N // 2 :])

    pages = read_warc_pages(spark, str(tmp_path / "*.warc"))
    got = {r["url"]: r for r in pages.collect()}
    expected_urls = {r["url"] for r in rows if r["html"] is not None}
    assert set(got) == expected_urls

    # extraction over WARC-sourced pages equals extraction over the
    # generator pages for the same urls (modulo the text fast-path column,
    # which WARC rows don't carry)
    ext_warc = {
        r["url"]: r["extracted_text"]
        for r in extract_pages(read_warc_pages(spark, str(tmp_path / "*.warc"))).collect()
    }
    ext_direct = {
        r["url"]: r["extracted_text"]
        for r in extract_pages(pages_df(spark, N, partitions=2)).collect()
        if r["url"] in expected_urls and not r["skipped"]
    }
    for url, text in ext_direct.items():
        assert ext_warc[url] == text, url


def test_truncated_warc_tail_tolerated(tmp_path):
    rows = [r for r in _rows()[:6] if r["html"] is not None]
    path = str(tmp_path / "t.warc")
    write_synthetic_warc(path, rows)
    payload = open(path, "rb").read()
    parsed = parse_warc_bytes(payload[: int(len(payload) * 0.7)])
    assert 0 < len(parsed) < len(rows)  # truncated tail dropped, no crash


def test_corrupted_content_length_resyncs(tmp_path):
    """A record whose Content-Length header is corrupted must not swallow
    every subsequent record — the parser resyncs on the next marker."""
    rows = [r for r in _rows()[:9] if r["html"] is not None]
    path = str(tmp_path / "c.warc")
    write_synthetic_warc(path, rows)
    payload = open(path, "rb").read()
    # corrupt the SECOND record's Content-Length value
    first = payload.find(b"WARC-Type: response")
    second = payload.find(b"Content-Length:", payload.find(b"WARC/1.0", first + 1))
    corrupted = payload[:second] + b"Content-Length: oops" + payload[
        payload.find(b"\r\n", second):
    ]
    parsed = parse_warc_bytes(corrupted)
    assert len(parsed) == len(rows) - 1  # only the corrupted record is lost


def test_garbage_resync(tmp_path):
    rows = [r for r in _rows()[:4] if r["html"] is not None]
    path = str(tmp_path / "g.warc")
    write_synthetic_warc(path, rows)
    payload = b"\xff\xfegarbage prefix" + _crlf_pad() + open(path, "rb").read()
    parsed = parse_warc_bytes(payload)
    assert len(parsed) == len(rows)  # resynced on the WARC/1. marker


def _crlf_pad() -> bytes:
    return b"\r\n\r\n"


# ---- .warc.gz (Common Crawl's real layout: one gzip member per record) ----


def test_gzip_roundtrip_matches_plain(tmp_path):
    rows = [r for r in _rows() if r["html"] is not None]
    plain, gz = str(tmp_path / "a.warc"), str(tmp_path / "a.warc.gz")
    write_synthetic_warc(plain, rows)
    write_synthetic_warc(gz, rows)
    p_plain = parse_warc_bytes(open(plain, "rb").read())
    p_gz = parse_warc_bytes(open(gz, "rb").read())
    assert p_gz == p_plain and len(p_gz) == len(rows)


def test_gzip_whole_file_single_member(tmp_path):
    """Some tools gzip the whole WARC as ONE member — still parses."""
    import gzip

    rows = [r for r in _rows()[:10] if r["html"] is not None]
    plain = str(tmp_path / "a.warc")
    write_synthetic_warc(plain, rows)
    payload = gzip.compress(open(plain, "rb").read(), mtime=0)
    assert len(parse_warc_bytes(payload)) == len(rows)


def test_gzip_corrupt_member_resyncs(tmp_path):
    """Flipping bytes inside one member loses only that record."""
    rows = [r for r in _rows()[:9] if r["html"] is not None]
    gz = str(tmp_path / "c.warc.gz")
    write_synthetic_warc(gz, rows)
    payload = bytearray(open(gz, "rb").read())
    # find the 3rd member start (warcinfo + record0 + record1) and corrupt
    # bytes INSIDE that member, past its gzip header
    starts = []
    i = payload.find(b"\x1f\x8b")
    while i >= 0:
        starts.append(i)
        i = payload.find(b"\x1f\x8b", i + 2)
    mid = starts[2] + 20
    for j in range(mid, mid + 8):
        payload[j] ^= 0xFF
    parsed = parse_warc_bytes(bytes(payload))
    # exactly one record lost (corruption can at most also desync into the
    # next member boundary; resync guarantees the rest survive)
    assert len(rows) - 2 <= len(parsed) < len(rows)


def test_gzip_truncated_tail(tmp_path):
    rows = [r for r in _rows()[:6] if r["html"] is not None]
    gz = str(tmp_path / "t.warc.gz")
    write_synthetic_warc(gz, rows)
    payload = open(gz, "rb").read()
    parsed = parse_warc_bytes(payload[: int(len(payload) * 0.7)])
    assert 0 < len(parsed) < len(rows)


def test_gzip_reader_through_spark(spark, tmp_path):
    rows = _rows()
    write_synthetic_warc(str(tmp_path / "seg-0.warc.gz"), rows[: N // 2])
    write_synthetic_warc(str(tmp_path / "seg-1.warc.gz"), rows[N // 2 :])
    pages = read_warc_pages(spark, str(tmp_path / "*.warc.gz"))
    got = {r["url"] for r in pages.collect()}
    assert got == {r["url"] for r in rows if r["html"] is not None}
