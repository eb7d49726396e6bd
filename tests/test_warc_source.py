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
