"""CDX(J) source: file surface ≡ in-memory parse, gz transparency,
malformed-line handling, and the digest-dedup ledger."""

import gzip

from pyspark.sql import functions as F

from intelligent_ocr_spark.sources.cdx import (
    cdx_exact_dups,
    parse_cdxj_lines,
    read_cdxj,
)

LINES = [
    'example,h0)/a 20240101120000 {"url": "http://h0.example/a", '
    '"status": "200", "digest": "d1", "filename": "s.warc.gz", '
    '"offset": "0", "length": "10"}',
    'example,h0)/a 20240201120000 {"url": "http://h0.example/a", '
    '"status": "200", "digest": "d1", "filename": "s.warc.gz", '
    '"offset": "900", "length": "10"}',
    'example,h1)/b 20240101130000 {"url": "http://h1.example/b", '
    '"status": "404", "digest": "d2", "filename": "s.warc.gz", '
    '"offset": "450", "length": "7"}',
    "this line is not cdxj at all",
    'example,h2)/c 20240101140000 {"status": "200"}',  # no url/digest
]


def test_file_surface_matches_inmemory_parse(spark, tmp_path):
    plain = tmp_path / "idx.cdxj"
    plain.write_text("\n".join(LINES) + "\n")
    gz = tmp_path / "idx.cdxj.gz"
    gz.write_bytes(gzip.compress(("\n".join(LINES) + "\n").encode()))

    mem = parse_cdxj_lines(
        spark.createDataFrame([(l,) for l in LINES], "line string")
    )
    want = sorted(map(tuple, mem.collect()), key=repr)
    got_plain = sorted(map(tuple, read_cdxj(spark, str(plain)).collect()), key=repr)
    got_gz = sorted(map(tuple, read_cdxj(spark, str(gz)).collect()), key=repr)
    assert got_plain == want
    assert got_gz == want


def test_parse_fields_and_malformed(spark):
    rows = {
        r["surt"]: r
        for r in parse_cdxj_lines(
            spark.createDataFrame([(l,) for l in LINES], "line string")
        ).collect()
    }
    a = rows["example,h0)/a"]  # first occurrence keys don't collide in dict? two rows share surt
    assert a["url"] == "http://h0.example/a" and a["digest"] == "d1"
    assert a["offset"] in (0, 900) and a["length"] == 10
    b = rows["example,h1)/b"]
    assert b["status"] == "404" and b["ts14"] == "20240101130000"
    # malformed line: every field NULL, row retained
    assert None in rows and rows[None]["url"] is None
    # JSON without url/digest: surt/ts parse, JSON fields NULL
    c = rows["example,h2)/c"]
    assert c["ts14"] == "20240101140000" and c["digest"] is None


def test_digest_ledger(spark):
    parsed = parse_cdxj_lines(
        spark.createDataFrame([(l,) for l in LINES], "line string")
    )
    (g,) = cdx_exact_dups(parsed).collect()
    assert g["digest"] == "d1"
    assert g["n_captures"] == 2 and g["n_urls"] == 1
    assert g["first_ts"] == "20240101120000" and g["last_ts"] == "20240201120000"
    assert g["sample_url"] == "http://h0.example/a"


def test_parse_is_jvm_side(spark):
    df = spark.createDataFrame([(l,) for l in LINES], "line string")
    plan = (
        parse_cdxj_lines(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
