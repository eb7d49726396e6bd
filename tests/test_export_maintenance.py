"""Tests for export formatting (K3/K4), retry ladder (R2/R3), checkpoint
maintenance (A2/C4/C5), and time formatting (X10)."""

import os
import time

import pytest

from pyspark.sql import functions as F

from intelligent_ocr_spark.operators.export import export_markdown, export_txt, format_elapsed
from intelligent_ocr_spark.operators.extract import extract_pages
from intelligent_ocr_spark.plans.checkpoint import config_hash, read_table_dir
from intelligent_ocr_spark.plans.maintenance import (
    classify_error,
    expire_stale_generations,
    incomplete_urls,
    progress,
    recovered_view,
    rerun_failed_with_ladder,
)
from intelligent_ocr_spark.plans.pipeline import run_extraction_job
from intelligent_ocr_spark.sources.pages import pages_df


def test_export_txt_and_md(spark):
    ext = extract_pages(pages_df(spark, 40, partitions=2))
    txt = {r["url"]: r["txt"] for r in export_txt(ext).collect()}
    md = {r["url"]: r["md"] for r in export_markdown(ext).collect()}
    assert len(txt) == 40 and len(md) == 40
    some = [t for t in txt.values() if t]
    assert some, "non-empty exports expected"
    sample = some[0]
    assert sample.startswith("--- 第 1 页 ---\n")
    for url, m in md.items():
        assert m.startswith(f"# {url}")
    # block texts in the export match the span slices
    row = next(r for r in ext.collect() if r["spans"] and len(r["spans"]) > 1)
    t = txt[row["url"]]
    for i, s in enumerate(row["spans"], start=1):
        assert row["extracted_text"][s["start"] : s["end"]] in t
        assert f"--- 第 {i} 页 ---" in t


def test_format_elapsed(spark):
    df = spark.createDataFrame([(125.9,), (59.0,)], ["sec"])
    out = [r["fmt"] for r in df.select(format_elapsed(F.col("sec")).alias("fmt")).collect()]
    assert out == ["2分5秒", "0分59秒"]


def test_classify_error(spark):
    df = spark.createDataFrame(
        [(None,), ("html_null",), ("html_decode: UnicodeDecodeError",),
         ("parse_error: Boom",), ("weird mystery",)],
        ["error"],
    )
    got = [r["c"] for r in df.select(classify_error(F.col("error")).alias("c")).collect()]
    assert got == ["none", "non_retryable", "non_retryable", "retryable", "retryable"]


def test_retry_ladder_recovers_short_text_rows(spark, tmp_path):
    """Rows whose html is broken but which carry a short pre-extracted text
    (<50 chars) fail at attempt 0 and recover at attempt 1 when the
    degraded profile lowers existing_text_min_chars to 10 (R2 semantics:
    degraded params rescue what the strict profile quarantined)."""
    base = pages_df(spark, 40, partitions=2)
    rescue = spark.createDataFrame(
        [
            ("https://r.example.com/rescue-1", None, "short but present text", "en"),
            ("https://r.example.com/rescue-2", None, "another tiny text row", "en"),
        ],
        "url string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    inp = base.unionByName(rescue)
    out = str(tmp_path / "ladder")
    summaries = rerun_failed_with_ladder(spark, inp, out, input_snapshot_id=1, num_partitions=4)
    assert summaries[0]["docs_processed"] == 42
    assert len(summaries) >= 2  # retryable rows triggered attempt 1
    final = recovered_view(spark, out, n_attempts=len(summaries))
    assert final.count() == 42
    rows = {r["url"]: r for r in final.filter(F.col("url").startswith("https://r.example")).collect()}
    assert rows["https://r.example.com/rescue-1"]["error"] is None
    assert rows["https://r.example.com/rescue-1"]["skipped"] is True
    assert rows["https://r.example.com/rescue-1"]["extracted_text"] == "short but present text"
    assert rows["https://r.example.com/rescue-1"]["attempt"] == 1
    # permanently-malformed rows stay errored but present, and the surfaced
    # error row is the EARLIEST attempt's (original profile), not the most
    # degraded retry's
    bad = final.filter(F.col("error").isNotNull())
    assert bad.count() == 40 // 20  # the malformed doc class (html_null is non-retryable)
    assert all(r["attempt"] == 0 for r in bad.collect())


def test_progress_and_incomplete_and_expire(spark, tmp_path):
    out = str(tmp_path / "out")
    inp = pages_df(spark, 60, partitions=2)
    run_extraction_job(spark, inp, out, input_snapshot_id=9, num_partitions=4)
    prog = progress(spark, out).collect()
    assert len(prog) == 1
    assert prog[0]["done"] == 60
    assert prog[0]["failed"] == 3  # malformed class

    cfg = config_hash(
        {"min_confidence": 0.5, "existing_text_min_chars": 50, "retry_limit": 2,
         "engine": "intelligent_ocr_spark"}
    )
    inc = incomplete_urls(spark, out, inp, 9, cfg)
    assert inc.count() == 0
    inc2 = incomplete_urls(spark, out, inp, 10, cfg)  # other snapshot: all todo
    assert inc2.count() == 60

    # expiry is generation-scoped: a kept generation loses nothing even
    # past the window; an unkept one is retired WHOLE (checkpoint + data +
    # lineage together — never the commit record alone)
    kept = expire_stale_generations(spark, out, keep={(9, cfg)}, max_age_hours=0)
    assert kept == []
    removed = expire_stale_generations(spark, out, keep=set(), max_age_hours=0)
    assert removed
    ckpt_dir = os.path.join(out, "checkpoint")
    assert read_table_dir(spark, ckpt_dir) is None
    assert read_table_dir(spark, os.path.join(out, "data")) is None
