# -*- coding: utf-8 -*-
"""Spark-level extraction tests: golden byte-equality, doc-class behavior,
dual-insert view, plan shape."""

import pytest

from pyspark.sql import functions as F

from intelligent_ocr_spark.operators.extract import (
    dual_insert_spans,
    extract_pages,
    extract_record,
    repartition_by_url,
    with_host_salt,
)
from intelligent_ocr_spark.sources.pages import doc_class, gen_row, pages_df

N_SMOKE = 40  # two full passes over the 20-slot class cycle


@pytest.fixture(scope="module")
def extracted(spark):
    df = extract_pages(pages_df(spark, N_SMOKE, partitions=4))
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == N_SMOKE
    return rows


def test_golden_byte_equality_vs_local_reference(extracted):
    """Distributed output must byte-match the single-threaded pure-python
    extractor for every url (the FIXTURES.md §2 contract)."""
    for i in range(N_SMOKE):
        raw = gen_row(i)
        exp = extract_record(raw["url"], raw["warc_ts"], raw["html"], raw["text"], raw["lang"])
        got = extracted[raw["url"]]
        assert got["extracted_text"] == exp["extracted_text"], f"url {i}"
        assert got["norm_text"] == exp["norm_text"], f"url {i}"
        got_spans = [
            (s["start"], s["end"], s["block_id"], s["kind"], s["conf"])
            for s in got["spans"]
        ]
        exp_spans = [
            (s["start"], s["end"], s["block_id"], s["kind"], s["conf"])
            for s in exp["spans"]
        ]
        assert got_spans == exp_spans, f"url {i}"


def test_doc_class_behavior(extracted):
    for i in range(N_SMOKE):
        cls = doc_class(i)
        r = extracted[gen_row(i)["url"]]
        if cls == 3:
            assert r["is_blank"] and r["extracted_text"] == ""
        elif cls == 4:
            assert r["skipped"] and len(r["extracted_text"]) > 50
        elif cls == 5:
            assert r["error"] is not None
        else:
            assert r["error"] is None and not r["skipped"]
            assert len(r["extracted_text"]) > 0


def test_spans_index_into_text(extracted):
    for r in extracted.values():
        text = r["extracted_text"]
        for s in r["spans"]:
            assert 0 <= s["start"] < s["end"] <= len(text)
            assert "\n" not in text[s["start"] : s["end"]]
        # spans tile the text exactly, separated by single newlines
        if r["spans"]:
            assert r["spans"][0]["start"] == 0
            assert r["spans"][-1]["end"] == len(text)


def test_variant_pages_have_diverging_norm_text(extracted):
    diverged = [
        r for r in extracted.values()
        if r["norm_text"] is not None and r["norm_text"] != r["extracted_text"]
    ]
    assert diverged, "vertical-CJK classic pages must exercise variant normalization"
    for r in diverged:
        assert len(r["norm_text"]) == len(r["extracted_text"])  # per-char map


def test_confidence_filter_on_low_conf_class(extracted):
    for i in range(N_SMOKE):
        if doc_class(i) == 6:
            r = extracted[gen_row(i)["url"]]
            assert r["n_blocks"] == 1 and r["n_dropped"] >= 5
            assert all(s["conf"] >= 0.5 for s in r["spans"])


def test_dual_insert_view(spark):
    df = extract_pages(pages_df(spark, N_SMOKE, partitions=4))
    dual = dual_insert_spans(df)
    rows = dual.collect()
    # every span yields >= 1 form; variant spans yield exactly 2
    by_key = {}
    for r in rows:
        by_key.setdefault((r["url"], r["start"]), []).append(r["form"])
    assert any(len(v) == 2 for v in by_key.values()), "dual-insert must double variant spans"
    for forms in by_key.values():
        assert len(forms) in (1, 2)
        if len(forms) == 2:
            assert forms[0] != forms[1]


def test_dual_insert_expanded_variant_groups(spark):
    """Dual-insert golden over variants NOT in the round-1 52-group table
    (kyūjitai section): 国学→國學, 体→體 — both forms emitted at one span."""
    from pyspark.sql import functions as F

    html = (
        '<html><body><article><h1>t</h1><p>国学之体変也</p></article>'
        "</body></html>"
    ).encode()
    pages = spark.createDataFrame(
        [("u://1", None, bytearray(html), "", "zh")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01")))
    dual = dual_insert_spans(extract_pages(pages))
    forms = [r["form"] for r in dual.collect() if r["kind"] == "line"]
    assert sorted(forms) == sorted(["国学之体変也", "國學之體變也"])


def test_dual_insert_round3_expansion_groups(spark):
    """Dual-insert golden over variants NOT in the round-2 325-group table:
    the simplified-radical series (语→語, 钱→錢, 鸟→鳥, 页→頁) and the
    unambiguous per-char simplified list (区→區, 爱→愛) added in round 3."""
    from pyspark.sql import functions as F

    html = (
        "<html><body><article><h1>t</h1><p>语钱之鸟页区爱也</p></article>"
        "</body></html>"
    ).encode()
    pages = spark.createDataFrame(
        [("u://1", None, bytearray(html), "", "zh")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01")))
    dual = dual_insert_spans(extract_pages(pages))
    forms = [r["form"] for r in dual.collect() if r["kind"] == "line"]
    assert sorted(forms) == sorted(["语钱之鸟页区爱也", "語錢之鳥頁區愛也"])


def test_variant_table_ambiguous_merges_unmapped():
    """The expansion must NOT fold one-to-many PRC merges (发←發/髮,
    历←曆/歷, 钟←鐘/鍾) or independent classical words (据/听/面/里/云/后):
    those chars pass through unchanged."""
    from intelligent_ocr_spark.functions.normalize import get_normalizer

    n = get_normalizer()
    keep = "发历钟汇据听面里云后干谷斗几丑台"
    assert n.normalize(keep) == keep
    assert n.variant_count > 2500  # round-3 full-size table


def test_extraction_plan_is_narrow(spark):
    """No shuffle in the extraction transform itself (scale contract)."""
    df = extract_pages(pages_df(spark, 100, partitions=4))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_repartition_and_salt_helpers(spark):
    df = repartition_by_url(pages_df(spark, 100, partitions=2), 8)
    assert df.rdd.getNumPartitions() == 8
    salted = with_host_salt(pages_df(spark, 100, partitions=2), salt_buckets=4)
    stats = salted.groupBy("salt").count().collect()
    assert 1 < len(stats) <= 4
    hosts = {r["host"] for r in salted.select("host").distinct().collect()}
    assert "mega0.example.com" in hosts


def test_dual_insert_round4_expansion_groups(spark):
    """Dual-insert golden over variants NOT in round 3's 2,956-char table:
    the new curated sections (鳏→鰥, 踌→躊, 鞑→韃, 佥→僉) and the
    ICU/CLDR-generated Unihan-route table (蕲→蘄, 娲→媧, 荭→葒)."""
    from pyspark.sql import functions as F

    html = (
        "<html><body><article><h1>t</h1><p>鳏踌鞑佥蕲娲荭也</p></article>"
        "</body></html>"
    ).encode()
    pages = spark.createDataFrame(
        [("u://1", None, bytearray(html), "", "zh")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01")))
    dual = dual_insert_spans(extract_pages(pages))
    forms = [r["form"] for r in dual.collect() if r["kind"] == "line"]
    assert sorted(forms) == sorted(["鳏踌鞑佥蕲娲荭也", "鰥躊韃僉蘄媧葒也"])


def test_variant_table_never_maps_borrowed_classical_chars():
    """Chars the simplification scheme BORROWED from existing classical
    words must never be folded: 千 (number), 秋, 松 (pine), 出, 占 (占卜),
    丑 (earthly branch), 范 (surname), 尸, 苹 (食野之苹), 漓 (淋漓) —
    mapping any of them corrupts ordinary classical text. Also the lossy
    merges (发←發/髮 ...) stay unmapped in every section."""
    from intelligent_ocr_spark.functions.normalize import get_normalizer

    n = get_normalizer()
    safe = "千秋松出占丑范尸苹漓发历钟汇签"
    assert n.normalize(safe) == safe
