"""Property-based robustness tests (hypothesis): the extractor must never
crash on arbitrary bytes, and reading order must be a permutation that is
invariant to input order — the byte-identity-under-parallelism contract
reduced to its kernel."""

import random
from datetime import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from intelligent_ocr_spark.functions.layout import Block, reading_order
from intelligent_ocr_spark.operators.extract import extract_record

TS = datetime(2024, 1, 1)


@st.composite
def blocks(draw):
    n = draw(st.integers(0, 12))
    out = []
    for i in range(n):
        x0 = draw(st.integers(0, 900))
        y0 = draw(st.integers(0, 900))
        w = draw(st.integers(1, 400))
        h = draw(st.integers(1, 400))
        out.append(Block(float(x0), float(y0), float(x0 + w), float(y0 + h), f"b{i}"))
    return out


@given(blocks(), st.booleans(), st.randoms(use_true_random=False))
@settings(max_examples=150, deadline=None)
def test_reading_order_is_shuffle_invariant_permutation(bs, vertical, rng):
    ordered = reading_order(bs, vertical)
    assert sorted(b.text for b in ordered) == sorted(b.text for b in bs)
    shuffled = list(bs)
    rng.shuffle(shuffled)
    assert [b.text for b in reading_order(shuffled, vertical)] == [
        b.text for b in ordered
    ]


@given(st.binary(max_size=4096))
@settings(max_examples=200, deadline=None)
def test_extract_never_crashes_on_arbitrary_bytes(payload):
    rec = extract_record("u://x", TS, payload, "", "en")
    assert rec["url"] == "u://x"
    assert isinstance(rec["extracted_text"], str)
    # quarantine XOR output — never both
    if rec["error"] is not None:
        assert rec["extracted_text"] == "" and rec["spans"] == []


@given(st.text(max_size=2000))
@settings(max_examples=200, deadline=None)
def test_extract_never_crashes_on_arbitrary_html_text(doc):
    rec = extract_record("u://x", TS, doc.encode("utf-8"), "", "en")
    # spans always tile extracted_text
    for s in rec["spans"]:
        assert 0 <= s["start"] < s["end"] <= len(rec["extracted_text"])


@given(st.text(max_size=500), st.text(max_size=500))
@settings(max_examples=100, deadline=None)
def test_extract_deterministic(a, b):
    html = f"<html><body><p>{a}</p><div data-bbox='1,2,30,9' data-conf='0.9'>{b}</div></body></html>".encode()
    r1 = extract_record("u://x", TS, html, "", "en")
    r2 = extract_record("u://x", TS, html, "", "en")
    assert r1 == r2


def test_weighted_sample_deterministic_and_rate(spark):
    """weighted_lang_sample: identical rows at different partitionings;
    realized per-lang rate within binomial noise of the allocation."""
    from pyspark.sql import functions as F

    from intelligent_ocr_spark.functions.textstats import (
        lang_sample_weights,
        weighted_lang_sample,
    )

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 7, F.lit("en"))
        .when(F.col("id") % 10 < 9, F.lit("zh"))
        .otherwise(F.lit("fr"))
        .alias("lang"),
    )
    a = sorted(map(tuple, weighted_lang_sample(df, budget=800).collect()))
    b = sorted(
        map(tuple, weighted_lang_sample(df.repartition(13), budget=800).collect())
    )
    assert a == b and len(a) > 0
    alloc = {
        r.lang: r.expected_docs
        for r in lang_sample_weights(df, budget=800).collect()
    }
    got = {}
    for doc_id, lang in a:
        got[lang] = got.get(lang, 0) + 1
    for lang, exp in alloc.items():
        # 5 sigma of binomial(n, exp/n): sigma <= sqrt(exp)
        assert abs(got.get(lang, 0) - exp) <= 5 * max(4, exp) ** 0.5, (lang, got, exp)
