"""Mojibake detection/repair: exact round-trip goldens, a Hypothesis
inverse property over arbitrary unicode, and the no-false-repair gates."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from intelligent_ocr_spark.functions.mojibake import (
    mojibake_counts,
    repair_mojibake,
)


def whatwg_cp1252(bs: bytes) -> str:
    """Decode bytes as WHATWG windows-1252: the five bytes Python's
    cp1252 codec rejects pass through as their C1 codepoints (what a
    browser — and therefore a real mis-decoded page — produces)."""
    out = []
    for b in bs:
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


def _repair_one(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = df.select("id", repair_mojibake(F.col("text")).alias("r")).collect()
    return [r["r"] for r in sorted(rows, key=lambda r: r["id"])]


CORRUPT_CASES = [
    "don’t “quote” café naïve «ok»",   # 2- and 3-byte sequences
    "中文网页内容。",                     # pure CJK (3-byte, control-char images)
    "Ελληνικά και русский",            # 2-byte Greek/Cyrillic
    "emoji 😀 and 𝄞 clef",              # 4-byte sequences
    "mixed ascii + é + 日本語 + …",
]


def test_repair_round_trip_goldens(spark):
    corrupt = [whatwg_cp1252(s.encode("utf-8")) for s in CORRUPT_CASES]
    assert _repair_one(spark, corrupt) == CORRUPT_CASES


def test_clean_text_passes_through(spark):
    clean = [
        "déjà vu — “real” quotes…",     # real accents + punctuation
        "plain ascii only",
        "中文 already decoded fine",
        "Ã lone signature-ish char",    # a single Ã: below min_signatures
        "",
    ]
    assert _repair_one(spark, clean) == clean


def test_double_mojibake_repairs_one_level(spark):
    s = "don’t “quote” café"
    once = whatwg_cp1252(s.encode("utf-8"))
    twice = whatwg_cp1252(once.encode("utf-8"))
    assert _repair_one(spark, [twice]) == [once]  # ftfy loops; we document one pass


def test_counts_separate_corrupt_from_clean(spark):
    df = spark.createDataFrame(
        [
            (0, whatwg_cp1252("don’t café «x» 😀".encode("utf-8"))),
            (1, "déjà vu — “real” quotes…"),
            (2, "damaged �� text"),
        ],
        "id long, text string",
    )
    n2, n3, n4, nf = mojibake_counts(F.col("text"))
    out = {
        r["id"]: r
        for r in df.select(
            "id", n2.alias("a"), n3.alias("b"), n4.alias("c"), nf.alias("d")
        ).collect()
    }
    assert out[0]["a"] == 3      # Ã©, Â«, Â»
    assert out[0]["b"] == 1      # â€™
    assert out[0]["c"] == 1      # the emoji's 4-byte signature
    assert out[1]["a"] == out[1]["b"] == out[1]["c"] == 0
    assert out[2]["d"] == 2


@settings(max_examples=25, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            codec="utf-8", categories=("L", "N", "P", "S", "Z")
        ),
        min_size=0,
        max_size=40,
    )
)
def test_repair_inverts_whatwg_corruption(spark_session_hypothesis, s):
    """corrupt → repair is the identity whenever the corruption leaves
    ≥ 2 signatures (every non-ASCII char contributes one); below the
    gate the text must pass through UNCHANGED, never half-repaired."""
    spark = spark_session_hypothesis
    n_non_ascii = sum(1 for c in s if ord(c) > 0x7F)
    corrupt = whatwg_cp1252(s.encode("utf-8"))
    (got,) = _repair_one(spark, [corrupt])
    if n_non_ascii >= 2:
        assert got == s
    else:
        assert got in (s, corrupt)  # 0-1 sigs: gate holds it untouched


@pytest.fixture(scope="module")
def spark_session_hypothesis(spark):
    return spark


def test_detection_plan_is_zero_exchange(spark):
    """Signature counting is scan-projection algebra: no exchange, no
    Python, before any caller-added sort/agg."""
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    n2, n3, n4, nf = mojibake_counts(F.col("text"))
    plan = (
        df.select("doc_id", n2, n3, n4, nf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
