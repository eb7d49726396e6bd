"""Differential tests: output must be invariant to partitioning/parallelism
(the realized version of the reference's skipped pipelined-vs-standard
equivalence test, tests/test_core.py:312-345)."""

from intelligent_ocr_spark.operators.extract import extract_pages
from intelligent_ocr_spark.sources.pages import pages_df

N = 300


def _fingerprint(df):
    rows = df.select("url", "extracted_text", "norm_text", "skipped", "is_blank", "error").collect()
    return sorted((r["url"], r["extracted_text"], r["norm_text"], r["skipped"], r["is_blank"], r["error"]) for r in rows)


def test_output_invariant_to_partitioning(spark):
    one = _fingerprint(extract_pages(pages_df(spark, N, partitions=1)))
    many = _fingerprint(extract_pages(pages_df(spark, N, partitions=32)))
    assert one == many


def test_generator_invariant_to_partitioning(spark):
    a = sorted(r["url"] + "|" + str(r["html"]) for r in pages_df(spark, N, partitions=1).collect())
    b = sorted(r["url"] + "|" + str(r["html"]) for r in pages_df(spark, N, partitions=16).collect())
    assert a == b
