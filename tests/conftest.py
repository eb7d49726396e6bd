"""Shared fixtures: one session-scoped local SparkSession for all tests."""

from __future__ import annotations

import pytest

from intelligent_ocr_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    spark = build_session(parallelism=8, app_name="intelligent_ocr_spark_tests")
    yield spark
    spark.stop()
