"""Shared fixtures: one session-scoped local SparkSession for all tests."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from intelligent_ocr_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    # isolated warehouse: the in-memory catalog forgets tables between
    # sessions but a shared warehouse dir would remember their locations,
    # making saveAsTable fail with LOCATION_ALREADY_EXISTS on reruns
    warehouse = tempfile.mkdtemp(prefix="spark_graft_wh_test_")
    os.environ["SPARK_GRAFT_WAREHOUSE"] = warehouse
    spark = build_session(parallelism=8, app_name="intelligent_ocr_spark_tests")
    yield spark
    spark.stop()
    shutil.rmtree(warehouse, ignore_errors=True)
