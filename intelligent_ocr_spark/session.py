"""SparkSession factory tuned for the extraction workload.

Scale notes (100 TB / 1000-executor design, tested on local[N]):

* AQE on: runtime partition coalescing + skew-join splitting replace the
  reference's only skew tool, a queue-stall counter
  (reference ``core/pdf_processor.py:1227-1241``).
* Arrow batches kept small: page rows are fat (html binary can be tens of
  KB-MB), so ``maxRecordsPerBatch`` is lowered from the 10k default — the
  Spark analog of the reference's bounded prefetch queue
  (``core/pdf_processor.py:1161``, maxsize=4 pages).
* Shuffle partitions sized to cores locally; on a real cluster AQE's
  coalescing makes the initial number less critical.
* Session timezone pinned to UTC so results compare bit-stably against the
  DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_ARROW_BATCH = 256

# Make this package importable inside Spark's Python workers. On a real
# cluster this is `spark-submit --py-files intelligent_ocr_spark.zip`
# (north_rule); in local mode the worker daemon inherits PYTHONPATH from
# the environment the JVM is launched with, so it must be set BEFORE the
# first getOrCreate().
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)


def build_session(
    parallelism: int | None = None,
    app_name: str = "intelligent_ocr_spark",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a local SparkSession with the engine's standard conf.

    ``parallelism=None`` uses ``local[*]``. On a real cluster this factory is
    bypassed — ``spark-submit`` provides the session and these confs move to
    ``spark-defaults``; nothing in the engine assumes local mode.
    """
    cores = parallelism or os.cpu_count() or 8
    master = f"local[{parallelism}]" if parallelism else "local[*]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.default.parallelism", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", str(DEFAULT_ARROW_BATCH)),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
