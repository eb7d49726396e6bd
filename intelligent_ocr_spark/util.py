"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_parallelism"]


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ONLY when the input is under-partitioned (e.g. a small
    dimension table read from a single parquet file) so per-row-expensive
    operators use every core.

    At web scale the input is already well-partitioned and this is a no-op —
    it never *reduces* partitioning and never shuffles data that is already
    spread, so it cannot become a 100 TB shuffle by accident.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
