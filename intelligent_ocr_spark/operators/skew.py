"""Skew-safe aggregation: salted two-phase groupBy.

The generalized form of the north_rule's host-salting requirement: a
groupBy on a skewed key (one mega host = one hot reducer) is split into
(key, salt) partial aggregates — spreading the hot key over ``buckets``
reducers — then re-aggregated by key. Semantics are EXACTLY the plain
groupBy (verified against the DuckDB oracle); only the shuffle layout
changes. Sums use per-term DECIMAL casts so the two-phase re-aggregation
is order-independent and exact.

At 10^12 docs this is the difference between one straggler task holding a
mega-host's rows and ``buckets`` even tasks; compose with AQE skew-join
for the join-side equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_count_sum"]


def salted_count_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    unique_col: str,
    buckets: int = 16,
    sum_scale: int = 4,
) -> DataFrame:
    """Two-phase (count, exact decimal sum) per ``keys`` with salt spread.

    ``unique_col`` seeds the salt hash (any well-distributed column — a row
    id, url, event id); the salt is deterministic, never a random number,
    so re-runs and retries land rows in the same bucket.
    Output: keys…, ``n`` (count), ``total`` (exact decimal sum).
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(unique_col), F.lit(buckets)).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count("*").alias("_c"),
        F.sum(F.col(value_col).cast(f"decimal(20,{sum_scale})")).alias("_s"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("_c").alias("n"),
        F.sum("_s").alias("total"),
    )
