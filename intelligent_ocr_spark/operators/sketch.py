"""Cardinality sketches: HyperLogLog registers as a relational plan.

Counting distinct URLs/hosts/content-hashes across a 100-TB crawl with
``COUNT(DISTINCT x)`` shuffles every distinct value; the HLL sketch
(Flajolet et al. 2007, public) needs one aggregation whose result is
``2^p`` rows regardless of input size. Spark's built-in
``approx_count_distinct`` is exactly this, but its register layout is
engine-private — this operator materializes the registers themselves
with a fixed public hash (md5, the repo's cross-engine idiom) so that

* the register table is INTEGER-EXACT and deterministic → the DuckDB
  oracle reproduces it bit-for-bit (no float estimate in the gate);
* registers from disjoint corpus shards / incremental runs MERGE by
  ``max`` per bucket (the union property real pipelines rely on);
* the float estimate is a trivial driver-side fold over 2^p rows,
  tested separately against exact distinct counts with the standard
  error bound (1.04/sqrt(m)).

Hash layout (p divisible by 4 so hex slicing is exact): md5 hex of the
key; first ``p/4`` hex chars → bucket, next 14 hex chars → a 56-bit
suffix ``v``; ``rho = (64-p) - bit_length(v) + 1`` (leading-zeros+1),
``v = 0`` → ``(64-p)+1``. ``bit_length`` is ``length(conv(v, 10, 2))``
in Spark and ``length(bin(v))`` in DuckDB — string length of the
minimal binary rendering, exact for all int64.

Scale shape: one partial-aggregated groupBy on ``2^p ≤ 4096`` keys
(map-side combine collapses every task to ≤ m rows before the one tiny
exchange), then a broadcast left join against ``spark.range(m)`` to
surface empty buckets as ``rho = 0``. No distinct, no wide shuffle,
no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["hll_registers", "hll_estimate"]


def hll_registers(df: DataFrame, key, p: int = 8) -> DataFrame:
    """Register table ``(bucket, rho)`` — all ``2^p`` buckets, empty
    ones at ``rho = 0``. ``key`` is a Column (or name) of string type;
    rows with NULL keys are ignored (SQL aggregate convention)."""
    if p % 4 or not 4 <= p <= 12:
        raise ValueError("p must be divisible by 4, within [4, 12]")
    m = 1 << p
    suffix_bits = 64 - p
    hx = F.md5(F.encode(F.col(key) if isinstance(key, str) else key, "UTF-8"))
    bucket = F.conv(F.substring(hx, 1, p // 4), 16, 10).cast("long")
    v = F.conv(F.substring(hx, p // 4 + 1, 14), 16, 10).cast("long")
    rho = (
        F.when(v == 0, F.lit(suffix_bits + 1))
        .otherwise(
            F.lit(suffix_bits) - F.length(F.conv(v.cast("string"), 10, 2)) + 1
        )
        .cast("long")
    )
    regs = (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .where(F.col("rho").isNotNull())
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    spark = SparkSession.getActiveSession() or df.sparkSession
    all_buckets = spark.range(m).select(F.col("id").alias("bucket"))
    return (
        all_buckets.join(F.broadcast(regs), "bucket", "left")
        .select("bucket", F.coalesce("rho", F.lit(0)).cast("long").alias("rho"))
    )


def hll_estimate(registers: list[tuple[int, int]]) -> float:
    """Standard HLL estimate from a collected register table
    (Flajolet et al. 2007 §4, with the small-range linear-counting
    correction). Driver-side fold over 2^p rows — never a Spark job."""
    m = len(registers)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    s = sum(2.0 ** -rho for _, rho in registers)
    est = alpha * m * m / s
    zeros = sum(1 for _, rho in registers if rho == 0)
    if est <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return est
