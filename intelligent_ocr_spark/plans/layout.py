"""Bucketed table layout — the co-located-join storage contract.

At 10^12 documents the resume anti-join (J2) and every recurring
dedup/tag join re-shuffles the corpus each run unless the storage layout
already agrees on a partitioning. Spark bucketing writes that agreement
down: a table written with ``bucketBy(n, key)`` hash-partitions rows
into ``n`` buckets by ``Murmur3(key) mod n`` at WRITE time, and a join
of two tables bucketed on the same key with the same ``n`` reads
bucket-pair against bucket-pair — ZERO Exchange on either side
(plan-pinned by ``tests/test_bucketing.py``; the same join on plain
parquet shuffles both sides).

Alignment detail: ``repartition(n, key)`` uses the SAME Murmur3-mod
hash as the bucket id, so repartitioning on the bucket column before
the write produces exactly ONE file per bucket — a 1000-task write
would otherwise leave up to 1000 files per bucket. ``sortBy`` keeps
each bucket file internally sorted for locality; note Spark ≥ 3.0 does
NOT surface that ordering to the optimizer by default (SPARK-28595 —
only sound for single-file buckets, which this writer guarantees;
``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` opts in), so
the join plan still carries per-bucket in-memory Sorts. The Exchange
elimination — the part that moves terabytes — needs no opt-in.

The reference's checkpoint is a flat file rewritten whole
(``core/pdf_processor.py`` resume path); this is its cluster-scale
replacement: checkpoint and corpus share the url-hash bucket layout, so
resume never shuffles the corpus. In-memory-catalog note: bucket
metadata lives in the session catalog (or a real metastore / Iceberg
bucket-transform partitioning in production — this sandbox has no
metastore service, the contract and plan shape are identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_bucketed", "bucketed_anti_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed (and by default sorted)
    on ``bucket_col``, pre-aligned to one file per bucket."""
    writer = (
        df.repartition(num_buckets, F.col(bucket_col))
        .write.format("parquet")
        .bucketBy(num_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.mode(mode).saveAsTable(table)


def bucketed_anti_join(
    spark: SparkSession, corpus_table: str, done_table: str, key: str = "url"
) -> DataFrame:
    """The J2 resume anti-join over two same-bucketed tables: rows of
    ``corpus_table`` whose ``key`` is absent from ``done_table``,
    joining bucket-against-bucket with no shuffle of either side."""
    return spark.table(corpus_table).join(
        spark.table(done_table), key, "left_anti"
    )
