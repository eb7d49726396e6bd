"""applyInPandasWithState: streaming first-seen dedup across micro-batches."""

import os

from pyspark.sql import functions as F

from intelligent_ocr_spark.sources.pages import PAGES_SCHEMA, pages_df
from intelligent_ocr_spark.streaming.stateful import stream_dedup_first_seen


def test_stream_dedup_first_seen(spark, tmp_path):
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    # batch 1: urls 0..59; batch 2: urls 30..89 (30 overlapping re-crawls)
    pages_df(spark, 60, partitions=2).write.parquet(inp + "/b1")
    b2 = pages_df(spark, 90, partitions=2).filter(
        F.col("url") > ""  # no-op; keep lazy
    )
    b2.exceptAll(pages_df(spark, 30, partitions=2)).write.parquet(inp + "/b2")

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 2)  # one subdir's files per trigger
        .parquet(inp + "/b*")
    )
    deduped = stream_dedup_first_seen(stream, buckets=8)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT url FROM dedup_out").collect()
    urls = [r["url"] for r in rows]
    # 90 distinct urls total; the 30..59 overlap must pass exactly once
    assert len(urls) == len(set(urls)) == 90
