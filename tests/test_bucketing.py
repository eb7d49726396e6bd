"""Bucketing: the co-located-join layout for the resume anti-join.

At 10^12 docs the checkpoint anti-join is the pipeline's only recurring
shuffle; bucketing both tables by url removes it entirely — each task
anti-joins its own bucket pair. These tests pin the plan shape: a join
of two url-bucketed tables has ZERO Exchange nodes (and, with the
one-file-per-bucket aligned write, ZERO Sort nodes), while the same
join on plain parquet shuffles both sides.
"""

from pyspark.sql import functions as F

from intelligent_ocr_spark.plans.layout import bucketed_anti_join, write_bucketed
from intelligent_ocr_spark.sources.pages import pages_df


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_anti_join_has_no_shuffle(spark, tmp_path):
    pages = pages_df(spark, 300, partitions=4)
    done = pages.select("url").filter(F.xxhash64("url") % 2 == 0)

    spark.sql("DROP TABLE IF EXISTS pages_bucketed")
    spark.sql("DROP TABLE IF EXISTS ckpt_bucketed")
    write_bucketed(pages.select("url", "lang"), "pages_bucketed", "url", 8)
    write_bucketed(done, "ckpt_bucketed", "url", 8)

    # one file per POPULATED bucket: repartition(n, key) uses the same
    # Murmur3-mod hash as the bucket id, so the aligned write never splits
    # a bucket (an empty bucket writes no file, so derive the expectation
    # from the data instead of assuming the fixture fills all 8 —
    # round-5 advisor finding)
    n_buckets_populated = (
        pages.select(F.pmod(F.expr("hash(url)"), F.lit(8)).alias("b"))
        .distinct()
        .count()
    )
    files = spark.table("pages_bucketed").inputFiles()
    assert len(files) == n_buckets_populated <= 8

    # at test scale Catalyst would (correctly) broadcast the tiny side and
    # skip bucketing; disable broadcast to pin the at-scale plan where
    # neither side fits in memory — the scenario bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = bucketed_anti_join(spark, "pages_bucketed", "ckpt_bucketed")
        plan = _plan(bucketed)
        assert "Exchange" not in plan  # co-located: no shuffle of either side
        # per-bucket Sorts remain (Spark >= 3.0 ignores bucket sort order
        # at read by default, SPARK-28595) — they are in-memory and
        # per-bucket; the eliminated Exchanges were the corpus-sized cost
        assert "SortMergeJoin" in plan
        n_bucketed = bucketed.count()

        # same join on unbucketed data shuffles both sides
        plain = pages.select("url", "lang").join(done, "url", "left_anti")
        assert "Exchange hashpartitioning" in _plan(plain)
        assert n_bucketed == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
