"""Ingest-time NEAR-dup suppression for a continuously-arriving corpus.

The streaming twin of :func:`~intelligent_ocr_spark.operators.dedup.
incremental_near_dedup`: each micro-batch of pages is tagged against the
accumulated MinHash band-bucket state of everything KEPT so far (plus
itself), lightly-edited re-crawls are dropped, and the survivors' band
buckets join the state — CCNet/RefinedWeb-style near-dedup running at
ingest instead of as a nightly batch.

Why ``foreachBatch`` and not ``applyInPandasWithState``: a doc is a
near-dup when ANY of its ``bands`` buckets has been seen, but GroupState
shards state by ONE key — a per-bucket stateful operator can vote per
band yet cannot combine a doc's votes without a second stateful hop
(chained arbitrary-state operators are not supported). ``foreachBatch``
keeps the whole decision relational per batch: the bucket state lives in
a parquet table joined with ordinary (AQE-sized, skew-split) joins, so
the same plan shapes the batch operator pins keep holding under
streaming.

Exactly-once across restarts WITHOUT trusting the sink: every batch
writes ``out/batch=<id>`` and ``state/batch=<id>`` with ``overwrite``
mode, so Structured Streaming's replay of an uncommitted batch (same
``batch_id``, same file-source rows) overwrites the torn attempt instead
of double-appending — the micro-commit contract of ``plans/pipeline.py``
applied to streaming. State reads glob every committed batch directory;
a replayed batch never sees its own torn remnants as "prior state"
because the state read EXCLUDES the current ``batch_id``.

First-seen-wins semantics (pinned by the batch-twin test):

* a doc is a near-dup if any band bucket occurs in the kept-state, or
  occurs earlier (smaller id) in its own batch;
* only KEPT docs register buckets — the state is the representative
  set, exactly the corpus :func:`incremental_near_dedup` would be run
  against in batch mode.

Scale notes: the state table grows as O(kept docs × bands) 16-byte
rows; the per-batch tag is a left-semi join (never a pair join), and the
per-batch state append is one small parquet write. Compaction (coalesce
the ``batch=*`` dirs periodically) is a maintenance job, not a
correctness requirement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from intelligent_ocr_spark.operators.dedup import _band_buckets

__all__ = ["neardup_batch_handler", "stream_neardup_ingest"]


def neardup_batch_handler(
    state_dir: str,
    out_dir: str,
    id_col: str = "url",
    text_col: str = "text",
    k: int = 8,
    bands: int = 2,
    shingle_n: int = 3,
):
    """The ``foreachBatch`` function: tag, drop, emit, register."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint()
        if not batch_df.take(1):
            return
        buckets = _band_buckets(
            batch_df, id_col, text_col, k, bands, shingle_n
        ).localCheckpoint()

        # prior state = every batch directory EXCEPT a torn copy of this
        # one (replay overwrites it below)
        try:
            prior = (
                spark.read.option("basePath", state_dir)
                .parquet(state_dir + "/batch=*")
                .filter(F.col("batch") != batch_id)
                .select("band", "bucket")
            )
        except Exception:  # first batch: no state yet
            prior = spark.createDataFrame([], "band int, bucket string")

        state_hit = (
            buckets.join(prior, ["band", "bucket"], "left_semi")
            .select("doc_id")
            .distinct()
        )
        # within-batch first-seen: a bucket's smallest doc id keeps it
        batch_min = buckets.groupBy("band", "bucket").agg(
            F.min("doc_id").alias("_min_id")
        )
        batch_hit = (
            buckets.join(batch_min, ["band", "bucket"])
            .filter(F.col("doc_id") > F.col("_min_id"))
            .select("doc_id")
            .distinct()
        )
        dups = state_hit.union(batch_hit).distinct()
        kept = batch_df.join(
            dups.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
        )
        kept.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
        (
            buckets.join(
                dups, "doc_id", "left_anti"
            )  # register KEPT docs' buckets only
            .select("band", "bucket")
            .distinct()
            .write.mode("overwrite")
            .parquet(f"{state_dir}/batch={batch_id}")
        )

    return handle


def stream_neardup_ingest(
    pages_stream: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "url",
    text_col: str = "text",
    k: int = 8,
    bands: int = 2,
    shingle_n: int = 3,
):
    """Start the near-dup ingest stream; returns the StreamingQuery.

    ``out_dir/batch=*`` accumulates the near-deduplicated corpus;
    ``state_dir/batch=*`` the representative band-bucket state."""
    return (
        pages_stream.writeStream.foreachBatch(
            neardup_batch_handler(
                state_dir, out_dir, id_col, text_col, k, bands, shingle_n
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
