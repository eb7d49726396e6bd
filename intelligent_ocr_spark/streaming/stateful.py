"""Custom stateful streaming operator: first-seen-wins url deduplication.

The streaming twin of exact dedup for a continuously-ingesting corpus:
across micro-batches, only the FIRST occurrence of each url passes; later
re-crawls are dropped. State is a per-group set of seen url hashes, keyed
by a url-hash bucket so state shards evenly regardless of host skew
(north_rule's url-hash layout applied to state).

Built on ``applyInPandasWithState`` (Arrow-vectorized, GroupState API).
At scale, state size is bounded per bucket and lives in the state store;
a production deployment would add TTL via the timeout conf for bounded
re-crawl windows.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["stream_dedup_first_seen", "DEDUP_OUTPUT_SCHEMA"]

DEDUP_OUTPUT_SCHEMA = (
    "bucket INT, url STRING, warc_ts TIMESTAMP, lang STRING"
)
STATE_SCHEMA = "seen ARRAY<STRING>"


def _dedup_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen: set[str] = set(state.get[0]) if state.exists else set()
    out: list[pd.DataFrame] = []
    for pdf in pdfs:
        # within-batch first-seen: stable drop_duplicates, then state filter
        pdf = pdf.drop_duplicates(subset=["url"], keep="first")
        fresh = pdf[~pdf["url"].isin(seen)]
        seen.update(fresh["url"].tolist())
        if len(fresh):
            out.append(fresh[["bucket", "url", "warc_ts", "lang"]])
    state.update((sorted(seen),))
    if out:
        yield pd.concat(out)


def stream_dedup_first_seen(pages_stream: DataFrame, buckets: int = 32) -> DataFrame:
    """url-deduplicated page stream (first occurrence wins, exactly-once
    per url across micro-batches given the stream checkpoint)."""
    keyed = pages_stream.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(buckets)).cast("int")
    ).select("bucket", "url", "warc_ts", "lang")
    return keyed.groupBy("bucket").applyInPandasWithState(
        _dedup_group,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
