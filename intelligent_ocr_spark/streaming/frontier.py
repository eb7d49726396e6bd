"""Streaming crawl-frontier discovery with BOUNDED state: a per-bucket
Bloom filter seen-set.

:mod:`.stateful`'s first-seen dedup keeps one 8-byte hash per distinct
url — exact, but state grows with the corpus, which an UNBOUNDED crawl
frontier cannot afford (10^12 urls × 8 B = terabytes of state store).
This operator is its fixed-memory twin: each state bucket holds a
packed Bloom filter of ``m_bits/8`` bytes FOREVER, no matter how many
urls flow through. The trade is the Bloom direction of error — a false
positive drops a genuinely-new url as "already enqueued" at the
designed rate ``(1 - e^(-kn/m))^k``; a url the filter calls new is
GUARANTEED new (no false negatives, nothing is ever double-enqueued) —
exactly the tolerance a frontier has (missing one link of millions is
noise; re-crawling the same url forever is a trap).

Layout is shared with the batch sketch (``operators/sketch.py``): the
Kirsch–Mitzenmacher double hash (md5 → h1, h2 forced odd), ``k`` probe
positions mod ``m_bits``, 32 filter bits per int64 word so every state
value stays positive. Both hashes are computed JVM-side (codegen)
before the Python boundary — the state function only does bit math.
Bucketing by ``pmod(h1, buckets)`` shards state uniformly regardless
of host skew (the north-rule url-hash layout), and each bucket's
filter sizes for ``expected_urls / buckets`` keys.

Built on ``applyInPandasWithState`` (Arrow-vectorized, GroupState API),
``outputMode=append``; state rewrites only on micro-batches that set at
least one new bit (the ``stateful.py`` rewrite-on-change discipline).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["stream_frontier_bloom", "FRONTIER_OUTPUT_SCHEMA"]

FRONTIER_OUTPUT_SCHEMA = "bucket INT, url STRING"
_STATE_SCHEMA = "words ARRAY<LONG>"


def _make_frontier_group(m_bits: int, k: int):
    n_words = m_bits // 32

    def frontier_group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            words = list(state.get[0])
        else:
            words = [0] * n_words
        changed = False
        out: list[pd.DataFrame] = []
        for pdf in pdfs:
            keep: list[int] = []
            for i, (h1, h2) in enumerate(
                zip(pdf["_h1"].astype("int64"), pdf["_h2"].astype("int64"))
            ):
                probes = [(h1 + j * h2) % m_bits for j in range(k)]
                if all((words[p // 32] >> (p % 32)) & 1 for p in probes):
                    continue  # maybe-seen: drop (false-positive direction)
                for p in probes:
                    words[p // 32] |= 1 << (p % 32)
                changed = True
                keep.append(i)
            if keep:
                out.append(pdf.iloc[keep][["bucket", "url"]])
        if changed:  # rewrite state ONLY when a new bit was set
            state.update((words,))
        if out:
            yield pd.concat(out)

    return frontier_group


def stream_frontier_bloom(
    urls_stream: DataFrame,
    m_bits: int = 8192,
    k: int = 4,
    buckets: int = 32,
    seed: str = "fb0",
    url_col: str = "url",
) -> DataFrame:
    """First-discovery url stream with O(``buckets · m_bits/8`` bytes)
    TOTAL state: each url passes the first time its bucket's Bloom
    filter does not contain it; re-occurrences (and the designed
    false-positive share of new urls) are dropped. ``m_bits`` must be
    a positive multiple of 32 (the packed-word layout), sized so
    ``expected distinct urls / buckets`` keeps the per-bucket fill
    below ~½ for the advertised error rate."""
    if m_bits % 32 or m_bits < 32:
        raise ValueError("m_bits must be a positive multiple of 32")
    if not 1 <= k <= 16:
        raise ValueError("k must be within [1, 16]")
    hx = F.md5(
        F.concat(F.lit(seed), F.lit("|"), F.col(url_col)).cast("binary")
    )
    h1 = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long") * 2 + 1
    keyed = urls_stream.select(
        F.col(url_col).alias("url"), h1.alias("_h1"), h2.alias("_h2")
    ).withColumn("bucket", F.pmod(F.col("_h1"), F.lit(buckets)).cast("int"))
    return keyed.groupBy("bucket").applyInPandasWithState(
        _make_frontier_group(m_bits, k),
        outputStructType=FRONTIER_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
