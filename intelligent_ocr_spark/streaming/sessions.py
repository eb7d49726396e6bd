"""Streaming gap-based sessionization — the event-time twin of the batch
``w5_sessionize`` query (lag + cumulative-sum over a user window).

The reference pipeline has no streaming surface (its queue is an
in-process worker pool, ``core/parallel_ocr.py``); a crawl-facing engine
needs the session operator in BOTH forms: the batch window form for
backfills and this ``applyInPandasWithState`` form for live click/crawl
streams, where a user's session must close the moment the WATERMARK —
not a clock — passes ``last_event + gap``.

Semantics (identical to the batch twin, which is the oracle):

* events of one user, ordered by ``(ts, event_id)``, split into sessions
  wherever the gap between consecutive events exceeds ``gap_minutes``;
* ``session_id`` is the user's 1-based session ordinal;
* ``session_value`` sums ``value`` in exact DECIMAL(20,4) micro-units
  (scaled int64), matching the batch ``_dsum`` reduction bit-for-bit.

State per user is five int64s — seq, start_us, last_us, n, value in
10⁻⁴ units — NOT the event list: a session is mergeable left-to-right,
so the open session folds incrementally and memory per key is O(1).
Sessions close two ways, both exact:

* **in-batch**: a later event of the same user arrives beyond the gap —
  the closed session is emitted immediately;
* **by watermark**: ``setTimeoutTimestamp(last_ms + gap_ms)`` fires once
  the event-time watermark passes the session's horizon; if the
  watermark has ALREADY passed it when the batch runs (other users'
  events advanced it), the session closes in the same invocation —
  Spark rejects a timeout at-or-before the current watermark, and no
  in-order event can extend that session anyway.

Ordering contract: per-user event-time order across micro-batches (the
watermark assumption every streaming session operator makes — late rows
beyond it are the stream's error budget, counted by Spark's
``numRowsDroppedByWatermark``).  Within a batch, rows are sorted here.

Built on ``applyInPandasWithState`` (Arrow-vectorized, GroupState API,
``EventTimeTimeout``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["stream_sessionize", "SESSION_OUTPUT_SCHEMA"]

SESSION_OUTPUT_SCHEMA = (
    "user_id LONG, session_id LONG, n_events LONG, session_value DOUBLE"
)
_STATE_SCHEMA = "seq LONG, start_us LONG, last_us LONG, n LONG, vdec LONG"


def _make_session_group(gap_ms: int):
    gap_us = gap_ms * 1000

    def session_group(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]

        def row(seq: int, n: int, vdec: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_id": [seq],
                    "n_events": [n],
                    "session_value": [vdec / 1e4],
                }
            )

        if state.hasTimedOut:
            seq, _start, _last, n, vdec = state.get
            state.remove()
            yield row(seq, n, vdec)
            return

        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        # exact DECIMAL(20,4): scale-and-round once per event, sum int64s
        vdec_ev = np.rint(pdf["value"].to_numpy() * 1e4).astype("int64")

        if state.exists:
            seq, start, last, n, vdec = state.get
            open_ = True
        else:
            seq = 0
            open_ = False
            start = last = n = vdec = 0

        closed: list[pd.DataFrame] = []
        for t, v in zip(ts_us.tolist(), vdec_ev.tolist()):  # GroupState JSON-serializes: plain ints
            if open_ and t - last > gap_us:
                closed.append(row(seq, n, vdec))
                open_ = False
            if not open_:
                seq += 1
                start, n, vdec = t, 0, 0
                open_ = True
            last = t
            n += 1
            vdec += v

        horizon_ms = last // 1000 + gap_ms
        if open_ and horizon_ms <= state.getCurrentWatermarkMs():
            # watermark already past the horizon: nothing can extend it
            closed.append(row(seq, n, vdec))
            state.remove()
        else:
            state.update((seq, start, last, n, vdec))
            state.setTimeoutTimestamp(horizon_ms)
        if closed:
            yield pd.concat(closed, ignore_index=True)

    return session_group


def stream_sessionize(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Closed sessions as an append stream: (user_id, session_id,
    n_events, session_value).  Scale shape: one exchange on user_id into
    the state store; per-key state is five int64s regardless of session
    length, and the Zipf-head user is a single state key whose per-batch
    work is its own event count — the same bound the batch window pays."""
    # Spark's watermark tracker requires TIMESTAMP (with zone); the events
    # table is NTZ. The session zone is pinned UTC (session.py), so the
    # cast is value-preserving and the µs arithmetic matches the batch twin.
    keyed = (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select("user_id", "ts", "event_id", "value")
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _make_session_group(gap_minutes * 60_000),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
