"""Streaming sessionization: cross-micro-batch equivalence against a
pure-Python replay of the batch (lag + cumsum) session semantics."""

import os

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from intelligent_ocr_spark.streaming.sessions import stream_sessionize

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
GAP_US = 30 * 60 * 1_000_000
WM_US = 10 * 60 * 1_000_000


def _python_sessions():
    """Replay gap-sessionization + the emitted-set rule in plain Python.

    Emitted = every closed session: a session closes in-batch when the
    user's next event proves the gap, or by watermark timeout when the
    FINAL watermark (global max ts − delay) passes last_ts + gap. Each
    user's final session stays open unless the timeout rule closes it.
    """
    rows = duckdb.sql(
        f"""
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(round(value * 10000) AS BIGINT) AS vdec
        FROM '{SF_DIR}/events.parquet'
        ORDER BY user_id, ts, event_id
        """
    ).fetchall()
    max_us = max(r[1] for r in rows)
    final_wm = max_us - WM_US
    out = []
    cur = None  # (user, seq, last_us, n, vdec)
    for user, us, _eid, vdec in rows:
        if cur is not None and (cur[0] != user or us - cur[2] > GAP_US):
            out.append((cur[0], cur[1], cur[3], cur[4], cur[2], False))
            cur = None
        if cur is None:
            seq = 1 if not out or out[-1][0] != user else out[-1][1] + 1
            # seq restarts per user: count sessions seen for this user
            seq = sum(1 for o in out if o[0] == user) + 1
            cur = [user, seq, us, 1, vdec]
        else:
            cur[2] = us
            cur[3] += 1
            cur[4] += vdec
    if cur is not None:
        out.append((cur[0], cur[1], cur[3], cur[4], cur[2], True))
    emitted = []
    opens = []
    for user, seq, n, vdec, last_us, is_final in out:
        # a user's non-final sessions closed in-batch; the final one only
        # closes if the final watermark passed its horizon
        later = any(o[0] == user and o[1] > seq for o in out)
        if later or last_us + GAP_US <= final_wm:
            emitted.append((user, seq, n, round(vdec / 1e4, 4)))
        else:
            opens.append((user, seq))
    return sorted(emitted), opens


def test_stream_sessionize_matches_replay(spark, tmp_path):
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    qs = [
        r[0]
        for r in ev.select(
            F.percentile_approx("ts", [0.25, 0.5, 0.75], 10000)
        ).collect()
    ][0]
    slices = [
        ev.filter(F.col("ts") <= qs[0]),
        ev.filter((F.col("ts") > qs[0]) & (F.col("ts") <= qs[1])),
        ev.filter((F.col("ts") > qs[1]) & (F.col("ts") <= qs[2])),
        ev.filter(F.col("ts") > qs[2]),
    ]
    for i, s in enumerate(slices):  # sequential writes: increasing mtimes
        s.coalesce(1).write.parquet(f"{inp}/b{i}")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp + "/b*")
    )
    q = (
        stream_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r["user_id"], r["session_id"], r["n_events"], round(r["session_value"], 4))
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    )
    want, opens = _python_sessions()
    assert got == want
    # the withheld sessions are exactly each remaining open one — emitting
    # them would be wrong (an event could still extend them)
    got_keys = {(u, s) for u, s, _, _ in got}
    assert got_keys.isdisjoint(set(opens))
    assert len(opens) >= 1  # the fixture leaves at least one user mid-session


def test_stream_sessionize_numbers_match_batch_twin(spark, tmp_path):
    """session_id ordinals and aggregates agree with the batch w5 query
    for every session the stream emitted (the stream withholds only
    still-open sessions, it never renumbers)."""
    import __spark_entry__ as entry

    want, _ = _python_sessions()
    batch = {
        (r["user_id"], r["session_id"]): (r["n_events"], round(r["session_value"], 4))
        for r in entry.queries()["w5_sessionize"](spark, SF_DIR).collect()
    }
    for user, seq, n, v in want:
        assert batch[(user, seq)] == (n, v)


def test_in_batch_split_and_state_shape(spark):
    """Unit-drive the group fn: one batch holding two sessions emits the
    first and holds the second open with exact folded state."""
    import pandas as pd

    from intelligent_ocr_spark.streaming.sessions import _make_session_group

    class FakeState:
        hasTimedOut = False
        exists = False
        updated = None
        timeout_ms = None
        wm = 0

        def getCurrentWatermarkMs(self):
            return self.wm

        def update(self, v):
            self.updated = v

        def setTimeoutTimestamp(self, ms):
            self.timeout_ms = ms

        def remove(self):
            raise AssertionError("open session must stay in state")

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    pdf = pd.DataFrame(
        {
            "user_id": [7, 7, 7],
            "ts": pd.to_datetime([t0, t0 + np.timedelta64(60, "s"),
                                  t0 + np.timedelta64(3600, "s")]),
            "event_id": [1, 2, 3],
            "value": [1.25, 2.5, 10.0],
        }
    )
    st = FakeState()
    fn = _make_session_group(gap_ms=30 * 60_000)
    out = pd.concat(list(fn((7,), iter([pdf]), st)), ignore_index=True)
    assert out.to_dict("records") == [
        {"user_id": 7, "session_id": 1, "n_events": 2, "session_value": 3.75}
    ]
    assert st.updated == (2, int(pdf["ts"][2].value // 1000),
                          int(pdf["ts"][2].value // 1000), 1, 100_000)
    assert st.timeout_ms == pdf["ts"][2].value // 1_000_000 + 30 * 60_000
