"""As-of join known-answer tests (backward semantics, per-key groups,
no-match NULLs)."""

from datetime import datetime

from intelligent_ocr_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "e1"),
            (1, _ts("2024-01-01 12:00:00"), "e2"),
            (2, _ts("2024-01-01 09:00:00"), "e3"),  # before any right row
            (3, _ts("2024-01-01 10:00:00"), "e4"),  # key with no right rows
        ],
        "user_id int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 10.0),
            (1, _ts("2024-01-01 11:00:00"), 20.0),
            (2, _ts("2024-01-01 09:30:00"), 30.0),
        ],
        "user_id int, ts timestamp, value double",
    )
    out = {
        r["tag"]: (r["ts_r"], r["value_r"])
        for r in asof_join(left, right, on="ts", by="user_id", payload=["value"]).collect()
    }
    assert out["e1"] == (_ts("2024-01-01 09:30:00"), 10.0)  # latest ≤ 10:00
    assert out["e2"] == (_ts("2024-01-01 11:00:00"), 20.0)  # skips to newest
    assert out["e3"] == (None, None)  # nothing at or before
    assert out["e4"] == (None, None)  # key absent on the right


def test_asof_null_semantics(spark):
    """SQL join semantics for NULLs: a NULL timestamp or NULL key never
    matches (and must never crash merge_asof, which raises on null keys)."""
    left = spark.createDataFrame(
        [
            (1, None, "null-ts"),
            (None, _ts("2024-01-01 10:00:00"), "null-key"),
            (1, _ts("2024-01-01 10:00:00"), "normal"),
        ],
        "user_id int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), 1.0),
            (1, None, 2.0),  # null right ts: can never match
            (None, _ts("2024-01-01 09:00:00"), 3.0),  # null right key: never matches
        ],
        "user_id int, ts timestamp, value double",
    )
    out = {
        r["tag"]: (r["ts_r"], r["value_r"])
        for r in asof_join(left, right, on="ts", by="user_id", payload=["value"]).collect()
    }
    assert out["null-ts"] == (None, None)
    assert out["null-key"] == (None, None)
    assert out["normal"] == (_ts("2024-01-01 09:00:00"), 1.0)


def test_asof_exact_timestamp_match(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 11:00:00"), "x")], "user_id int, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 11:00:00"), 7.0)], "user_id int, ts timestamp, value double"
    )
    row = asof_join(left, right, on="ts", by="user_id", payload=["value"]).collect()[0]
    assert row["value_r"] == 7.0  # <= is inclusive
