"""HLL register sketch (operators/sketch.py): cross-engine exactness is
pinned by the driver oracle (sketch_hll_registers); here: estimate
accuracy vs exact distinct, the shard-merge property, and the plan."""

import math

from pyspark.sql import functions as F

from intelligent_ocr_spark.operators.sketch import hll_estimate, hll_registers


def _regs(spark, n_rows, n_distinct, p=8):
    df = spark.range(n_rows).select(
        F.concat(F.lit("u"), (F.col("id") % n_distinct).cast("string")).alias("k")
    )
    return hll_registers(df, "k", p=p)


def test_estimate_within_standard_error(spark):
    for true in (40, 300, 5000):
        regs = [(r.bucket, r.rho) for r in _regs(spark, 20000, true).collect()]
        assert len(regs) == 256
        est = hll_estimate(regs)
        # 1.04/sqrt(256) ~ 6.5%; allow 4 sigma
        assert abs(est - true) / true < 0.26, (true, est)


def test_duplicates_do_not_move_registers(spark):
    a = sorted(map(tuple, _regs(spark, 500, 100).collect()))
    b = sorted(map(tuple, _regs(spark, 50000, 100).collect()))
    assert a == b


def test_shard_merge_is_bucket_max(spark):
    """Registers of a union == per-bucket max of per-shard registers —
    the property that lets incremental runs merge sketches."""
    df = spark.range(3000).select(
        F.concat(F.lit("u"), (F.col("id") % 777).cast("string")).alias("k"),
        (F.col("id") % 2).alias("shard"),
    )
    whole = sorted(map(tuple, hll_registers(df, "k").collect()))
    s0 = hll_registers(df.filter("shard = 0"), "k")
    s1 = hll_registers(df.filter("shard = 1"), "k")
    merged = sorted(
        map(
            tuple,
            s0.union(s1)
            .groupBy("bucket")
            .agg(F.max("rho").alias("rho"))
            .collect(),
        )
    )
    assert whole == merged


def test_plan_one_exchange_and_broadcast(spark):
    """One hash exchange (the 2^p-key agg); the empty-bucket fill is a
    broadcast join; no distinct anywhere."""
    plan = (
        _regs(spark, 1000, 50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_p_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        hll_registers(spark.range(1).select(F.lit("x").alias("k")), "k", p=10)
