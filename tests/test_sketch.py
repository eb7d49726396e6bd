"""HLL register sketch (operators/sketch.py): cross-engine exactness is
pinned by the driver oracle (sketch_hll_registers); here: estimate
accuracy vs exact distinct, the shard-merge property, and the plan."""

import math

import pytest

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


# ------------------------------------------------------------ Bloom


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


def test_bloom_no_false_negatives_and_fp_direction(spark):
    from intelligent_ocr_spark.operators.sketch import (
        bloom_build,
        bloom_maybe_contains,
    )

    seen = [f"u{i}" for i in range(300)]
    fresh = [f"x{i}" for i in range(300)]
    bloom = bloom_build(_keys_df(spark, seen), "k", m_bits=8192, k=4)
    got = {
        r.probe_key: r.maybe_present
        for r in bloom_maybe_contains(
            bloom, _keys_df(spark, seen + fresh), "k", m_bits=8192, k=4
        ).collect()
    }
    assert all(got[k] for k in seen)          # NEVER a false negative
    fp = sum(1 for k in fresh if got[k])
    # designed rate (1-e^(-kn/m))^k ~ 0.24% at n=300,m=8192,k=4; allow slack
    assert fp <= 15, fp


def test_bloom_shard_merge_is_word_or(spark):
    from intelligent_ocr_spark.operators.sketch import bloom_build

    a = bloom_build(_keys_df(spark, [f"u{i}" for i in range(50)]), "k")
    b = bloom_build(_keys_df(spark, [f"u{i}" for i in range(50, 100)]), "k")
    both = bloom_build(_keys_df(spark, [f"u{i}" for i in range(100)]), "k")
    merged = {
        r.word: r.bits
        for r in a.unionAll(b).groupBy("word").agg(F.bit_or("bits").alias("bits")).collect()
    }
    assert merged == {r.word: r.bits for r in both.collect()}


def test_bloom_validation(spark):
    from intelligent_ocr_spark.operators.sketch import bloom_build

    df = _keys_df(spark, ["a"])
    with pytest.raises(ValueError):
        bloom_build(df, "k", m_bits=100)
    with pytest.raises(ValueError):
        bloom_build(df, "k", k=0)


# --------------------------------------------------------- Count-min


def test_countmin_never_underestimates_and_is_tight_when_sparse(spark):
    from intelligent_ocr_spark.operators.sketch import (
        countmin_build,
        countmin_estimate,
    )

    # zipf-ish multiplicities: key i occurs (i % 7) + 1 times
    rows = [(f"t{i}",) for i in range(120) for _ in range((i % 7) + 1)]
    df = spark.createDataFrame(rows, "k string")
    exact = {}
    for (k,) in rows:
        exact[k] = exact.get(k, 0) + 1
    cms = countmin_build(df, "k", width=1024, depth=4)
    est = {
        r.probe_key: r.est
        for r in countmin_estimate(
            cms, _keys_df(spark, list(exact)), "k", width=1024, depth=4
        ).collect()
    }
    assert all(est[k] >= exact[k] for k in exact)        # never under
    # 120 keys in 4x1024 cells: collisions rare -> most estimates exact
    assert sum(1 for k in exact if est[k] == exact[k]) >= 110


def test_countmin_shard_merge_is_cellwise_add(spark):
    from intelligent_ocr_spark.operators.sketch import countmin_build

    a_rows = [(f"t{i}",) for i in range(40)]
    b_rows = [(f"t{i}",) for i in range(20, 60)]
    a = countmin_build(spark.createDataFrame(a_rows, "k string"), "k")
    b = countmin_build(spark.createDataFrame(b_rows, "k string"), "k")
    both = countmin_build(
        spark.createDataFrame(a_rows + b_rows, "k string"), "k"
    )
    merged = {
        (r.row, r.col): r.c
        for r in a.unionAll(b).groupBy("row", "col").agg(F.sum("c").alias("c")).collect()
    }
    assert merged == {(r.row, r.col): r.c for r in both.collect()}


def test_countmin_unseen_key_estimates_zero_when_cells_clear(spark):
    from intelligent_ocr_spark.operators.sketch import (
        countmin_build,
        countmin_estimate,
    )

    cms = countmin_build(_keys_df(spark, ["a", "b"]), "k", width=4096, depth=4)
    est = {
        r.probe_key: r.est
        for r in countmin_estimate(
            cms, _keys_df(spark, ["zzz-never-seen"]), "k", width=4096, depth=4
        ).collect()
    }
    # with 2 keys in 4x4096 cells a collision on ALL 4 rows is ~impossible
    assert est["zzz-never-seen"] == 0


def test_bloom_and_countmin_plan_shapes(spark):
    """Build = ONE hash exchange (word/cell agg, map-side combined) +
    broadcast word fill; probe = broadcast join + one probe-key agg —
    the probe side never hash-shuffles on the (possibly skewed) key
    until the final bounded-key aggregation."""
    from intelligent_ocr_spark.operators.sketch import (
        bloom_build,
        bloom_maybe_contains,
        countmin_build,
        countmin_estimate,
    )

    keys = _keys_df(spark, [f"u{i}" for i in range(200)])
    bloom = bloom_build(keys, "k")
    plan = bloom._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan

    probe_plan = (
        bloom_maybe_contains(bloom, keys, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in probe_plan, probe_plan

    cms = countmin_build(keys, "k")
    cms_plan = cms._jdf.queryExecution().executedPlan().toString()
    assert cms_plan.count("Exchange hashpartitioning") == 1, cms_plan
    est_plan = (
        countmin_estimate(cms, keys, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in est_plan, est_plan
