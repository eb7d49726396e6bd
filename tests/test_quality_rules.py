"""Gopher/C4 document-shape rules, bigram LM, sampling weights, shard
assignment: fixture-verdict goldens + the zero-exchange scale pins."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from intelligent_ocr_spark.functions.quality_rules import c4_filters, gopher_rules
from intelligent_ocr_spark.functions.textstats import (
    bigram_logprob,
    lang_sample_weights,
)
from intelligent_ocr_spark.operators.prep import shard_assign


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _f6(x: float) -> float:
    return math.floor(x * 1e6) / 1e6


@pytest.fixture(scope="module")
def fixture_docs(spark):
    from __spark_entry__ import _QRULE_FIXTURES

    return spark.createDataFrame(_QRULE_FIXTURES, "doc_id long, text string")


def test_gopher_fixture_verdicts(spark, fixture_docs):
    rows = {r["doc_id"]: r for r in gopher_rules(fixture_docs).collect()}
    bullets = rows[2000001]
    assert bullets["bullet_frac"] == 1.0
    assert bullets["ellipsis_frac"] == _f6(2 / 3)
    assert not bullets["passes"]
    good = rows[2000002]
    assert good["n_words"] == 64
    assert good["mean_word_len"] == 4.5
    assert good["stop_hits"] == 6
    assert good["passes"]
    hashes = rows[2000005]
    assert hashes["symbol_ratio"] == 0.6 and not hashes["passes"]
    empty = rows[2000006]
    assert empty["n_words"] == 0 and not empty["passes"]
    short = rows[2000007]
    assert short["n_words"] == 52
    assert short["mean_word_len"] < 3.0 and not short["passes"]
    numeric = rows[2000008]
    assert numeric["alpha_frac"] == 0.0 and not numeric["passes"]


def test_c4_fixture_verdicts(spark, fixture_docs):
    rows = {r["doc_id"]: r for r in c4_filters(fixture_docs).collect()}
    good = rows[2000002]
    assert good["n_kept"] == 4 and good["n_sentences"] == 4 and good["page_kept"]
    lorem = rows[2000003]
    # javascript line dropped, lorem line kept — but the PAGE is dropped
    assert lorem["n_kept"] == 1 and not lorem["page_kept"]
    brace = rows[2000004]
    assert brace["n_kept"] == 1 and not brace["page_kept"]
    bullets = rows[2000001]
    assert bullets["n_kept"] == 0 and not bullets["page_kept"]
    empty = rows[2000006]
    assert empty["n_lines"] == 1 and empty["n_kept"] == 0
    assert empty["cleaned_md5"] == hashlib.md5(b"").hexdigest()


def test_c4_cleaned_md5_pins_bytes(spark, fixture_docs):
    """The md5 is over the kept trimmed lines joined by newlines."""
    row = {r["doc_id"]: r for r in c4_filters(fixture_docs).collect()}[2000002]
    line = "The quick brown foxes have jumped over that lazy dog with style and grace of champions."
    expect = "\n".join([line] * 4).encode()
    assert row["cleaned_md5"] == hashlib.md5(expect).hexdigest()


def test_bigram_logprob_small(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x a"), (3, "a c"), (4, "z")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
    # corpus bigram positions: (a,b)x2 (b,a)x2 (x,a) (a,c)
    # c1: a=3 b=2 x=1 ; c2: "a b"=2 "b a"=2 "x a"=1 "a c"=1
    assert out[1]["n_bigrams"] == 4
    assert out[1]["mean_logprob"] == _f6(
        (math.log(2 / 3) + math.log(2 / 2) + math.log(2 / 3) + math.log(2 / 2)) / 4
    )
    assert out[2]["mean_logprob"] == 0.0
    assert out[3]["mean_logprob"] == _f6(math.log(1 / 3))
    assert 4 not in out  # single-token doc has no bigram positions


def test_bigram_plan_uses_broadcast_head(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = _plan(bigram_logprob(docs))
    assert "BroadcastExchange" in plan  # heavy-hitter head path


def test_lang_sample_weights_exact(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i < 9 else ("fr" if i < 13 else "de")) for i in range(14)],
        "doc_id long, lang string",
    )
    out = {r["lang"]: r for r in lang_sample_weights(docs, budget=100_000).collect()}
    # sqrt(9)=3, sqrt(4)=2, sqrt(1)=1 → micro 3e6/2e6/1e6, total 6e6
    assert out["en"]["n_docs"] == 9
    assert out["en"]["weight"] == 0.5
    assert out["fr"]["weight"] == _f6(2 / 6)
    assert out["de"]["weight"] == _f6(1 / 6)
    assert out["en"]["expected_docs"] == 50_000
    assert out["fr"]["expected_docs"] == 33_333
    assert out["de"]["expected_docs"] == 16_666


def test_shard_assign_deterministic_and_balanced(spark):
    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = shard_assign(docs, n_shards=32).select("doc_id", "shard", "order_key")
    b = shard_assign(docs.repartition(13), n_shards=32).select(
        "doc_id", "shard", "order_key"
    )
    ra, rb = sorted(map(tuple, a.collect())), sorted(map(tuple, b.collect()))
    assert ra == rb  # partitioning-independent
    counts = [0] * 32
    for _, shard, key in ra:
        assert 0 <= shard < 32 and 0 <= key < (1 << 32)
        counts[shard] += 1
    mean = 2000 / 32
    assert min(counts) > mean * 0.5 and max(counts) < mean * 1.6


def test_shard_salt_gives_independent_permutation(spark):
    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["shard"] for r in shard_assign(docs, salt="s0").collect()}
    b = {r["doc_id"]: r["shard"] for r in shard_assign(docs, salt="s1").collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > 400  # ~31/32 of docs should land elsewhere


def test_ruleset_plans_have_no_exchange(spark, fixture_docs):
    """Gopher, C4, and shard assignment are pure projections — at 100 TB
    they run at scan speed with zero shuffle."""
    for df in (
        gopher_rules(fixture_docs),
        c4_filters(fixture_docs),
        shard_assign(fixture_docs.select("doc_id")),
    ):
        assert "Exchange" not in _plan(df)


def test_kn_bigram_logprob_replay(spark):
    """Interpolated KN with d=3/4 replayed in pure Python from the
    definition — continuation counts, per-context fan-out, discount
    mass — on a corpus where backoff matters (repeated contexts with
    multiple continuations)."""
    from collections import Counter

    from intelligent_ocr_spark.functions.textstats import kn_bigram_logprob

    rows = [
        (1, "a b a b a"),
        (2, "x a c"),
        (3, "a c b"),
        (4, "z"),
        (5, "y q"),
        (6, "b a"),
        (7, "c a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = []
    per_doc = {}
    for doc_id, text in rows:
        ts = text.split()
        bgs = list(zip(ts, ts[1:]))
        if bgs:
            per_doc[doc_id] = bgs
            pairs.extend(bgs)
    c12 = Counter(pairs)
    c1 = Counter()
    n1p_w1 = Counter()
    n1p_w2 = Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1p_w1[w1] += 1
        n1p_w2[w2] += 1
    T = len(c12)

    def lnp(w1, w2):
        d = 0.75
        pc = n1p_w2[w2] / T
        return math.log(
            (c12[(w1, w2)] - d) / c1[w1] + d * n1p_w1[w1] / c1[w1] * pc
        )

    out = {r["doc_id"]: r for r in kn_bigram_logprob(docs).collect()}
    for doc_id, bgs in per_doc.items():
        want = sum(lnp(*b) for b in bgs) / len(bgs)
        assert out[doc_id]["n_bigrams"] == len(bgs)
        assert out[doc_id]["mean_logprob"] == _f6(want)
    assert 4 not in out

    # KN separates continuation NOVELTY: (x,a) and (y,q) have identical
    # raw statistics (c12=1, c1=1, context fan-out 1) but "a" follows 3
    # distinct contexts while "q" follows 1 -> higher smoothed mass for
    # the distributionally-promiscuous continuation
    assert c12[("x", "a")] == c12[("y", "q")] == 1
    assert c1["x"] == c1["y"] == 1
    assert lnp("x", "a") > lnp("y", "q")
