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


def test_blocklist_gate_token_boundaries(spark):
    """Whole-token matching (no Scunthorpe substring hits), multiplicity
    in n_hits, sorted distinct audit column, exact floor-scaled fraction,
    and C4's any-hit page gate."""
    from intelligent_ocr_spark.functions.quality_rules import blocklist_gate

    docs = spark.createDataFrame(
        [
            (1, "clean words only here"),
            (2, "spam and more SPAM plus dup"),   # 3 hits, 2 distinct, case-folded
            (3, "scunthorpe classics are fine"),  # substring not a token
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in blocklist_gate(docs, ["dup", "spam", "casino"]).collect()
    }
    assert rows[1]["n_hits"] == 0 and rows[1]["page_kept"]
    assert rows[2]["n_hits"] == 3 and not rows[2]["page_kept"]
    assert rows[2]["hit_words"] == ["dup", "spam"]
    assert rows[2]["hit_frac"] == _f6(3 / 6)
    assert rows[3]["n_hits"] == 0 and rows[3]["page_kept"]  # "scunthorpe" intact
    assert rows[4]["n_hits"] == 0 and rows[4]["hit_frac"] == 0.0


def test_blocklist_gate_plan_is_projection(spark):
    """The gate stays a pure projection: the word list folds into literal
    expressions — no exchange, no Python boundary, no broadcast join."""
    from intelligent_ocr_spark.functions.quality_rules import blocklist_gate

    docs = spark.createDataFrame([(1, "a dup b")], "doc_id long, text string")
    plan = _plan(blocklist_gate(docs, ["dup"]))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_ccnet_buckets_per_language_tertiles(spark):
    """Per-LANGUAGE cuts: a language whose scores all sit below another
    language's whole range still gets its own head/middle/tail split —
    the property the global-threshold gate lacks. Counts per bucket
    follow the >=p67 / >=p33 rule with exact percentiles."""
    from intelligent_ocr_spark.functions.textstats import ccnet_buckets

    # lang a: 6 docs of graded "commonness" (repeats of a common token vs
    # rare-token soup); lang b: 3 docs, all far rarer words than lang a's
    rows = []
    common = "the the the the"
    for i in range(6):
        rows.append((i, common + " " + " ".join(f"w{j}" for j in range(i)), "a"))
    for i in range(6, 9):
        rows.append((i, f"r{i}x r{i}y r{i}z", "b"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = ccnet_buckets(docs).collect()
    by = {(r["lang"], r["bucket"]): r["n_docs"] for r in out}
    # every language has a non-empty head, regardless of absolute scores
    assert by.get(("a", "head"), 0) >= 1
    assert by.get(("b", "head"), 0) >= 1
    assert sum(n for (l, _), n in by.items() if l == "a") == 6
    assert sum(n for (l, _), n in by.items() if l == "b") == 3
    # the tertile rule can't put more than ~2/3 of a language in its head
    assert by.get(("a", "head"), 0) <= 4


def test_flag_columns_match_rule_frames(spark, fixture_docs):
    """Drift guard: the funnel's single-projection flag columns must
    agree row-for-row with the DataFrame rule operators they twin."""
    from intelligent_ocr_spark.functions.quality_rules import (
        _c4_page_kept,
        _gopher_flag,
    )

    flags = {
        r["doc_id"]: r
        for r in fixture_docs.select(
            "doc_id",
            _gopher_flag(F.col("text")).alias("g"),
            _c4_page_kept(F.col("text")).alias("c"),
        ).collect()
    }
    for r in gopher_rules(fixture_docs).collect():
        assert flags[r["doc_id"]]["g"] == r["passes"], r["doc_id"]
    for r in c4_filters(fixture_docs).collect():
        assert flags[r["doc_id"]]["c"] == r["page_kept"], r["doc_id"]


def test_quality_funnel_sequential_attrition(spark):
    """Funnel semantics: stage n_in chains from the previous stage's
    n_out, and a doc failing two gates is charged to the FIRST."""
    from intelligent_ocr_spark.functions.quality_rules import quality_funnel

    good = (
        "The quick brown fox jumps over the lazy dog and keeps going. "
    ) * 8  # passes shape gates, ends with '.', >= 3 sentences? one line
    good = good.strip() + "\nAnd that is the end of it all, with more to come.\n" \
        + "Here is another proper sentence that carries enough words to keep.\n" \
        + "And one more closing line that also ends with a terminal mark."
    docs = spark.createDataFrame(
        [
            (1, good),                      # survives all gates
            (2, "tiny doc"),                # fails gopher (and would fail c4)
            (3, good + " {"),               # passes gopher, fails c4 brace gate
            (4, good + " spam."),           # passes gopher+c4, fails blocklist
        ],
        "doc_id long, text string",
    )
    rows = {r["stage_idx"]: r for r in quality_funnel(docs, ["spam"]).collect()}
    assert rows[1]["n_in"] == 4 and rows[1]["n_dropped"] == 1  # doc 2 charged here
    assert rows[2]["n_in"] == rows[1]["n_out"]
    assert rows[2]["n_dropped"] == 1                            # doc 3
    assert rows[3]["n_in"] == rows[2]["n_out"]
    assert rows[3]["n_dropped"] == 1 and rows[3]["n_out"] == 1  # doc 1 survives
