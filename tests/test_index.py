"""Inverted index (operators/index.py) and the salted top-k tournament
(functions/freq.topk_per_key): exactness vs a single-window ground
truth on skewed data, cap/truncation semantics, plan shape."""

from pyspark.sql import Window, functions as F

from intelligent_ocr_spark.functions.freq import topk_per_key
from intelligent_ocr_spark.operators.index import inverted_index


def _skewed(spark):
    # key 'hot' on every row, plus a long tail — doc ids unique per key
    return spark.range(2000).select(
        F.when(F.col("id") % 4 != 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 97).cast("string")))
        .alias("key"),
        F.col("id").alias("o"),
    ).distinct()


def test_topk_matches_single_window(spark):
    rows = _skewed(spark)
    got = sorted(map(tuple, topk_per_key(rows, "key", "o", 7, salt_buckets=8).collect()))
    w = Window.partitionBy("key").orderBy("o")
    want = sorted(
        map(
            tuple,
            rows.withColumn("rn", F.row_number().over(w))
            .filter("rn <= 7")
            .drop("rn")
            .collect(),
        )
    )
    assert got == want and len(got) > 7


def test_topk_small_buckets_edge(spark):
    """k larger than a salt bucket's share still exact (survivor pool
    keeps k per bucket, not k total)."""
    rows = spark.createDataFrame(
        [("a", i) for i in range(30)], "key string, o long"
    )
    got = sorted(r.o for r in topk_per_key(rows, "key", "o", 25, salt_buckets=4).collect())
    assert got == list(range(25))


def test_inverted_index_small_corpus(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the dog sat sat"),   # repeated token collapses
            (3, "THE Cat!"),          # case/punct fold
        ],
        "doc_id long, text string",
    )
    rows = {r.term: r for r in inverted_index(docs, max_postings=2).collect()}
    assert rows["the"].df == 3 and rows["the"].postings == "1|2"
    assert rows["the"].n_postings == 2 and rows["the"].truncated
    assert rows["cat"].df == 2 and rows["cat"].postings == "1|3"
    assert not rows["cat"].truncated
    assert rows["dog"].postings == "2"
    assert rows["sat"].df == 2 and rows["sat"].postings == "1|2"


def test_inverted_index_plan_no_corpus_window(spark):
    """Every window in the plan carries the salt or is over the capped
    survivor pool; the df side is a groupBy (partial agg present)."""
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"), F.lit("a b c the").alias("text")
    )
    plan = (
        inverted_index(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_count" in plan or "HashAggregate" in plan, plan


def test_topk_tournament_bounds_hot_key_partitions(spark):
    """Skew stress: one key carries 10⁶ rows. The tournament's first
    window partitions by (key, crc32(order) % B), so no partition may
    exceed a generous bound around hot_rows / B — and the second window
    sees at most k·B survivors per key. Result still exact."""
    from intelligent_ocr_spark.functions.freq import (
        DEFAULT_SALT_BUCKETS,
        topk_per_key,
    )

    n_hot = 1_000_000
    rows = spark.range(n_hot + 5_000).select(
        F.when(F.col("id") < n_hot, F.lit("hot"))
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 200).cast("string")))
        .alias("key"),
        F.col("id").alias("o"),
    )
    got = sorted(
        r.o for r in topk_per_key(rows, "key", "o", 16).filter("key = 'hot'").collect()
    )
    assert got == list(range(16))
    # boundedness under the actual first-stage partition key
    salted = rows.withColumn(
        "salt", F.pmod(F.crc32(F.col("o").cast("string")), F.lit(DEFAULT_SALT_BUCKETS))
    )
    max_group = (
        salted.groupBy("key", "salt").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_group <= 4 * n_hot // DEFAULT_SALT_BUCKETS, max_group


def test_bm25_ranking_sane(spark):
    """Rarer query terms score higher; a doc matching both terms beats
    single-term docs of equal length; scores non-negative (Lucene idf)."""
    from intelligent_ocr_spark.operators.index import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "rare common filler filler"),
            (2, "common filler filler filler"),
            (3, "rare common filler rare"),
            (4, "filler filler filler filler"),
        ]
        + [(i, "common filler pad pad") for i in range(5, 15)],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, ["rare", "common"], k=5).collect()
    by_doc = {r.doc_id: r for r in rows}
    assert rows[0].doc_id == 3          # two 'rare' hits + 'common'
    assert by_doc[1].rank < by_doc[2].rank   # rare+common beats common-only
    assert all(r.score_mu >= 0 for r in rows)
    assert 4 not in by_doc              # no query term, no score


# ---------------------------------------------------- positional/phrase


def test_positional_postings_zero_exchange(spark):
    from intelligent_ocr_spark.operators.index import positional_postings

    docs = spark.createDataFrame(
        [(1, "the quick fox"), (2, "Quick--fox, the")],
        "doc_id long, text string",
    )
    out = positional_postings(docs)
    got = sorted(tuple(r) for r in out.collect())
    assert got == [
        ("fox", 1, 2), ("fox", 2, 1),
        ("quick", 1, 1), ("quick", 2, 0),
        ("the", 1, 0), ("the", 2, 2),
    ]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_phrase_match_overlapping_and_repeated_terms(spark):
    from intelligent_ocr_spark.operators.index import (
        phrase_match,
        positional_postings,
    )

    docs = spark.createDataFrame(
        [
            (1, "batch batch batch stream"),   # "batch batch" occurs TWICE
            (2, "batch stream batch"),          # never consecutively
            (3, "a batch batch z"),
        ],
        "doc_id long, text string",
    )
    p = positional_postings(docs)
    got = {
        r.doc_id: (r.n_occurrences, r.first_pos)
        for r in phrase_match(p, ["batch", "batch"]).collect()
    }
    assert got == {1: (2, 0), 3: (1, 1)}


def test_phrase_match_three_terms_and_single_term(spark):
    from intelligent_ocr_spark.operators.index import (
        phrase_match,
        positional_postings,
    )
    import pytest

    docs = spark.createDataFrame(
        [(1, "fast key order sort"), (2, "key order fast sort key order")],
        "doc_id long, text string",
    )
    p = positional_postings(docs)
    got = {
        r.doc_id: (r.n_occurrences, r.first_pos)
        for r in phrase_match(p, ["key", "order", "sort"]).collect()
    }
    assert got == {1: (1, 1)}
    single = {
        r.doc_id: (r.n_occurrences, r.first_pos)
        for r in phrase_match(p, ["key"]).collect()
    }
    assert single == {1: (1, 1), 2: (2, 0)}
    with pytest.raises(ValueError):
        phrase_match(p, [])


def test_proximity_match_banded_equals_bruteforce(spark):
    """The banded range join returns exactly the brute-force pair set
    (each qualifying pair lands in exactly one replica bucket)."""
    import itertools
    import random

    from intelligent_ocr_spark.operators.index import (
        positional_postings,
        proximity_match,
    )

    rng = random.Random(7)
    docs = []
    for d in range(30):
        words = [rng.choice(["x", "y", "z", "pad"]) for _ in range(40)]
        docs.append((d, " ".join(words)))
    p = positional_postings(
        spark.createDataFrame(docs, "doc_id long, text string")
    )
    for dist in (1, 3, 8):
        got = {
            r.doc_id: (r.n_pairs, r.min_dist)
            for r in proximity_match(p, "x", "y", max_dist=dist).collect()
        }
        want = {}
        for d, text in docs:
            toks = text.split()
            xa = [i for i, t in enumerate(toks) if t == "x"]
            yb = [i for i, t in enumerate(toks) if t == "y"]
            pairs = [
                abs(i - j)
                for i, j in itertools.product(xa, yb)
                if abs(i - j) <= dist
            ]
            if pairs:
                want[d] = (len(pairs), min(pairs))
        assert got == want, dist


def test_proximity_match_validation(spark):
    import pytest

    from intelligent_ocr_spark.operators.index import (
        positional_postings,
        proximity_match,
    )

    p = positional_postings(
        spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    )
    with pytest.raises(ValueError):
        proximity_match(p, "a", "a")
    with pytest.raises(ValueError):
        proximity_match(p, "a", "b", max_dist=0)


def test_collocations_counts_and_pmi(spark):
    """Pair counts match a brute-force window replay; PMI micro-units
    match the python replay of the identical expression within 1 ulp's
    worth of floor slack; high-PMI pair ranks above the stopword pair."""
    import math
    from collections import Counter

    from intelligent_ocr_spark.operators.index import collocations

    docs = [
        (d, "machine learning " * 3 + "of the " * 6 + "machine of the x")
        for d in range(10)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.term_a, r.term_b): (r.n_pair, r.pmi_micro)
        for r in collocations(df, max_dist=2, min_pair=5).collect()
    }
    # brute force
    pair_c = Counter()
    tok_c = Counter()
    for _, text in docs:
        toks = text.split()
        tok_c.update(toks)
        for i in range(len(toks)):
            for j in range(i + 1, min(i + 3, len(toks))):
                pair_c[tuple(sorted((toks[i], toks[j])))] += 1
    kept = {p: c for p, c in pair_c.items() if c >= 5}
    n_pairs = sum(kept.values())
    n_tok = sum(tok_c.values())
    assert set(got) == set(kept)
    for (a, b), c in kept.items():
        n, pmi = got[(a, b)]
        assert n == c, (a, b)
        want = math.floor(
            1e6 * math.log(float(c) * n_tok * n_tok
                           / (float(n_pairs) * tok_c[a] * tok_c[b]))
        )
        assert abs(pmi - want) <= 1, (a, b, pmi, want)
    # the deliberate collocation outranks the stopword pair
    assert got[("learning", "machine")][1] > got[("of", "the")][1]


def test_proximity_match_hot_document_stress(spark):
    """Pathological density: ONE document of 20k alternating x/y
    tokens. The naive doc_id join would cross-multiply the two 10k
    posting lists (10^8 candidate pairs); the banded join's candidate
    set is bucket-bounded (~12 per width-4 bucket, ~60k total), so
    this finishes in seconds. The count is checked against a linear
    analytic replay, not a materialized cross product."""
    from intelligent_ocr_spark.operators.index import (
        positional_postings,
        proximity_match,
    )

    n = 20000
    text = " ".join("x" if i % 2 == 0 else "y" for i in range(n))
    p = positional_postings(
        spark.createDataFrame([(1, text)], "doc_id long, text string")
    )
    rows = proximity_match(p, "x", "y", max_dist=4).collect()
    # linear replay: x at even i pairs with y at i-3,i-1,i+1,i+3 in range
    want_pairs = sum(
        1
        for i in range(0, n, 2)
        for j in (i - 3, i - 1, i + 1, i + 3)
        if 0 <= j < n
    )
    assert len(rows) == 1
    assert rows[0].n_pairs == want_pairs
    assert rows[0].min_dist == 1


# ---------------------------------------------------- phrase + BM25 hybrid


def test_phrase_bm25_gate_and_rank(spark):
    """The phrase GATE excludes a document whose bag-of-words score is
    the highest in the corpus but which never contains the consecutive
    phrase; among matches, ranking follows the BM25 score of the
    phrase terms; scores equal bm25_topk's for the same docs."""
    from intelligent_ocr_spark.operators.index import (
        bm25_topk,
        phrase_bm25_topk,
    )

    docs = spark.createDataFrame(
        [
            # contains "table scan" once, few term repeats
            (1, "a table scan is slow filler filler"),
            # NO consecutive phrase, but saturated with both terms:
            # highest bag-of-words score in the corpus
            (2, "table filler scan table filler scan table filler scan"),
            # contains the phrase twice
            (3, "table scan table scan filler"),
        ]
        + [(i, "filler pad pad pad") for i in range(4, 12)],
        "doc_id long, text string",
    )
    rows = phrase_bm25_topk(docs, ["table", "scan"], k=5).collect()
    assert [r.doc_id for r in rows] == sorted(
        [r.doc_id for r in rows],
        key=lambda d: next(-x.score_mu for x in rows if x.doc_id == d),
    )
    by_doc = {r.doc_id: r for r in rows}
    assert set(by_doc) == {1, 3}          # doc 2 gated out despite top score
    assert by_doc[3].n_occurrences == 2
    assert by_doc[1].n_occurrences == 1
    assert by_doc[3].rank == 1            # more hits, shorter doc

    # score parity with the pure ranker over the same corpus
    full = {r.doc_id: r.score_mu for r in bm25_topk(docs, ["scan", "table"], k=11).collect()}
    for d, r in by_doc.items():
        assert r.score_mu == full[d]


def test_phrase_bm25_repeated_term_phrase(spark):
    """A repeated-term phrase dedups its term set for scoring and still
    gates on consecutive occurrence."""
    from intelligent_ocr_spark.operators.index import phrase_bm25_topk

    docs = spark.createDataFrame(
        [(1, "batch batch end"), (2, "batch end batch"), (3, "x y z")],
        "doc_id long, text string",
    )
    rows = phrase_bm25_topk(docs, ["batch", "batch"], k=3).collect()
    assert [r.doc_id for r in rows] == [1]
