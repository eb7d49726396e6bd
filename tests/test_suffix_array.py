"""Distributed suffix array (prefix doubling): exact vs a sorted-suffix
python reference at small scale, property checks at larger scale."""

import random

from pyspark.sql import functions as F

from intelligent_ocr_spark.operators.suffix import (
    _SEP,
    adjacent_lcp,
    corpus_positions,
    duplicate_spans,
    remove_duplicate_spans,
    suffix_array,
    suffix_array_levels,
)


def _corpus(texts: list[str]) -> str:
    return "".join(t + _SEP for t in texts)


def _sa_ref(s: str) -> list[int]:
    """1-based positions of all suffixes, sorted lexicographically.
    O(n^2 log n) slices — fine for the small exact fixtures."""
    return [i + 1 for i in sorted(range(len(s)), key=lambda i: s[i:])]


def _docs_df(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_suffix_array_exact_small(spark):
    texts = [
        "banana",
        "the quick brown fox the quick brown fox",
        "",                      # empty doc: contributes only the separator
        "漢字と kana が混ざった",  # multibyte: char (not byte) positions
        "aaaaaaa",               # degenerate run: worst-case doubling depth
    ]
    s = _corpus(texts)
    got = suffix_array(_docs_df(spark, texts)).collect()
    assert [r["pos"] for r in sorted(got, key=lambda r: r["rk"])] == _sa_ref(s)
    assert [r["rk"] for r in sorted(got, key=lambda r: r["rk"])] == list(
        range(len(s))
    )


def test_corpus_positions_reconstruct(spark):
    texts = ["ab", "", "xyz"]
    rows = corpus_positions(_docs_df(spark, texts)).collect()
    s = "".join(r["ch"] for r in sorted(rows, key=lambda r: r["pos"]))
    assert s == _corpus(texts)
    assert sorted(r["pos"] for r in rows) == list(range(1, len(s) + 1))


def test_suffix_array_properties_at_scale(spark):
    """~60k-char corpus with heavy boilerplate repeats (deep doubling):
    output is a permutation of positions, and suffixes at sampled
    adjacent ranks compare in true string order."""
    rng = random.Random(7)
    boiler = "subscribe to our newsletter for updates " * 8  # 320-char repeat
    texts = [
        boiler + "".join(rng.choice("abcdefg ") for _ in range(rng.randrange(40, 200)))
        for _ in range(200)
    ]
    s = _corpus(texts)
    got = suffix_array(_docs_df(spark, texts)).collect()
    by_rk = [r["pos"] for r in sorted(got, key=lambda r: r["rk"])]
    assert sorted(by_rk) == list(range(1, len(s) + 1))  # permutation
    for _ in range(400):
        i = rng.randrange(len(s) - 1)
        a, b = by_rk[i] - 1, by_rk[i + 1] - 1
        assert s[a:] < s[b:], (i, a, b)


def _lcp(a: str, b: str) -> int:
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return n


def test_adjacent_lcp_exact(spark):
    """Binary-lifted LCP equals the direct char-compare LCP of every
    rank-adjacent suffix pair, and max(lcp) finds the planted longest
    repeated substring."""
    repeat = "unsubscribe at any time from this mailing list"
    texts = [
        "alpha " + repeat + " omega",
        "start " + repeat + " end",
        "banana bandana",
        "短い日本語のテキスト",
    ]
    s = _corpus(texts)
    sa, levels = suffix_array_levels(_docs_df(spark, texts))
    rows = adjacent_lcp(sa, levels).collect()
    suf = _sa_ref(s)
    assert len(rows) == len(s) - 1
    for r in sorted(rows, key=lambda r: r["rk"]):
        assert r["pos_a"] == suf[r["rk"]] and r["pos_b"] == suf[r["rk"] + 1]
        expect = _lcp(s[r["pos_a"] - 1 :], s[r["pos_b"] - 1 :])
        assert r["lcp"] == expect, (r, expect)
    # the planted repeat extends one space on each side (" R " in both)
    assert max(r["lcp"] for r in rows) == len(repeat) + 2


def _dup_spans_ref(texts: list[str], min_len: int) -> list[tuple]:
    """Independent python pipeline: sorted-suffix SA → adjacent LCP →
    both-endpoint intervals → doc mapping with boundary clip → merge."""
    s = _corpus(texts)
    sa = _sa_ref(s)
    intervals = []
    for i in range(len(sa) - 1):
        l = _lcp(s[sa[i] - 1 :], s[sa[i + 1] - 1 :])
        if l >= min_len:
            intervals += [(sa[i], l), (sa[i + 1], l)]
    bounds, off = [], 0
    for d, t in enumerate(texts):
        bounds.append((d, off, len(t)))
        off += len(t) + 1
    per_doc: dict = {}
    for s0, l in intervals:
        for d, o, n in bounds:
            if o < s0 <= o + n:
                per_doc.setdefault(d, []).append((s0 - o, min(s0 - o + l - 1, n)))
    out = []
    for d, ivs in sorted(per_doc.items()):
        merged = []
        for st, en in sorted(ivs):
            if merged and st <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], en))
            else:
                merged.append((st, en))
        out += [(d, st, en, en - st + 1) for st, en in merged]
    return out


def test_duplicate_spans_match_python_reference(spark):
    boiler = "all rights reserved worldwide"
    texts = [
        "intro text here " + boiler + " and a tail",
        "other opening " + boiler + " closing words",
        boiler,                                   # doc that IS the repeat
        "nothing shared with anyone else at all",
        "xx " + boiler + " yy " + boiler + " zz", # two spans, may merge
    ]
    got = [
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in duplicate_spans(_docs_df(spark, texts), min_len=12).collect()
    ]
    assert got == _dup_spans_ref(texts, 12)
    # the fully-duplicated doc is covered end to end
    full = [r for r in got if r[0] == 2]
    assert full == [(2, 1, len(boiler), len(boiler))]


def test_duplicate_spans_randomized(spark):
    rng = random.Random(11)
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(5, 30)))
        for _ in range(25)
    ]
    got = [
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in duplicate_spans(_docs_df(spark, texts), min_len=14).collect()
    ]
    assert got == _dup_spans_ref(texts, 14)


def test_remove_duplicate_spans_matches_reference(spark):
    """Cleaned text equals cutting the python-reference spans out of
    each doc; untouched docs pass through byte-identical."""
    boiler = "all rights reserved worldwide"
    texts = [
        "intro text here " + boiler + " and a tail",
        "other opening " + boiler + " closing words",
        boiler,                                    # removed entirely
        "nothing shared with anyone else at all",  # untouched
        "",                                        # empty doc
    ]
    expect_spans: dict = {}
    for d, st, en, _ in _dup_spans_ref(texts, 12):
        expect_spans.setdefault(d, []).append((st, en))
    got = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(_docs_df(spark, texts), min_len=12).collect()
    }
    for d, text in enumerate(texts):
        keep = [
            ch
            for i, ch in enumerate(text, start=1)
            if not any(st <= i <= en for st, en in expect_spans.get(d, []))
        ]
        assert got[d]["clean_text"] == "".join(keep), d
        assert got[d]["orig_chars"] == len(text)
        assert got[d]["removed_chars"] == len(text) - len(keep)
        assert got[d]["n_spans"] == len(expect_spans.get(d, []))
    assert got[2]["clean_text"] == ""  # whole-doc repeat removed
    assert got[3]["clean_text"] == texts[3]


def test_suffix_array_empty_and_convergence_guard(spark):
    assert suffix_array(_docs_df(spark, [])).count() == 0
    # round-0 seeds at h=4, so forcing non-convergence in one doubling
    # round needs a repeat the h=8 level still cannot separate
    df = _docs_df(spark, ["abcdefghijklmnop" * 4])
    try:
        suffix_array(df, max_rounds=1)
    except RuntimeError as e:
        assert "converge" in str(e)
    else:  # pragma: no cover
        raise AssertionError("expected non-convergence to raise")


def test_suffix_array_plan_is_distributed(spark):
    """No global single-partition window anywhere: the per-round fold is
    a vectorized mapInPandas over a RANGE exchange (both hidden behind
    each round's checkpoint), never a Window — pin the visible plans."""
    df = _docs_df(spark, ["banana", "bandana"])
    cp = corpus_positions(df)
    cp_plan = cp._jdf.queryExecution().executedPlan().toString()
    # offsets come back via broadcast; the only shuffle was the range
    # exchange inside the checkpointed fold
    assert "Window" not in cp_plan
    assert "Exchange hashpartitioning" not in cp_plan
    assert "BroadcastHashJoin" in cp_plan
    sa_plan = suffix_array(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in sa_plan
