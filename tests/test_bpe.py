"""Relational BPE training (operators/bpe.py) vs an independent Python
replay of Sennrich et al. 2016 — merges, final vocab state, and
per-doc token counts must agree exactly."""

import re
from collections import Counter

from pyspark.sql import functions as F

from intelligent_ocr_spark.operators.bpe import bpe_token_counts, bpe_train


def py_bpe(words_freq, n):
    """Reference implementation: leftmost-greedy merge, ties broken by
    (count desc, pair asc)."""
    state = {w: tuple(list(w) + ["</w>"]) for w in words_freq}
    merges = []
    for r in range(n):
        pc = Counter()
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += words_freq[w]
        if not pc:
            break
        bc = max(pc.values())
        a, b = sorted(p for p, c in pc.items() if c == bc)[0]
        merges.append((r + 1, a, b, a + b, bc))
        nxt = {}
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[w] = tuple(out)
        state = nxt
    return merges, state


CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ate the rat"),
    (2, "low lower lowest low low"),
    (3, "newer newest new new news"),
]


def _tok(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def test_bpe_train_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wf = Counter(t for _, s in CORPUS for t in _tok(s))
    exp_merges, exp_state = py_bpe(wf, 10)
    merges, vocab = bpe_train(df, n_merges=10)
    assert merges == exp_merges
    got_state = {
        r["w"]: tuple(r["arr"])
        for r in vocab.select(
            "w", F.split(F.trim(F.col("s")), "  ").alias("arr")
        ).collect()
    }
    assert got_state == exp_state


def test_bpe_overlapping_pair_is_leftmost_greedy(spark):
    """'aaaa' under merge (a,a): leftmost-greedy gives [aa, aa, </w>],
    never the overlapping [a, aa, a] reading."""
    df = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa")], "doc_id long, text string"
    )
    merges, vocab = bpe_train(df, n_merges=1)
    assert merges[0][1:4] == ("a", "a", "aa")
    (row,) = vocab.collect()
    assert row["s"] == " aa  aa  </w> "


def test_bpe_stops_when_out_of_pairs(spark):
    """A corpus whose every word collapses to one symbol stops early
    (fewer merges than asked, no crash on the single-symbol state)."""
    df = spark.createDataFrame([(0, "ab ab ab")], "doc_id long, text string")
    merges, vocab = bpe_train(df, n_merges=50)
    # ab -> a+b, then ab+</w>: two merges exhaust the corpus
    assert [m[3] for m in merges] == ["ab", "ab</w>"]
    (row,) = vocab.collect()
    assert row["s"] == " ab</w> "


def test_bpe_token_counts_known_answer(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wf = Counter(t for _, s in CORPUS for t in _tok(s))
    exp_merges, exp_state = py_bpe(wf, 10)
    _, vocab = bpe_train(df, n_merges=10)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_counts(df, vocab).collect()
    }
    for doc_id, text in CORPUS:
        toks = _tok(text)
        exp_bpe = sum(len(exp_state[t]) for t in toks)
        assert got[doc_id] == (len(toks), exp_bpe), doc_id


def test_bpe_tokenize_exact_stream(spark):
    """Tokenize must reproduce the sequential tokenizer's exact subword
    stream: python-replay the merges, split each word, compare
    position-for-position."""
    from intelligent_ocr_spark.operators.bpe import bpe_tokenize

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wf = Counter(t for _, s in CORPUS for t in _tok(s))
    _, exp_state = py_bpe(wf, 10)
    _, vocab = bpe_train(df, n_merges=10)
    got = {}
    for r in bpe_tokenize(df, vocab).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["word_idx"], r["sym_idx"], r["token"])
        )
    for doc_id, text in CORPUS:
        expected = [
            (wi, si, sym)
            for wi, w in enumerate(_tok(text))
            for si, sym in enumerate(exp_state[w])
        ]
        assert sorted(got[doc_id]) == expected, doc_id
