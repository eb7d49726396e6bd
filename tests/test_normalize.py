# -*- coding: utf-8 -*-
"""Normalization kernel tests (reference semantics: core/variants.py,
core/pdf_processor.py:631-665)."""

import pandas as pd
import pytest
from hypothesis import given
from hypothesis import strategies as st

from intelligent_ocr_spark.functions.normalize import (
    VariantNormalizer,
    get_normalizer,
    nfkc,
    nfkc_series,
    parse_variant_lines,
)


def test_parse_first_char_canonical():
    m = parse_variant_lines(["奇竒", "", "為爲为", "單"])
    assert m["竒"] == "奇"
    assert m["奇"] == "奇"  # canonical maps to itself
    assert m["爲"] == "為" and m["为"] == "為"
    assert "單" not in m  # single-char lines skipped


def test_normalize_and_needs_normalization():
    n = VariantNormalizer("奇竒\n藏蔵\n")
    assert n.normalize("竒書蔵於山") == "奇書藏於山"
    assert n.needs_normalization("竒書")
    assert not n.needs_normalization("奇書")  # already canonical
    assert n.normalize("plain ascii") == "plain ascii"


def test_builtin_table_examples():
    n = get_normalizer()
    assert n.normalize("竒") == "奇"
    assert n.normalize("蔵") == "藏"
    assert n.normalize("爲政") == "為政"
    assert n.variant_count > 50


def test_normalize_series_matches_scalar():
    n = get_normalizer()
    s = pd.Series(["竒蔵爲", "abc", None, "囘畧"])
    out = n.normalize_series(s)
    assert out[0] == "奇藏為"
    assert out[1] == "abc"
    assert out[2] is None
    assert out[3] == "回略"


def test_nfkc():
    # full-width → ascii, strip applied first (reference :631)
    assert nfkc("  ＡＢＣ１２３  ") == "ABC123"
    assert nfkc(" ") == ""  # nbsp strips to empty
    s = nfkc_series(pd.Series(["  ｶﾞ  ", "ＡＢ"]))
    assert s[0] == "ガ" and s[1] == "AB"


@given(st.text(max_size=200))
def test_normalize_idempotent(text):
    """normalize(normalize(x)) == normalize(x): canonical chars are fixed
    points because the first char of each group maps to itself."""
    n = get_normalizer()
    once = n.normalize(text)
    assert n.normalize(once) == once


@given(st.text(max_size=200))
def test_needs_normalization_consistent(text):
    n = get_normalizer()
    assert n.needs_normalization(text) == (n.normalize(text) != text)
