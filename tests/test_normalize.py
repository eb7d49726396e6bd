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


def test_table_no_cross_group_conflicts():
    """Each char belongs to at most one group, so the table's semantics are
    order-independent (no later-line-wins surprises)."""
    from intelligent_ocr_spark.functions.variants_data import VARIANTS_TEXT

    lines = [l.strip() for l in VARIANTS_TEXT.splitlines() if l.strip()]
    owner: dict[str, int] = {}
    for i, line in enumerate(lines):
        assert len(set(line)) == len(line), f"within-line duplicate: {line}"
        for c in line:
            assert owner.setdefault(c, i) == i, f"{c!r} in two groups"
    assert len(lines) >= 300  # expanded table, not the original 52


def test_expanded_groups_beyond_round1_set():
    """Groups absent from the original 52-group table: jōyō
    shinjitai–kyūjitai pairs and classical 異體字."""
    n = get_normalizer()
    # kyūjitai section: shinjitai folds to the traditional form
    assert n.normalize("国学体変駅広") == "國學體變驛廣"
    assert n.normalize("黃河旣来, 爾等无恙") == "黃河既來, 爾等無恙"
    assert n.normalize("扵衆") == "於眾"
    # classical standalone chars must survive (omitted merge pairs)
    assert n.normalize("余予才缶糸虫台") == "余予才缶糸虫台"
    assert n.variant_count > 600


def test_load_variants_from_path(tmp_path):
    p = tmp_path / "variants.txt"
    p.write_text("甲乙\n", encoding="utf-8")
    n = VariantNormalizer(variants_path=str(p))
    assert n.normalize("乙") == "甲"
    with pytest.raises(ValueError):
        VariantNormalizer(variants_text="a b", variants_path=str(p))


def test_env_var_table_seam(tmp_path, monkeypatch):
    import intelligent_ocr_spark.functions.normalize as N

    p = tmp_path / "variants.txt"
    p.write_text("甲乙\n", encoding="utf-8")
    monkeypatch.setattr(N, "_SINGLETON", None)
    monkeypatch.setenv("SPARK_GRAFT_VARIANTS_PATH", str(p))
    try:
        assert N.get_normalizer().normalize("乙") == "甲"
    finally:
        monkeypatch.setattr(N, "_SINGLETON", None)  # don't poison other tests


def test_variants_icu_regen(spark):
    """The checked-in ICU/CLDR-generated table is exactly what the
    generator reproduces from the session JVM's own icu4j data — no
    hand edits can drift in, and the provenance claim stays checkable."""
    import sys

    sys.path.insert(0, ".")
    try:
        from tools_gen_variants import generate_lines
    finally:
        sys.path.pop(0)
    try:
        spark._jvm.com.ibm.icu.text.Transliterator  # noqa: B018
    except Exception:
        pytest.skip("icu4j not on the JVM classpath")
    from intelligent_ocr_spark.functions.variants_icu import VARIANTS_ICU_TEXT

    regenerated = generate_lines(spark)
    checked_in = [l for l in VARIANTS_ICU_TEXT.splitlines() if l.strip()]
    assert regenerated == checked_in


def test_combined_table_char_uniqueness_across_sections():
    """Each char belongs to at most one group across the curated AND
    generated sections (order-independent behavior of the combined
    table)."""
    from intelligent_ocr_spark.functions.variants_data import VARIANTS_TEXT

    seen: dict = {}
    for ln, line in enumerate(VARIANTS_TEXT.splitlines()):
        for c in line.strip():
            assert c not in seen, (c, seen[c], ln)
            seen[c] = ln
    assert len(seen) >= 5000  # the round-4 coverage bar
