"""Text normalization kernel: NFKC + variant-character canonicalization.

Reproduces the reference's per-result normalization chain
(``core/pdf_processor.py:631-665``):

1. ``text = unicodedata.normalize('NFKC', raw.strip())``
2. if the variant table would change the text, the normalized twin is
   ALSO emitted at the same position ("dual insert",
   ``core/pdf_processor.py:661-665``) so search hits either form.

Variant semantics (``core/variants.py:1219-1248``): per-character dict
substitution; table lines are groups whose FIRST character is canonical.

Spark-first design: the mapping dict is tiny (O(10k) entries), so it is
pickled into the UDF closure ONCE per python worker via a module-level
lazy singleton (same lifecycle pattern as the reference's per-process OCR
engine warm-up, ``core/parallel_ocr.py:149-173``) and applied with
``str.translate`` — a single C-level pass per string, fully vectorized
under Arrow batching. No per-row Python beyond the translate call.
At 1000-executor scale this is a broadcast-variable read, never a join.
"""

from __future__ import annotations

import unicodedata
from collections.abc import Iterable

import pandas as pd

from intelligent_ocr_spark.functions.variants_data import VARIANTS_TEXT

__all__ = [
    "parse_variant_lines",
    "build_translation",
    "VariantNormalizer",
    "get_normalizer",
    "nfkc",
    "nfkc_series",
]


def parse_variant_lines(lines: Iterable[str]) -> dict[str, str]:
    """Parse variant groups into char→canonical.

    Rule (reference ``core/variants.py:1219-1232``): strip each line, skip
    empty and single-char lines, first char is canonical, every char on the
    line (including the canonical itself) maps to it. Later lines win on
    conflict, matching dict-update order.
    """
    mapping: dict[str, str] = {}
    for line in lines:
        line = line.strip()
        if not line:
            continue
        chars = list(line)
        if len(chars) < 2:
            continue
        canonical = chars[0]
        for c in chars:
            mapping[c] = canonical
    return mapping


def build_translation(mapping: dict[str, str]) -> dict[int, str]:
    """Compile char→canonical into a ``str.translate`` table.

    Identity entries are dropped: ``translate`` leaves unmapped code points
    unchanged, so only true rewrites are kept (smaller table, faster pass).
    """
    return {ord(k): v for k, v in mapping.items() if k != v}


class VariantNormalizer:
    """Vectorized variant normalizer over pandas Series / plain strings."""

    def __init__(
        self, variants_text: str | None = None, variants_path: str | None = None
    ):
        if variants_text is not None and variants_path is not None:
            raise ValueError("pass variants_text OR variants_path, not both")
        if variants_path is not None:
            with open(variants_path, encoding="utf-8") as f:
                text = f.read()
        else:
            text = VARIANTS_TEXT if variants_text is None else variants_text
        self.mapping = parse_variant_lines(text.splitlines())
        self._table = build_translation(self.mapping)
        # chars whose translation differs — isdisjoint() scans the string at
        # C speed, so the common no-variant case costs one set probe pass
        self._rewrite_chars = frozenset(chr(cp) for cp in self._table)

    def normalize(self, text: str) -> str:
        """Char-wise canonicalization (reference ``core/variants.py:1234-1248``)."""
        return text.translate(self._table)

    def needs_normalization(self, text: str) -> bool:
        """True iff :meth:`normalize` would change ``text``
        (reference ``core/variants.py:1265-1284``)."""
        return not self._rewrite_chars.isdisjoint(text)

    def normalize_series(self, s: pd.Series) -> pd.Series:
        """Vectorized normalize over a string Series (one C pass per value)."""
        table = self._table
        return s.map(lambda t: t.translate(table) if isinstance(t, str) else t)

    @property
    def variant_count(self) -> int:
        return len(self.mapping)


_SINGLETON: VariantNormalizer | None = None


def get_normalizer() -> VariantNormalizer:
    """Executor-global lazy singleton (one init per python worker process).

    Same pattern the reference uses for its per-process model warm-up
    (``core/parallel_ocr.py:149-173``): module-level global, initialized on
    first use, fork/spawn-safe because construction is pure and idempotent.
    """
    global _SINGLETON
    if _SINGLETON is None:
        import os

        path = os.environ.get("SPARK_GRAFT_VARIANTS_PATH")
        # production seam: ship a full-size table (e.g. Unihan-derived) to
        # executors via --files and point this env var at it — no code change
        _SINGLETON = VariantNormalizer(variants_path=path) if path else VariantNormalizer()
    return _SINGLETON


def nfkc(text: str) -> str:
    """NFKC-normalize a stripped string (reference ``core/pdf_processor.py:631``)."""
    return unicodedata.normalize("NFKC", text.strip())


def nfkc_series(s: pd.Series) -> pd.Series:
    """Vectorized strip+NFKC over a string Series."""
    return s.str.strip().str.normalize("NFKC")
