# -*- coding: utf-8 -*-
"""FROZEN golden fixtures (FIXTURES.md §2): literal hashes computed once
and pinned. Unlike test_extract_spark's distributed-vs-local comparison
(which would pass if both paths changed together), these constants catch
ANY behavioral drift of the extraction semantics — generator, parser,
layout, normalization, span assembly.

If a deliberate semantic change breaks these, regenerate the constants
with the snippet in each assertion message and review the diff of actual
outputs first.
"""

import hashlib

from intelligent_ocr_spark.operators.extract import extract_record
from intelligent_ocr_spark.sources.pages import gen_row

# regenerated in round 4 (reviewed diff: doc 38 only — the class-5
# byte-garbage branch was dead code through round 3, `i % 2` with class 5
# pinned to even i; it now alternates on i//20 and doc 38 quarantines as
# html_decode: bom_utf16_bad instead of html_null)
CORPUS_DIGEST_40 = "05370f173fba1680b1db82c0d1364115"

PINNED = {
    # doc 0: boilerplate article (en)
    0: ("035aeee857c7ed71c71d1a921d40996d", "035aeee857c7ed71c71d1a921d40996d"),
    # doc 9: vertical-CJK classic with variant chars (norm differs)
    9: ("e820753ff4c2c622f2f856fc049477d7", "3ef3131f1fba8a2ca5d867becf58131b"),
    # doc 19: low-confidence page, one surviving block
    19: ("17830e82331767e172c7149e02ffb45c", "17830e82331767e172c7149e02ffb45c"),
}


def _extract(i: int) -> dict:
    r = gen_row(i)
    return extract_record(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])


def test_corpus_digest_frozen():
    h = hashlib.md5()
    for i in range(40):
        e = _extract(i)
        h.update(
            repr(
                (
                    e["url"], e["extracted_text"], e["norm_text"], e["skipped"],
                    e["is_blank"], e["error"],
                    [(s["start"], s["end"], s["block_id"], s["kind"], s["conf"]) for s in e["spans"]],
                )
            ).encode()
        )
    assert h.hexdigest() == CORPUS_DIGEST_40, (
        "extraction semantics drifted; regenerate constants only after "
        "reviewing actual output diffs"
    )


def test_pinned_documents_frozen():
    for i, (text_md5, norm_md5) in PINNED.items():
        e = _extract(i)
        assert hashlib.md5(e["extracted_text"].encode()).hexdigest() == text_md5, i
        assert hashlib.md5((e["norm_text"] or "").encode()).hexdigest() == norm_md5, i


def test_doc9_variant_layer_diverges():
    e = _extract(9)
    assert e["norm_text"] != e["extracted_text"]  # dual-layer contract


def test_span_placement_metadata():
    """X4/X5 wiring: geo-path spans carry clamped font_size + per-block
    vertical flag (reference core/pdf_processor.py:646-659); DOM-path spans
    carry NULLs (synthetic bboxes)."""
    geo = _extract(9)  # vertical-CJK classic → geo blocks
    assert geo["spans"], "doc 9 must extract blocks"
    for s in geo["spans"]:
        assert 4.0 <= s["font_size"] <= 72.0
        assert isinstance(s["is_vertical"], bool)
    assert any(s["is_vertical"] for s in geo["spans"])  # vertical page

    dom = _extract(0)  # boilerplate article → DOM-density path
    assert dom["spans"]
    assert all(s["font_size"] is None and s["is_vertical"] is None for s in dom["spans"])
