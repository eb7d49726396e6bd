"""Mojibake (UTF-8-read-as-cp1252) detection and repair, JVM-side.

The single most common text corruption on the open web: a page authored
in UTF-8 is decoded by some intermediary as windows-1252, so every
multi-byte sequence surfaces as 2-3 Latin-1/punctuation characters
("donâ€™t", "cafÃ©").  The reference pipeline never sees this class
(its inputs are pre-decoded files, ``core/pdf_processor.py`` reads
text layers); a crawl-facing engine meets it constantly, and the public
fix (the ftfy approach) is pure byte algebra — no model, no library:

* **Detect**: a UTF-8 2-byte sequence has lead byte 0xC2-0xDF and one
  continuation byte 0x80-0xBF; a 3-byte sequence has lead 0xE0-0xEF and
  two continuations.  Decoded as cp1252 those byte ranges become FIXED
  character classes (WHATWG windows-1252: 0x80-0x9F maps to specific
  punctuation/letters with five bytes passing through as C1 controls;
  0xA0-0xBF and 0xC2-0xEF are Latin-1 identity).  Real Latin text
  essentially never puts those characters adjacent in that order, so
  counting the two signature patterns is a high-precision detector.
* **Repair**: map each cp1252 character image back to its source byte
  (``translate`` for the 0x80-0x9F specials, Latin-1 identity for the
  rest), reinterpret the byte string as UTF-8, and accept the result
  ONLY if (a) every input character had a cp1252 byte image and (b) the
  reinterpretation is valid UTF-8 — otherwise the text was not mojibake
  and passes through untouched.  One deterministic pass, zero false
  repairs by construction (clean Latin-1 text fails (b): lone accented
  letters are invalid UTF-8 lead sequences).

Everything is ``pyspark.sql.functions`` column algebra (regexp counts,
``translate``, ``encode``, ``try_validate_utf8``) — whole-stage codegen,
no Python in the hot path.  The signature regexes are spelled with
ASCII-safe ``\\x{...}`` escapes understood identically by Java regex
(Spark) and RE2 (DuckDB), so oracles replay detection verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "MOJIBAKE_SIG2_RE",
    "MOJIBAKE_SIG3_RE",
    "MOJIBAKE_SIG4_RE",
    "mojibake_counts",
    "repair_mojibake",
]

# cp1252 bytes 0x80-0x9F that decode to real characters, and those
# characters (generated from the codec itself so the table cannot drift).
_SPECIAL_BYTES = []
_SPECIAL_CHARS = []
for _b in range(0x80, 0xA0):
    try:
        _SPECIAL_CHARS.append(bytes([_b]).decode("cp1252"))
        _SPECIAL_BYTES.append(chr(_b))
    except UnicodeDecodeError:  # 0x81 0x8D 0x8F 0x90 0x9D: C1 pass-through
        continue
_SPECIALS = "".join(_SPECIAL_CHARS)
_RAW = "".join(_SPECIAL_BYTES)

# Character images of continuation bytes 0x80-0xBF under WHATWG cp1252:
# the five undefined bytes surface as their C1 codepoints, 0xA0-0xBF are
# Latin-1 identity, the rest are the specials above.  ASCII-safe escapes
# keep the pattern byte-identical in Spark and the DuckDB oracle.
_CONT_CLASS = (
    "[\\x{81}\\x{8D}\\x{8F}\\x{90}\\x{9D}\\x{A0}-\\x{BF}"
    + "".join("\\x{%04X}" % ord(c) for c in _SPECIALS)
    + "]"
)
MOJIBAKE_SIG2_RE = "[\\x{C2}-\\x{DF}]" + _CONT_CLASS
MOJIBAKE_SIG3_RE = "[\\x{E0}-\\x{EF}]" + _CONT_CLASS + "{2}"
MOJIBAKE_SIG4_RE = "[\\x{F0}-\\x{F4}]" + _CONT_CLASS + "{3}"
# every char the repair byte-map can invert: Latin-1 range + the specials
_IMAGE_GATE_RE = (
    "^[\\x{00}-\\x{FF}"
    + "".join("\\x{%04X}" % ord(c) for c in _SPECIALS)
    + "]*$"
)


def mojibake_counts(col: Column) -> tuple[Column, Column, Column, Column]:
    """(n_sig2, n_sig3, n_sig4, n_fffd) — counts of 2-/3-/4-byte
    mojibake signatures and of U+FFFD replacement characters (upstream
    decode damage).  Non-overlapping leftmost matches in both engines."""
    return (
        F.regexp_count(col, F.lit(MOJIBAKE_SIG2_RE)),
        F.regexp_count(col, F.lit(MOJIBAKE_SIG3_RE)),
        F.regexp_count(col, F.lit(MOJIBAKE_SIG4_RE)),
        F.regexp_count(col, F.lit("\\x{FFFD}")),
    )


def repair_mojibake(col: Column, min_signatures: int = 2) -> Column:
    """Invert one level of UTF-8-read-as-cp1252 corruption; pass clean
    text through untouched.

    Gate: at least ``min_signatures`` signature hits (one hit can be a
    coincidence in Latin text) AND every character must have a cp1252
    byte image.  Accept: the inverse byte map must reinterpret as valid
    UTF-8 (``try_validate_utf8`` → NULL otherwise, coalesced back to
    the original).  The encode sits under the CASE branch, so rows with
    unmappable characters (real CJK, curly quotes in clean text) never
    reach it."""
    n2, n3, n4, _ = mojibake_counts(col)
    gate = col.rlike(_IMAGE_GATE_RE) & ((n2 + n3 + n4) >= min_signatures)
    cand = F.try_validate_utf8(
        F.encode(F.translate(col, _SPECIALS, _RAW), "ISO-8859-1").cast("string")
    )
    return F.when(gate, F.coalesce(cand, col)).otherwise(col)
