"""Export formatting operators: TXT / Markdown renderings of extraction
output (reference K3/K4: ``export_txt`` ``core/pdf_processor.py:204-232``,
``export_md_text_only`` ``:235-271``).

The reference joins per-page texts with ``--- 第 N 页 ---`` separators and
writes files; here each document is one row, so "pages" are the reading-
order blocks (spans) of a url — the export is a pure formatting ``select``
over the extraction table, and the text sink is the caller's choice
(``df.write.text`` / table append). No UDFs, no shuffles beyond the
explode+re-group when block-level granularity is requested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["export_txt", "export_markdown", "format_elapsed"]


def _block_texts(extracted_text: Column, spans: Column) -> Column:
    """Slice the block texts back out of extracted_text via span offsets
    (substr is 1-based)."""
    return F.transform(
        spans,
        lambda s: F.substring(
            extracted_text, s["start"] + 1, s["end"] - s["start"]
        ),
    )


def export_txt(extracted: DataFrame) -> DataFrame:
    """(url, txt): blocks joined with ``--- 第 N 页 ---`` separators —
    the reference's TXT layout with block index standing in for page
    number (one web page ≡ one reference document)."""
    blocks = _block_texts(F.col("extracted_text"), F.col("spans"))
    numbered = F.zip_with(
        blocks,
        F.sequence(F.lit(1), F.greatest(F.size(blocks), F.lit(1))),
        lambda b, i: F.concat(
            F.lit("--- 第 "), i.cast("string"), F.lit(" 页 ---\n"), b
        ),
    )
    return extracted.select(
        "url",
        F.when(F.size(blocks) > 0, F.concat_ws("\n\n", numbered))
        .otherwise(F.lit(""))
        .alias("txt"),
    )


def export_markdown(extracted: DataFrame) -> DataFrame:
    """(url, md): ``# url`` header, ``## 第 N 页`` sections, ``---`` rules —
    the reference's text-only Markdown layout (K4), headings rendered from
    span kind."""
    spans = F.col("spans")
    blocks = _block_texts(F.col("extracted_text"), spans)
    sections = F.zip_with(
        blocks,
        spans,
        lambda b, s: F.concat(
            F.lit("## 第 "),
            (s["block_id"] + 1).cast("string"),
            F.lit(" 页\n\n"),
            F.when(s["kind"] == "heading", F.concat(F.lit("### "), b)).otherwise(b),
        ),
    )
    header = F.concat(F.lit("# "), F.col("url"), F.lit("\n\n"))
    return extracted.select(
        "url",
        F.concat(header, F.concat_ws("\n\n---\n\n", sections)).alias("md"),
    )


def format_elapsed(seconds: Column) -> Column:
    """Seconds → ``X分Y秒`` (reference X10 time formatting,
    ``core/pdf_processor.py:63-79``); cosmetic, used in lineage reports."""
    mins = F.floor(seconds / 60).cast("long")
    secs = F.floor(seconds % 60).cast("long")
    return F.concat(mins.cast("string"), F.lit("分"), secs.cast("string"), F.lit("秒"))
