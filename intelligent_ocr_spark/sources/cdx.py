"""Common Crawl CDX(J) capture-index source.

The fourth and last container in CC's release family (WARC bodies,
WET text, WAT metadata, **CDX index**): one text line per capture —
``<SURT-key> <14-digit-timestamp> <JSON block>`` — that every consumer
uses to locate captures without scanning containers, and that carries
the ``digest`` field making **cross-crawl exact dedup free**: captures
sharing a payload digest are byte-identical bodies the crawler already
hashed (the batch-index twin of ``warc.read_warc_revisits``' revisit
signal; reference scope note: the reference reads pre-decoded files —
``core/pdf_processor.py`` — so the index layer is this engine's
crawl-facing extension).

Everything past the text scan is COLUMN ALGEBRA — one regex splitting
the three fields, ``get_json_object`` for the JSON block, fixed-width
digit timestamps kept as strings (lexicographic = chronological) — so
parsing runs in whole-stage codegen with zero Python anywhere, and the
DuckDB oracle replays the identical expressions
(``__spark_entry__.py::source_cdx_dups``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["parse_cdxj_lines", "read_cdxj", "cdx_exact_dups"]

_LINE_RE = r"^(\S+) (\d{14}) (.*)$"


def parse_cdxj_lines(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """One CDXJ line → (surt, ts14, url, status, digest, filename,
    offset, length). Malformed lines (no 3-field match / no JSON url)
    yield NULL fields rather than dropping — the caller's filter is the
    policy step. ``ts14`` stays the raw fixed-width string; offsets and
    lengths cast to long (CDXJ serializes them as JSON strings)."""
    ln = F.col(line_col)
    j = F.regexp_extract(ln, _LINE_RE, 3)
    g = lambda p: F.get_json_object(j, "$." + p)  # noqa: E731
    return lines.select(
        F.nullif(F.regexp_extract(ln, _LINE_RE, 1), F.lit("")).alias("surt"),
        F.nullif(F.regexp_extract(ln, _LINE_RE, 2), F.lit("")).alias("ts14"),
        g("url").alias("url"),
        g("status").alias("status"),
        g("digest").alias("digest"),
        g("filename").alias("filename"),
        g("offset").cast("long").alias("offset"),
        g("length").cast("long").alias("length"),
    )


def read_cdxj(spark: SparkSession, path_glob: str) -> DataFrame:
    """CDXJ files (plain or .gz — Spark's text source inflates gzip
    transparently) → parsed capture rows. The text scan splits by file;
    CC shards its index into ~300 files per crawl, so parallelism is
    the shard count without any custom split logic."""
    return parse_cdxj_lines(
        spark.read.text(path_glob).select(F.col("value").alias("line"))
    )


def cdx_exact_dups(captures: DataFrame, min_captures: int = 2) -> DataFrame:
    """Digest groups with ≥ ``min_captures`` captures: the index-only
    cross-crawl exact-dup ledger — (digest, n_captures, n_urls,
    first_ts, last_ts, sample_url) with zero body bytes read. One
    map-side-combined exchange on digest; fixed-width string min/max
    are the chronological bounds."""
    return (
        captures.filter(F.col("digest").isNotNull())
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_captures"),
            F.countDistinct("url").alias("n_urls"),
            F.min("ts14").alias("first_ts"),
            F.max("ts14").alias("last_ts"),
            F.min("url").alias("sample_url"),
        )
        .filter(F.col("n_captures") >= min_captures)
    )
