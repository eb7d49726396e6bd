# -*- coding: utf-8 -*-
"""Deterministic synthetic Common-Crawl-style page table (FIXTURES.md §1).

Schema is exactly the ``input_hint`` shape:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Seven document classes (FIXTURES.md) exercising every extraction path:

0. boilerplate-heavy article (DOM text-density strip path)
1. vertical-CJK classic with variant chars (column segmentation, R→L order,
   dual-insert normalization)
2. academic two-column page (column segmentation, L→R order, low-conf
   caption noise)
3. blank page (density skip — reference ``core/pdf_processor.py:763-794``)
4. already-extracted page (existing-text fast path — reference ``:527-531``)
5. malformed row (NULL / invalid-UTF-8 html — quarantine path, reference
   ``validate_pdf`` ``:335-360``)
6. low-confidence noise page (confidence filter — reference ``:627-628``)

Scale design: generation is itself a distributed transform
(``spark.range(n).mapInPandas``) — every row is a pure function of
``(seed, row index)`` via a per-row ``random.Random``, so output is
identical at any parallelism and any partitioning, and a 10^12-row table
could be generated the same way. ~10% of urls concentrate on 2 mega hosts
to exercise salting / AQE skew handling.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

EPOCH = datetime(2024, 1, 1)

# class id by i % 20 → fixed proportions
_CLASS_BY_MOD = (
    [0] * 9  # 45% boilerplate article
    + [1] * 4  # 20% vertical CJK classic
    + [2] * 3  # 15% academic two-column
    + [3]  # 5% blank
    + [4]  # 5% already-extracted
    + [5]  # 5% malformed
    + [6]  # 5% low-confidence noise
)

_EN_VOCAB = (
    "the quick study of distributed systems shows that careful partitioning "
    "and shuffle avoidance yield robust scalable pipelines for web scale "
    "document extraction with deterministic ordering and stable spans "
    "columnar formats amortize io while vectorized batches keep python "
    "overhead negligible across executors"
).split()

# Classical-Chinese-flavored fragments; several contain variant characters
# from intelligent_ocr_spark.functions.variants_data (竒→奇, 蔵→藏, 爲→為,
# 囘→回, 畧→略, 烟→煙) so the dual-insert path is exercised.
_ZH_FRAGMENTS = [
    "子曰學而時習之不亦說乎",
    "有朋自遠方來不亦樂乎",
    "竒書蔵於名山傳之其人",
    "大學之道在明明德在親民",
    "爲政以德譬如北辰居其所",
    "溫故而知新可以爲師矣",
    "囘也聞一以知十",
    "畧觀古今之變究天人之際",
    "烟波江上使人愁",
    "知之者不如好之者",
]

_NAV_WORDS = ["Home", "About", "Archive", "Contact", "Login", "Search", "Tags"]


def doc_class(i: int) -> int:
    return _CLASS_BY_MOD[i % 20]


def host_for(i: int) -> str:
    """Skewed host distribution: ~10% of rows on 2 mega hosts."""
    if (i * 7) % 10 == 0:
        return f"mega{i % 2}.example.com"
    return f"h{(i * 2654435761 % 997):03d}.example.org"


def url_for(i: int) -> str:
    return f"https://{host_for(i)}/page-{i:08d}"


def _en_sentence(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_EN_VOCAB) for _ in range(n_words)) + "."


def _zh_sentence(rng: random.Random, n_frag: int) -> str:
    return "。".join(rng.choice(_ZH_FRAGMENTS) for _ in range(n_frag)) + "。"


def _boilerplate_article(i: int, rng: random.Random, lang: str) -> str:
    nav = " ".join(f'<a href="/{w.lower()}">{w}</a>' for w in _NAV_WORDS)
    sidebar = "".join(
        f'<li><a href="/t/{k}">tag {k}</a></li>' for k in range(rng.randint(4, 8))
    )
    if lang == "zh":
        title = f"文章第{i}篇"
        paras = [_zh_sentence(rng, rng.randint(2, 4)) for _ in range(rng.randint(2, 5))]
    else:
        title = f"Article number {i}"
        paras = [
            _en_sentence(rng, rng.randint(8, 18)) for _ in range(rng.randint(2, 5))
        ]
    body_paras = "".join(f"<p>{p}</p>" for p in paras)
    return (
        f'<html lang="{lang}"><head><title>{title}</title></head><body>'
        f"<nav>{nav}</nav>"
        f"<header>Example Site — breaking boilerplate ticker</header>"
        f'<div class="sidebar"><ul>{sidebar}</ul></div>'
        f"<article><h1>{title}</h1>{body_paras}</article>"
        f'<footer>© 2024 Example Site <a href="/privacy">Privacy</a> '
        f'<a href="/terms">Terms</a></footer>'
        f"</body></html>"
    )


def _bbox_block(text: str, x0: int, y0: int, x1: int, y1: int, conf: float, kind: str) -> str:
    return (
        f'<div class="block" data-bbox="{x0},{y0},{x1},{y1}" '
        f'data-conf="{conf:.2f}" data-kind="{kind}">{text}</div>'
    )


def _vertical_classic(i: int, rng: random.Random) -> str:
    """Vertical CJK: columns right→left, each a tall narrow bbox block.

    Blocks are emitted in a deterministic SHUFFLED order so the extractor
    must resolve reading order geometrically, not by document order.
    """
    n_cols = rng.randint(3, 6)
    blocks = []
    for c in range(n_cols):
        # column 0 is the rightmost in reading order
        x0 = 900 - c * 120
        frag = _zh_sentence(rng, rng.randint(1, 2)).rstrip("。")
        conf = 0.85 + 0.01 * ((i + c) % 10)
        blocks.append(_bbox_block(frag, x0, 40, x0 + 48, 40 + 36 * max(len(frag), 4), conf, "column"))
    rng.shuffle(blocks)
    return (
        '<html lang="zh" data-layout="vertical" data-zoom="2.0"><body>'
        + "".join(blocks)
        + "</body></html>"
    )


def _academic_page(i: int, rng: random.Random) -> str:
    """Two-column horizontal layout + low-conf figure-caption noise."""
    blocks = [
        _bbox_block(f"A Study of Topic {i}", 100, 30, 700, 70, 0.99, "heading")
    ]
    for col, x0 in enumerate((60, 460)):
        for line in range(rng.randint(3, 5)):
            txt = _en_sentence(rng, rng.randint(5, 9)).rstrip(".")
            conf = 0.80 + 0.02 * ((i + col + line) % 8)
            y0 = 100 + line * 40
            blocks.append(_bbox_block(txt, x0, y0, x0 + 330, y0 + 28, conf, "line"))
    # figure caption noise below the confidence threshold → must be dropped
    blocks.append(_bbox_block("fig 3 blurry caption noise", 60, 600, 390, 620, 0.31, "line"))
    rng.shuffle(blocks)
    return (
        '<html lang="en" data-layout="horizontal" data-zoom="2.0"><body>'
        + "".join(blocks)
        + "</body></html>"
    )


def _blank_page(i: int) -> str:
    return '<html lang="en"><body>   \n\t  &nbsp;  </body></html>'


def _low_conf_page(i: int, rng: random.Random) -> str:
    blocks = []
    for k in range(5):
        conf = 0.10 + 0.07 * k  # 0.10..0.38 — all below 0.5
        blocks.append(
            _bbox_block(f"noise fragment {i}-{k}", 50, 50 + 40 * k, 350, 78 + 40 * k, conf, "line")
        )
    keep = _zh_sentence(rng, 1).rstrip("。")
    blocks.append(_bbox_block(keep, 50, 260, 50 + 30 * len(keep), 296, 0.93, "line"))
    rng.shuffle(blocks)
    return (
        '<html lang="zh" data-layout="horizontal" data-zoom="2.0"><body>'
        + "".join(blocks)
        + "</body></html>"
    )


def gen_row(i: int, seed: int = 42) -> dict:
    """Pure function (seed, i) → one page row."""
    rng = random.Random(f"{seed}:{i}")
    cls = doc_class(i)
    lang = ["en", "zh", "ja"][i % 3] if cls == 0 else ("zh" if cls in (1, 6) else "en")
    if cls == 0 and lang == "ja":
        lang = "en"  # keep content generators to en/zh; lang col still varies via zh
    html: bytes | None
    text = ""
    if cls == 0:
        html = _boilerplate_article(i, rng, lang).encode("utf-8")
    elif cls == 1:
        html = _vertical_classic(i, rng).encode("utf-8")
        lang = "zh"
    elif cls == 2:
        html = _academic_page(i, rng).encode("utf-8")
        lang = "en"
    elif cls == 3:
        html = _blank_page(i).encode("utf-8")
    elif cls == 4:
        # already-extracted: text column populated (>50 chars → fast path,
        # reference core/pdf_processor.py:527-531)
        text = _en_sentence(rng, 20) + " " + _en_sentence(rng, 15)
        html = _boilerplate_article(i, rng, "en").encode("utf-8")
    elif cls == 5:
        # malformed: alternate NULL html and a broken byte stream — a
        # UTF-16-LE BOM followed by an ODD number of bytes, so the charset
        # resolver's BOM path rejects it (bom_utf16_bad) instead of the
        # legacy-charset sniff rescuing it (charset layer: functions/charset.py).
        # NB alternate on i//20, not i: class 5 sits at i%20==18, so i is
        # always even and `i % 2` never varied — the byte-garbage branch was
        # dead code through round 3
        html = None if (i // 20) % 2 == 0 else b"\xff\xfegarbage<html" + bytes([i % 256])
    else:
        html = _low_conf_page(i, rng).encode("utf-8")
        lang = "zh"
    return {
        "url": url_for(i),
        "warc_ts": EPOCH + timedelta(seconds=i),
        "html": html,
        "text": text,
        "lang": lang,
    }


def gen_image_row(i: int, seed: int = 42) -> dict:
    """Pure function (seed, i) → one BINARY page-image row (PXPG container
    in the ``html`` column — the pixel-path twin of :func:`gen_row`).

    Classes by ``i % 10``: 0-4 vertical CJK classic (variant chars, zoom
    1-3 → rescale), 5-6 horizontal ascii page, 7 blank image (X6 gradient
    gate), 8 corrupt container (quarantine), 9 low-confidence noise column
    (unknown glyphs → F4 drop) next to one good column.
    """
    from intelligent_ocr_spark.functions.pixmap import render_page_image

    rng = random.Random(f"img:{seed}:{i}")
    cls = i % 10
    zoom = 1 + i % 3
    lang = "zh"
    if cls <= 4:
        tracks = [rng.choice(_ZH_FRAGMENTS) for _ in range(rng.randint(2, 4))]
        html = render_page_image(tracks, vertical=True, zoom=zoom)
    elif cls <= 6:
        lang = "en"
        words = "the quick brown fox jumps over lazy dogs".split()
        tracks = ["-".join(rng.choice(words) for _ in range(3)) for _ in range(rng.randint(2, 3))]
        html = render_page_image(tracks, vertical=False, zoom=zoom)
    elif cls == 7:
        import numpy as np

        from intelligent_ocr_spark.functions.pixmap import encode_page_image

        html = encode_page_image(np.full((64, 64), 255, dtype=np.uint8), True, 1)
    elif cls == 8:
        # truncate INTO the pixel body (≥5 bytes of 0xFF white margin):
        # container validation fails AND the utf-8 fallback fails →
        # deterministic non-retryable quarantine
        html = render_page_image([rng.choice(_ZH_FRAGMENTS)], vertical=True, zoom=1)[: 15 + i % 7]
    else:
        noise = "".join(chr(1 + (i + k) % 8) for k in range(6))  # not in alphabet
        html = render_page_image([noise, rng.choice(_ZH_FRAGMENTS)], vertical=True, zoom=1)
    return {
        "url": f"img://{host_for(i)}/page-{i:08d}",
        "warc_ts": EPOCH + timedelta(seconds=i),
        "html": html,
        "text": "",
        "lang": lang,
    }


def image_pages_df(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Distributed page-image generation (same determinism contract as
    :func:`pages_df`)."""

    def gen(batches):
        for pdf in batches:
            rows = [gen_image_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in PAGES_SCHEMA.fields])

    rng_df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, PAGES_SCHEMA)


def gen_pandas(indices: list[int] | range, seed: int = 42) -> pd.DataFrame:
    rows = [gen_row(i, seed) for i in indices]
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def pages_df(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Distributed generation: ``spark.range(n)`` → mapInPandas.

    Row content depends only on (seed, id), so any partitioning yields the
    same table — this is what makes the two-parallelism benchmark read
    byte-identical input.
    """

    def gen(batches):
        for pdf in batches:
            yield gen_pandas(pdf["id"].tolist(), seed)

    rng_df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, PAGES_SCHEMA)


def write_pages(spark: SparkSession, n: int, path: str, seed: int = 42, partitions: int | None = None) -> None:
    pages_df(spark, n, seed, partitions).write.mode("overwrite").parquet(path)
