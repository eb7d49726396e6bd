"""Inverted-index construction: term → capped posting list + exact df.

The retrieval-side complement of the corpus pipeline (contamination
lookup, quality-term audits, building a search index over the extracted
corpus): for every token, the document frequency and the first
``max_postings`` doc ids. At web scale the hard part is the Zipf head —
"the" appears in ~half of all English documents, so a plain
``row_number() over (partition by term order by doc_id)`` puts ~half
the corpus in one task. Shapes used instead:

* exact df: ``groupBy(term).count()`` — partial aggregation collapses
  the head map-side; the shuffle carries ~|vocab| rows;
* capped postings: :func:`~intelligent_ocr_spark.functions.freq.
  topk_per_key` — the salted two-level tournament whose second window
  sees ≤ ``k·salt_buckets`` rows per term no matter how hot the term;
* the final assembly groups the ≤ k survivors per term and joins the
  df table on ``term`` — both sides are term-partitioned aggregates,
  no corpus-sized side anywhere. ``collect_list`` is bounded by ``k``.

Postings are emitted as a ``|``-joined string (numeric doc-id order)
so the driver's column value-hash sees a scalar; ``truncated`` flags
terms whose df exceeded the cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.freq import topk_per_key
from ..functions.textstats import tokens

__all__ = ["inverted_index"]


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 16,
) -> DataFrame:
    """(doc_id, text) → (term, df, n_postings, postings, truncated).

    ``df`` counts DISTINCT documents containing the term (multiple
    occurrences inside one document collapse); postings are the
    ``max_postings`` smallest doc ids, ``|``-joined in numeric order.
    """
    t = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .distinct()
    )
    df_tbl = t.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    capped = topk_per_key(t, "term", "doc_id", max_postings)
    postings = capped.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_postings"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
            "|",
        ).alias("postings"),
    )
    return (
        postings.join(df_tbl, "term")
        .select(
            "term",
            "df",
            "n_postings",
            "postings",
            (F.col("df") > max_postings).alias("truncated"),
        )
    )
