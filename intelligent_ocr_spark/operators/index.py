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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.freq import topk_per_key
from ..functions.textstats import tokens

__all__ = [
    "inverted_index",
    "bm25_topk",
    "positional_postings",
    "phrase_match",
    "phrase_bm25_topk",
    "proximity_match",
    "collocations",
]


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


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1_num: int = 6, k1_den: int = 5,   # k1 = 1.2
    b_num: int = 3, b_den: int = 4,     # b  = 0.75
) -> DataFrame:
    """BM25 top-``k`` documents for a bag of query ``terms``
    (Robertson/Spärck Jones, public). Score arithmetic is exact where
    cross-engine floats bite:

    * ``avgdl`` NEVER exists as a float — the classic hazard is that a
      double ``avg(dl)`` is merge-order-dependent. The per-term
      denominator ``tf + k1(1-b) + k1·b·dl/avgdl`` is multiplied
      through by ``k1_den·b_den·S`` (S = exact int64 Σdl), giving the
      all-integer form
      ``D = k1_den·b_den·S·tf + k1_num·(b_den-b_num)·S + k1_num·b_num·dl·N``;
    * the numerator is ``idf_µ · tf · (k1_num+k1_den) · b_den · S``
      with idf in floor(1e6·ln(1 + (N-df+0.5)/(df+0.5))) micro-units —
      the LUCENE non-negative idf form (the classic Robertson form
      goes negative for df > N/2, and a negative numerator would also
      split the engines: Spark ``div`` truncates toward zero while
      DuckDB ``//`` floors). The ln-on-double + floor(1e6·) rounding
      is the established ``tfidf_top_terms`` idiom;
    * per-(doc, term) contribution = ``num div D`` (int64), summed per
      doc, ranked by (score desc, doc_id). int64 headroom covers the
      sandbox SFs; at 100-TB token counts rescale idf to kilo-units or
      lift the two products to decimal(38) (documented seam).

    Shape: token explode → two map-side-combined groupBys (dl, tf);
    corpus N/S are one broadcast scalar row; query-term df is a
    broadcast |terms|-row table; the final top-k is an orderBy+limit —
    ``TakeOrderedAndProject``, never a global sort materialization.
    """
    scores = _bm25_scores(
        docs, terms, id_col, text_col, k1_num, k1_den, b_num, b_den
    )
    return (
        scores.orderBy(F.col("score_mu").desc(), "doc_id")
        .limit(k)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("score_mu").desc(), "doc_id"))
            .cast("long"),
        )
    )


def _bm25_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str,
    text_col: str,
    k1_num: int, k1_den: int,
    b_num: int, b_den: int,
) -> DataFrame:
    """Shared BM25 core: (doc_id, score_mu) for every document with at
    least one query-term hit — the exact-integer arithmetic documented
    on ``bm25_topk``. Rank/limit (``bm25_topk``) or a phrase semi-join
    (``phrase_bm25_topk``) is the caller's choice."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        toks.filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf_mu",
            F.floor(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * F.lit(1e6)
            ).cast("long"),
        )
        .withColumn(
            "contrib",
            F.expr(
                f"(idf_mu * tf * {(k1_num + k1_den) * b_den} * sum_dl) div "
                f"({k1_den * b_den} * sum_dl * tf"
                f" + {k1_num * (b_den - b_num)} * sum_dl"
                f" + {k1_num * b_num} * dl * n_docs)"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(F.sum("contrib").alias("score_mu"))


def phrase_bm25_topk(
    docs: DataFrame,
    phrase: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1_num: int = 6, k1_den: int = 5,
    b_num: int = 3, b_den: int = 4,
) -> DataFrame:
    """HYBRID retrieval: documents containing the EXACT consecutive
    ``phrase``, ranked by the BM25 score of the phrase's (distinct)
    terms → (doc_id, n_occurrences, score_mu, rank), top ``k``. The
    two-stage shape real search stacks run — a positional-index phrase
    GATE (binary: the phrase is there or it isn't) feeding a
    bag-of-words RANKER (how prominent are the phrase's words in this
    document) — and the composition of this module's two primitives:
    neither alone answers "best pages for the quoted query".

    Determinism: BM25 arithmetic is the exact-integer form documented
    on ``bm25_topk`` (df/N/Σdl over the WHOLE corpus, not the matching
    subset — idf is a corpus property); ties rank by doc_id.

    Scale shape: the phrase gate is ``phrase_match`` (per-term slices
    equi-joined on (doc_id, pos) — position in the key spreads
    stopword posting lists); the ranker is ``_bm25_scores`` (two
    map-side-combined groupBys + broadcast scalars); the final join is
    doc-keyed between the (small) match set and the score table, and
    the top-k is orderBy+limit → ``TakeOrderedAndProject``. Tokens are
    exploded twice (gate needs positions, ranker needs counts) — the
    price of reusing the two audited plans unchanged; both sides are
    projections off the same scan, never a shuffle of raw text."""
    matches = phrase_match(
        positional_postings(docs, id_col=id_col, text_col=text_col), phrase
    )
    scores = _bm25_scores(
        docs, sorted(set(phrase)), id_col, text_col,
        k1_num, k1_den, b_num, b_den,
    )
    return (
        matches.join(scores, "doc_id")
        .select("doc_id", "n_occurrences", "score_mu")
        .orderBy(F.col("score_mu").desc(), "doc_id")
        .limit(k)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("score_mu").desc(), "doc_id"))
            .cast("long"),
        )
    )


def positional_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, text) → (term, doc_id, pos): 0-based token positions —
    the positional-index projection phrase and proximity queries
    consume. Zero exchanges (projection + ``posexplode`` Generate);
    the caller decides whether to aggregate, join, or write it out
    partitioned by term.

    DuckDB twin: positions come from a parallel
    ``unnest(range(1, len(list)+1)) - 1`` over the same filtered token
    list (DuckDB 1.0 has no WITH ORDINALITY)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "term"),
    ).select("term", "doc_id", F.col("pos").cast("long").alias("pos"))


def phrase_match(
    postings: DataFrame,
    phrase: list[str],
) -> DataFrame:
    """Documents containing the EXACT consecutive token sequence
    ``phrase``, from a ``positional_postings`` table →
    (doc_id, n_occurrences, first_pos). The phrase-query primitive a
    positional index exists for (and the exact-match complement of
    ``bm25_topk``'s bag-of-words ranking); overlapping occurrences
    count separately ("batch batch" occurs twice in "batch batch
    batch").

    Scale shape: term ``i`` of the phrase filters the postings to that
    term's rows and shifts ``pos`` back by ``i``; an occurrence at
    anchor position p is then ``len(phrase)-1`` equi-joins on
    (doc_id, pos) between SELECTIVE per-term slices — the join key
    includes the position, so even a stopword's Zipf-head posting list
    spreads across the hash space instead of landing on one key. The
    final count is one map-side-combined groupBy per doc. Repeated
    phrase terms are just repeated slices (self-join safe: each stage
    aliases its columns away)."""
    if not phrase:
        raise ValueError("phrase must have at least one term")
    anchored = None
    for i, term in enumerate(phrase):
        step = postings.filter(F.col("term") == term).select(
            F.col("doc_id").alias("_d"),
            (F.col("pos") - F.lit(i)).alias("_p"),
        )
        if anchored is None:
            anchored = step
        else:
            anchored = anchored.join(step, ["_d", "_p"])
    return (
        anchored.groupBy(F.col("_d").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("_p").alias("first_pos"),
        )
    )


def proximity_match(
    postings: DataFrame,
    term_a: str,
    term_b: str,
    max_dist: int = 8,
) -> DataFrame:
    """Documents where ``term_a`` and ``term_b`` co-occur within
    ``max_dist`` token positions, from a ``positional_postings`` table
    → (doc_id, n_pairs, min_dist) — the proximity operator ranked
    retrieval and collocation mining need between exact-phrase and
    bag-of-words.

    Scale shape — a BANDED range join, not a per-doc cross join: the
    naive form joins the two posting sets on doc_id alone and filters
    ``|pa-pb| ≤ d`` afterwards, which cross-multiplies the two in-doc
    posting lists (quadratic in occurrences for stopword pairs).
    Instead positions band into width-``d`` buckets; side B is
    replicated to its own and both adjacent buckets, and the equi-join
    key is (doc_id, bucket), so each candidate set is bounded by
    bucket density (≤ d positions per side), never whole-document
    occurrence counts. A matching pair lands in EXACTLY one replica's
    bucket (the three replica buckets are distinct, only one can equal
    A's bucket), so no dedup pass is needed — pytest pins that against
    a brute-force replay. The distance filter keeps only true pairs.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    if term_a == term_b:
        raise ValueError(
            "proximity of a term with itself is phrase_match territory"
        )
    w = max_dist
    a = postings.filter(F.col("term") == term_a).select(
        F.col("doc_id").alias("_d"),
        F.col("pos").alias("_pa"),
        F.expr(f"pos div {w}").alias("_b"),
    )
    b = postings.filter(F.col("term") == term_b).select(
        F.col("doc_id").alias("_d"),
        F.col("pos").alias("_pb"),
        F.explode(
            F.array(
                F.expr(f"pos div {w} - 1"),
                F.expr(f"pos div {w}"),
                F.expr(f"pos div {w} + 1"),
            )
        ).alias("_b"),
    )
    return (
        a.join(b, ["_d", "_b"])
        .filter(F.abs(F.col("_pa") - F.col("_pb")) <= max_dist)
        .groupBy(F.col("_d").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min(F.abs(F.col("_pa") - F.col("_pb"))).alias("min_dist"),
        )
    )


def collocations(
    docs: DataFrame,
    max_dist: int = 2,
    min_pair: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Collocation mining by pointwise mutual information: unordered
    term pairs co-occurring within ``max_dist`` token positions →
    (term_a, term_b, n_pair, pmi_micro). The phrase-discovery /
    multi-word-expression signal corpus linguists and tokenizer
    builders compute ("new york", "machine learning" score high; "of
    the" scores low despite huge counts).

    PMI definition (documented): P(a,b) = n_pair/N_pairs over the
    window-pair observations, P(t) = c(t)/N_tokens over unigrams;
    ``pmi_micro = floor(1e6·ln(n_pair·N_tok²/(N_pairs·c_a·c_b)))`` —
    the ln-on-double + floor micro-unit idiom established by
    ``tfidf_top_terms``/``bm25_topk`` (both engines evaluate the
    IDENTICAL expression tree over exact integers, so the floor is
    bit-stable). Pairs below ``min_pair`` are noise and dropped.

    Scale shape — LINEAR, never quadratic: side B is the postings
    shifted by δ = 1..max_dist (one explode, fan-out = max_dist per
    token), and pairs come from ONE (doc_id, pos) equi-join — the
    ``phrase_match`` key shape, so even stopword positions spread over
    the hash space. Pair counting and the two marginals are map-side-
    combined groupBys (Zipf pairs are agg keys); the scalar totals
    broadcast. No per-doc posting-list cross product anywhere."""
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    t = positional_postings(docs, id_col=id_col, text_col=text_col)
    a = t.select(
        F.col("doc_id").alias("_d"), F.col("pos").alias("_p"),
        F.col("term").alias("_ta"),
    )
    b = t.select(
        F.col("doc_id").alias("_d"),
        F.explode(
            F.expr(f"transform(sequence(1, {max_dist}), d -> pos - d)")
        ).alias("_p"),
        F.col("term").alias("_tb"),
    )
    pairs = (
        a.join(b, ["_d", "_p"])
        .select(
            F.least("_ta", "_tb").alias("term_a"),
            F.greatest("_ta", "_tb").alias("term_b"),
        )
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair)
    )
    totals = pairs.agg(F.sum("n_pair").alias("n_pairs"))
    # NOTE: N_pairs sums the KEPT pairs (post-min_pair), matching the
    # oracle — a constant offset on every pmi, irrelevant to ranking
    marg = t.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    n_tok = t.agg(F.count(F.lit(1)).alias("n_tok"))
    return (
        pairs.join(
            F.broadcast(marg.withColumnRenamed("term", "term_a")
                        .withColumnRenamed("c", "c_a")),
            "term_a",
        )
        .join(
            F.broadcast(marg.withColumnRenamed("term", "term_b")
                        .withColumnRenamed("c", "c_b")),
            "term_b",
        )
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(n_tok))
        .select(
            "term_a",
            "term_b",
            "n_pair",
            F.expr(
                "cast(floor(1e6 * ln(cast(n_pair as double) * n_tok * n_tok"
                " / (cast(n_pairs as double) * c_a * c_b))) as bigint)"
            ).alias("pmi_micro"),
        )
    )
