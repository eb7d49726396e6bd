"""Text-analysis column expressions for training-data pipelines.

All pure ``pyspark.sql.functions`` compositions (JVM-side, codegen'd,
whole-stage — no Python in the hot path), each with a DuckDB-expressible
twin in ``__spark_entry__.oracle_sql`` so the driver's correctness harness
covers them:

* language-ID (CJK-fraction n-gram heuristic)
* quality scoring (length / punctuation / stopword ratios)
* token counting (whitespace + BPE-ish subword estimate)
* document fingerprinting (k-smallest-distinct-token digest)
* repetition signals (Gopher/MassiveText distinct/max-word/bigram fracs)
* unigram log-probability (CCNet-style perplexity proxy)
* bigram conditional log-probability (one rung up the n-gram ladder)
* temperature-balanced language sampling weights (α = 0.5)
* character entropy (mojibake/binary-soup gate)
* tf-idf top-k keywords
* deterministic content-addressed sampling (retry-stable train/val draws)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "lang_id",
    "quality_score",
    "token_count",
    "subword_estimate",
    "fingerprint",
    "repetition_signals",
    "unigram_logprob",
    "bigram_logprob",
    "kn_bigram_logprob",
    "lang_sample_weights",
    "deterministic_sample",
    "char_entropy",
    "tfidf_top_terms",
    "source_token_drift",
    "source_overlap",
    "ccnet_buckets",
]

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "that", "for", "with")


def tokens(col: Column) -> Column:
    """Lowercased alphanumeric tokens. The shared tokenizer for dedup +
    stats; DuckDB twin: ``string_split_regex(lower(x), '[^a-z0-9]+')`` with
    empties filtered."""
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != F.lit(""))


def lang_id(col: Column) -> Column:
    """Heuristic script-based language-ID (cheap-scan class — score a
    signal, branch on a threshold, like the reference's blank gate):

    * any kana → ``ja`` (kana are unambiguous; Han alone is not)
    * ≥ 20% Hangul syllables → ``ko``
    * > 30% CJK ideographs → ``zh``
    * ≥ 30% Cyrillic → ``ru``; ≥ 30% Arabic block → ``ar``
    * else ``en`` (Latin-script default); empty → ``und``
    """
    n = F.length(col)

    def frac(rng: str) -> Column:
        return F.length(F.regexp_replace(col, f"[^{rng}]", "")) / n

    return (
        F.when(n == 0, F.lit("und"))
        .when(F.length(F.regexp_replace(col, "[^぀-ヿ]", "")) > 0, F.lit("ja"))
        .when(frac("가-힣") >= 0.20, F.lit("ko"))
        .when(frac("一-鿿") > 0.30, F.lit("zh"))
        .when(frac("Ѐ-ӿ") >= 0.30, F.lit("ru"))
        .when(frac("؀-ۿ") >= 0.30, F.lit("ar"))
        .otherwise(F.lit("en"))
    )


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.filter(F.split(col, "\\s+"), lambda t: t != F.lit("")))


def subword_estimate(col: Column) -> Column:
    """BPE-ish subword count estimate: alnum runs + ceil(chars/4) residue —
    a deterministic regex proxy for tokenizer budget planning (the classic
    ~4-chars-per-token heuristic)."""
    alnum_chars = F.length(F.regexp_replace(col, "[^A-Za-z0-9]", ""))
    runs = token_count(col)
    return (runs + F.ceil(alnum_chars / F.lit(4))).cast("long")


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality score from cheap ratios:

    * length factor: ``least(len,2000)/2000``
    * punctuation ratio penalty
    * stopword hit ratio reward (signals natural language)

    Weights fixed so the DuckDB oracle reproduces the exact double.
    """
    n = F.length(col).cast("double")
    length_factor = F.least(n, F.lit(2000.0)) / F.lit(2000.0)
    punct = F.length(F.regexp_replace(col, "[^.,;:!?]", "")).cast("double")
    punct_ratio = F.when(n > 0, punct / n).otherwise(F.lit(0.0))
    toks = tokens(col)
    n_toks = F.size(toks).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*_STOPWORDS))
    ).cast("double")
    stop_ratio = F.when(n_toks > 0, stop_hits / n_toks).otherwise(F.lit(0.0))
    raw = (
        F.lit(0.5) * length_factor
        + F.lit(0.3) * stop_ratio
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0)))
    )
    # floor-scale instead of round: given bit-identical doubles, floor is
    # bit-identical across engines, while round half-up boundaries are not
    return F.floor(raw * F.lit(1e6)) / F.lit(1e6)


def fingerprint(col: Column, k: int = 5) -> Column:
    """Document fingerprint: md5 of the ``k`` lexicographically-smallest
    distinct tokens — an order-insensitive, SQL-expressible content digest
    (the role of the reference's first+last-1MB file hash,
    ``core/checkpoint.py:104-124``)."""
    smallest = F.slice(F.array_sort(F.array_distinct(tokens(col))), 1, k)
    return F.md5(F.concat_ws("|", smallest).cast("binary"))


def repetition_signals(df, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style repetition quality signals per document.

    Published training-data pipelines (Gopher/MassiveText, CCNet,
    RefinedWeb — see PAPERS.md) filter documents whose content is
    dominated by repeats. Emitted per doc:

    * ``n_tokens`` — total token count
    * ``distinct_frac`` — distinct/total tokens (low = repetitive)
    * ``max_word_frac`` — share of the single most frequent token
    * ``top_bigram_frac`` — share of tokens covered by the most frequent
      2-gram (``2·count/ n``), the classic boilerplate-loop detector

    Shape: one token explode → two-level aggregation with map-side
    combine (the simhash shuffle argument: O(docs × distinct tokens)
    rows into the exchange, never O(corpus tokens)); the bigram branch
    reuses the same pattern and joins back on doc_id. Ties in "most
    frequent" need no breaking — only the count reaches the output.
    """
    from intelligent_ocr_spark.util import ensure_parallelism

    # materialize the token array ONCE: building shingles via
    # transform+element_at over the raw text expression would re-evaluate
    # the split per element access (Catalyst does not CSE inside lambda
    # bodies) — quadratic per doc
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
    )
    toks = base.select("doc_id", F.explode("_toks").alias("tok"))
    word_stats = (
        toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("max_word"),
        )
    )
    tarr = F.col("_toks")
    bigram_arr = F.when(
        F.size(tarr) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tarr) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(tarr, i), F.element_at(tarr, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bigrams = base.select("doc_id", F.explode(bigram_arr).alias("bg"))
    bigram_stats = (
        bigrams.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_bigram"))
    )
    n = F.col("n_tokens").cast("double")
    return (
        word_stats.join(bigram_stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_distinct") / n).alias("distinct_frac"),
            (F.col("max_word") / n).alias("max_word_frac"),
            F.coalesce(
                F.lit(2.0) * F.col("max_bigram") / n, F.lit(0.0)
            ).alias("top_bigram_frac"),
        )
    )


def unigram_logprob(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document mean unigram log-probability — the cheap perplexity
    proxy CCNet-class pipelines use to rank document "well-formedness"
    (a doc of common words scores high; rare-token soup scores low).
    CCNet proper uses a 5-gram KenLM; the unigram form keeps the entire
    computation relational and exactly oracle-reproducible.

    One token explode: each token row gets its corpus frequency via the
    heavy-hitter-safe hybrid (:func:`~intelligent_ocr_spark.functions.
    freq.with_key_aggs`) — top-K head tokens are counted by a map-side-
    combined groupBy and BROADCAST-joined back (the Zipf head never
    enters a window partition), tail tokens keep the one-exchange
    ``count(*) over (partition by tok)`` window; values are exact either
    way. The denominator Σ_tok c_tok is just the corpus token count, a
    broadcast scalar (crossJoin of a 1-row count — never a collect).
    Returns (doc_id, n_tokens, mean_logprob) floor-scaled to 1e-6.
    """
    from intelligent_ocr_spark.functions.freq import with_key_aggs
    from intelligent_ocr_spark.util import ensure_parallelism

    toks = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    scored = with_key_aggs(
        toks, "tok", {"c": (F.count, None)}, salt_col="doc_id"
    ).crossJoin(F.broadcast(total))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.floor(F.avg(F.log(F.col("c") / F.col("total"))) * F.lit(1e6))
                / F.lit(1e6)
            ).alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


def deterministic_sample(
    df, id_col: str = "doc_id", frac: float = 0.2, salt: str = "s0",
):
    """Deterministic content-addressed sampling: keep a row iff the first
    8 md5 hex chars of ``salt|id`` fall under ``frac`` of the 32-bit
    space. Unlike ``df.sample`` this is reproducible across engines,
    partitionings, retries, and reruns (the property a resumable 100-TB
    pipeline needs — a task retry must not change the sample), and the
    salt gives independent draws for train/val splits.
    DuckDB twin: ``('0x'||substr(md5(salt||'|'||id),1,8))::UBIGINT``.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")).cast("binary")),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return df.filter(h < F.lit(int(frac * (1 << 32))))


def char_entropy(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc Shannon entropy (nats) of the character distribution —
    the cheap mojibake/binary-soup detector quality stacks run beside
    the token signals (natural language sits in a narrow entropy band;
    base64 blobs and single-char runs fall far outside it).

    Characters come from ``transform(sequence, substr)`` so both engines
    enumerate identical units (locale/empty-split quirks of
    ``split(text, '')`` never enter); the entropy uses the identity
    −Σ (c/n)·ln(c/n) = ln n − (Σ c·ln c)/n, so ONE two-level aggregation
    (per-(doc, char) counts with map-side combine, then per-doc)
    computes it without materializing probabilities. Empty docs are
    omitted (entropy undefined). Returns (doc_id, n_chars, entropy)
    floor-scaled to 1e-6.
    """
    from intelligent_ocr_spark.util import ensure_parallelism

    t = F.col(text_col)
    chars = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.when(
                F.length(t) >= 1,
                F.transform(
                    F.sequence(F.lit(1), F.length(t)),
                    lambda i: t.substr(i, F.lit(1)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_chars"),
            (
                F.floor(
                    (
                        F.log(F.sum("c"))
                        - F.sum(F.col("c") * F.log("c")) / F.sum("c")
                    )
                    * F.lit(1e6)
                )
                / F.lit(1e6)
            ).alias("entropy"),
        )
        .orderBy("doc_id")
    )


def tfidf_top_terms(df, id_col: str = "doc_id", text_col: str = "text", k: int = 3):
    """Top-``k`` tf-idf terms per document — the classic corpus keyword
    extractor (what a corpus-exploration UI shows per doc; also the
    cheap topic signal stratified sampling can key on).

    Shape: one token explode → (doc, tok) counts (map-side combine);
    document frequency over that already-distinct frame via the
    heavy-hitter-safe hybrid (broadcast top-K head terms + window tail,
    :func:`~intelligent_ocr_spark.functions.freq.with_key_aggs` — "the"
    appears in ~every doc, so the df key is Zipf-skewed exactly like the
    token key); N = total docs with ≥1 token is a broadcast scalar.
    Score = tf · ln(N/df), floor-scaled; ties rank deterministically by
    (score desc, term asc). Returns
    (doc_id, term, tf, doc_freq, score, rank).
    """
    from pyspark.sql import Window

    from intelligent_ocr_spark.functions.freq import with_key_aggs
    from intelligent_ocr_spark.util import ensure_parallelism

    toks = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    with_df = with_key_aggs(tf, "term", {"doc_freq": (F.count, None)}, salt_col="doc_id")
    n_docs = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = with_df.crossJoin(F.broadcast(n_docs)).withColumn(
        "score",
        F.floor(F.col("tf") * F.log(F.col("n_docs") / F.col("doc_freq")) * F.lit(1e6))
        / F.lit(1e6),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "doc_freq", "score", "rank")
        .orderBy("doc_id", "rank")
    )


def source_token_drift(df, source_col: str = "source", text_col: str = "text"):
    """Per-source KL divergence of the token distribution against the
    whole corpus — the drift monitor a production corpus pipeline runs
    per ingest slice (a crawl segment whose language/boilerplate mix
    shifted jumps out as a KL spike before any model ever trains on it).

    KL(p_s ‖ p_corpus) = Σ_tok p_s(t) · ln(p_s(t)/p(t)), over the
    source's own tokens (q(t) > 0 whenever p_s(t) > 0, since the corpus
    contains the source — no smoothing needed). Shape: one token
    explode → (source, tok) counts; per-source and per-token totals via
    windows on the already-aggregated frame (one exchange each); the
    final per-source sum adds integer NANO-units (round(term·1e9)) so
    partial-aggregate merge order cannot move the result — both engines
    produce identical doubles for each term, and integer sums are
    order-exact. Returns (source, n_tokens, n_distinct, kl_divergence).
    """
    from pyspark.sql import Window

    from intelligent_ocr_spark.util import ensure_parallelism

    toks = ensure_parallelism(df).select(
        F.col(source_col).alias("source"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    counts = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c_s"))
    enriched = (
        counts.withColumn("n_s", F.sum("c_s").over(Window.partitionBy("source")))
        .withColumn("c", F.sum("c_s").over(Window.partitionBy("tok")))
    )
    n_total = counts.agg(F.sum("c_s").alias("n"))
    p_s = F.col("c_s") / F.col("n_s")
    p = F.col("c") / F.col("n")
    term_nano = F.round(p_s * F.log(p_s / p) * F.lit(1e9)).cast("long")
    return (
        enriched.crossJoin(F.broadcast(n_total))
        .groupBy("source")
        .agg(
            F.sum("c_s").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            (F.sum(term_nano) / F.lit(1e9)).alias("kl_divergence"),
        )
        .orderBy("source")
    )


def bigram_logprob(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document mean CONDITIONAL bigram log-probability — one rung
    up the n-gram ladder from :func:`unigram_logprob` toward the 5-gram
    KenLM CCNet uses.  For each adjacent token pair the model scores
    ln(c(w₁w₂)/c(w₁·)) where c(w₁·) counts bigram positions opening
    with w₁ — the maximum-likelihood conditional, well-defined without
    smoothing because every scored bigram is, by construction, in the
    corpus the counts come from.  Repetitive boilerplate scores near 0
    (its continuations are deterministic); incoherent token soup scores
    deeply negative.

    Shape: one bigram explode (array transform over the materialized
    token array, same construction as ``repetition_signals``); BOTH
    count lookups use the heavy-hitter-safe hybrid
    (:func:`~intelligent_ocr_spark.functions.freq.with_key_aggs` —
    the context key "the" is exactly the Zipf head that kills a plain
    frequency window at 100×, and so is the top bigram "of the").
    Docs with <2 tokens have no bigram positions and are omitted.
    Returns (doc_id, n_bigrams, mean_logprob) floor-scaled to 1e-6.
    """
    from intelligent_ocr_spark.functions.freq import with_key_aggs
    from intelligent_ocr_spark.util import ensure_parallelism

    base = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
    )
    tarr = F.col("_toks")
    bigram_arr = F.when(
        F.size(tarr) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tarr) - 1),
            lambda i: F.struct(
                F.element_at(tarr, i).alias("w1"),
                F.element_at(tarr, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = base.select("doc_id", F.explode(bigram_arr).alias("bg")).select(
        "doc_id",
        F.col("bg.w1").alias("w1"),
        # tokens are [a-z0-9]+ so the space join is collision-free
        F.concat_ws(" ", "bg.w1", "bg.w2").alias("pair"),
    )
    scored = with_key_aggs(bg, "w1", {"cw": (F.count, None)}, salt_col="doc_id")
    scored = with_key_aggs(scored, "pair", {"cb": (F.count, None)}, salt_col="doc_id")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.floor(F.avg(F.log(F.col("cb") / F.col("cw"))) * F.lit(1e6))
                / F.lit(1e6)
            ).alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


def kn_bigram_logprob(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document mean INTERPOLATED KNESER-NEY bigram log-probability
    (Kneser & Ney 1995; Chen & Goodman 1998's interpolated form —
    public), discount d = 3/4. The smoothing KenLM implements and CCNet
    scores with: the raw conditional ``bigram_logprob`` computes
    over-rewards boilerplate whose continuations are deterministic,
    while KN backs every bigram off toward the CONTINUATION unigram —
    "how many distinct contexts does w₂ follow?" — the distributional
    -novelty signal that separates topical words from glued phrases
    ("francisco" is frequent but follows only "san": tiny continuation
    probability).

        P(w₂|w₁) = (c(w₁w₂) − d)/c(w₁·) + d·N₁₊(w₁·)/c(w₁·) · P_c(w₂)
        P_c(w₂)  = N₁₊(·w₂) / N₁₊(··)

    EXACTNESS: every count is an exact int64 and the probability is
    assembled as ONE integer ratio evaluated identically in both
    engines — multiplying through by 4·T (d = 3/4, T = distinct bigram
    types) gives ``((4·c₁₂ − 3)·T + 3·N₁₊(w₁·)·N₁₊(·w₂)) / (4·c₁·T)``,
    integer products exact in doubles below 2^53 (≈ 10^9 bigram
    positions — beyond that, rescale to the decimal(38) ladder). The
    final floor(1e6·avg(ln·)) is the ``unigram_logprob`` idiom.

    Scale shape: one bigram explode; ALL model tables are
    vocab-bounded aggregates with map-side combine (pair counts,
    per-w₁ totals + continuation fan-out, per-w₂ continuation
    fan-in, one scalar T) joined pair-keyed into a single stats
    table; positions join it on the pair key — an equi-JOIN (AQE
    skew-splits the Zipf-head pair), never a window. Docs with <2
    tokens are omitted. Returns (doc_id, n_bigrams, mean_logprob)."""
    from intelligent_ocr_spark.util import ensure_parallelism

    base = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
    )
    tarr = F.col("_toks")
    bigram_arr = F.when(
        F.size(tarr) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tarr) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(tarr, i), F.element_at(tarr, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = base.select("doc_id", F.explode(bigram_arr).alias("pair"))
    pc = (
        bg.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("c12"))
        .withColumn("w1", F.split("pair", " ")[0])
        .withColumn("w2", F.split("pair", " ")[1])
    )
    w1s = pc.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1p_w1")
    )
    w2s = pc.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_w2"))
    t = pc.agg(F.count(F.lit(1)).alias("t_pairs"))
    stats = (
        pc.join(w1s, "w1")
        .join(w2s, "w2")
        .crossJoin(F.broadcast(t))
        .select(
            "pair",
            F.log(
                F.expr(
                    "((4 * c12 - 3) * t_pairs + 3 * n1p_w1 * n1p_w2)"
                    " / (4.0 * c1 * t_pairs)"
                )
            ).alias("_lnp"),
        )
    )
    return (
        bg.join(stats, "pair")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.floor(F.avg("_lnp") * F.lit(1e6)) / F.lit(1e6)).alias(
                "mean_logprob"
            ),
        )
        .orderBy("doc_id")
    )


def lang_sample_weights(df, lang_col: str = "lang", budget: int = 100_000):
    """Temperature-balanced language sampling weights (the multilingual
    α-sampling of mBERT/XLM-R, α = 0.5): a language's draw weight is
    ∝ n_l^α, which up-samples tail languages relative to their raw
    share without letting the head language drown them.

    α is fixed at 0.5 because sqrt is IEEE-754 correctly-rounded —
    both engines produce the bit-identical double, where a libm ``pow``
    would not be guaranteed to.  The normalization then runs in integer
    micro-units (floor(sqrt(n)·1e6) summed as BIGINT) so neither the
    share nor the allocation depends on double summation order — the
    same merge-order-exactness trick as ``source_token_drift``.

    Shape: one tiny groupBy (|langs| rows) + a broadcast scalar; the
    expensive side is the scan, which is unavoidable.  Returns
    (lang, n_docs, weight, expected_docs) where expected_docs allocates
    ``budget`` draws by floor(budget · w_l / Σw).
    """
    counts = (
        df.groupBy(F.col(lang_col).alias("lang"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    micro = F.floor(F.sqrt(F.col("n_docs")) * F.lit(1e6)).cast("long")
    wtot = counts.agg(F.sum(micro).alias("w_total"))
    return (
        counts.withColumn("w_micro", micro)
        .crossJoin(F.broadcast(wtot))
        .select(
            "lang",
            "n_docs",
            (
                F.floor(F.col("w_micro") / F.col("w_total") * F.lit(1e6))
                / F.lit(1e6)
            ).alias("weight"),
            F.floor(F.lit(budget) * F.col("w_micro") / F.col("w_total"))
            .cast("long")
            .alias("expected_docs"),
        )
        .orderBy("lang")
    )


def source_overlap(df, source_col: str = "source", text_col: str = "text",
                   shingle_n: int = 3):
    """Pairwise content overlap between corpus slices: Jaccard over each
    source's DISTINCT token shingles — the "how much does dump B
    duplicate dump A" measurement that decides whether a new crawl
    slice is worth ingesting before any doc-level dedup runs.

    Shape: distinct (source, shingle) — the explode collapses to at most
    |sources|·|vocab| rows — then a self-equi-join on the shingle hash
    with source_a < source_b and one count per pair; output cardinality
    is sources², not docs². Returns (source_a, source_b, n_shared,
    jaccard) floor-scaled.
    """
    from intelligent_ocr_spark.operators.dedup import shingles
    from intelligent_ocr_spark.util import ensure_parallelism

    sh = (
        ensure_parallelism(df)
        .select(
            F.col(source_col).alias("source"),
            F.explode(shingles(F.col(text_col), shingle_n)).alias("shingle"),
        )
        .distinct()
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            (
                F.floor(
                    F.col("n_shared")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
                    * F.lit(1e6)
                )
                / F.lit(1e6)
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def weighted_lang_sample(
    df, lang_col: str = "lang", id_col: str = "doc_id",
    budget: int = 100_000, salt: str = "ws0",
):
    """Materialize the α=0.5 temperature-balanced sample that
    :func:`lang_sample_weights` allocates: each document is kept with
    probability ``expected_docs(lang) / n_docs(lang)``, decided by a
    content-addressed hash threshold so the draw is deterministic
    across engines, partitionings, and retries (the
    ``deterministic_sample`` contract, but with a per-language rate).

    The threshold test is INTEGER-EXACT: keep iff
    ``h32 · n_docs < expected_docs · 2^32`` where ``h32`` is the first
    8 md5 hex chars of ``salt|id``. Both products run in decimal(38)
    (HUGEINT in the DuckDB twin) — no float rounding at any corpus
    size, where ``h32/2^32 < frac`` in doubles would waver on the
    boundary.

    Shape: the allocation table is |langs| rows → broadcast join;
    the filter is a projection. Returns the sampled (id, lang) rows.
    """
    alloc = lang_sample_weights(df, lang_col, budget).select(
        "lang", "n_docs", "expected_docs"
    )
    h32 = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.lit(salt), F.col(id_col).cast("string")
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    return (
        df.select(F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang"))
        .join(F.broadcast(alloc), "lang")
        .filter(
            h32 * F.col("n_docs").cast("decimal(38,0)")
            < F.col("expected_docs").cast("decimal(38,0)") * F.lit(2**32).cast("decimal(38,0)")
        )
        .select("doc_id", "lang")
    )


def ccnet_buckets(
    df, id_col: str = "doc_id", text_col: str = "text", lang_col: str = "lang"
):
    """CCNet's per-LANGUAGE perplexity bucketing (Wenzek et al. 2020,
    §4.3): documents are ranked by an LM score WITHIN their language and
    cut into head / middle / tail tertiles.  The per-language cut is the
    operator's whole point — LM scores are not comparable across
    languages (a median English doc and a median Thai doc score wildly
    differently), so the global-threshold gate
    (``pipeline_perplexity_gate``) systematically drains low-resource
    languages while this one keeps each language's own best third.

    Score = :func:`unigram_logprob` (the relational CCNet proxy; swap in
    :func:`kn_bigram_logprob` for the KenLM-shaped score — the bucketing
    is score-agnostic).  Buckets: ``head`` = mean_logprob >= that
    language's p67, ``middle`` >= p33, else ``tail``; thresholds are
    floor-scaled to the same 1e-6 grid as the scores so both engines
    compare identical doubles.

    Scale shape: the scores frame is one row per doc (its internals are
    the audited heavy-hitter-safe hybrid); the threshold frame is ONE
    ROW PER LANGUAGE — computed by an exact ``percentile`` here and
    BROADCAST back, so bucket assignment is a projection and the output
    aggregation is an ordinary map-side-combined groupBy on
    (lang, bucket).  At real scale the exact per-group percentile (which
    buffers a language's score list) swaps for ``approx_percentile`` —
    CCNet itself cuts on approximate thresholds; the oracle pins the
    exact form.

    Returns (lang, bucket, n_docs, avg_logprob) ordered by (lang,
    bucket), avg in integer-micro-unit exact form.
    """
    lp = unigram_logprob(df, id_col, text_col)
    scored = lp.join(
        df.select(F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")),
        "doc_id",
    )
    th = scored.groupBy("lang").agg(
        (F.floor(F.expr("percentile(mean_logprob, 0.33)") * F.lit(1e6)) / F.lit(1e6)).alias("p33"),
        (F.floor(F.expr("percentile(mean_logprob, 0.67)") * F.lit(1e6)) / F.lit(1e6)).alias("p67"),
    )
    bucketed = scored.join(F.broadcast(th), "lang").withColumn(
        "bucket",
        F.when(F.col("mean_logprob") >= F.col("p67"), F.lit("head"))
        .when(F.col("mean_logprob") >= F.col("p33"), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.floor(
                    F.avg(F.round(F.col("mean_logprob") * F.lit(1e6)).cast("long"))
                )
                / F.lit(1e6)
            ).alias("avg_logprob"),
        )
        .orderBy("lang", "bucket")
    )
