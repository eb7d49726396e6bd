"""Training-batch preparation operators: chunking, packing, PII redaction.

The last mile between a cleaned corpus and a tokenizer-bound training
run (public pipeline practice — RefinedWeb/FineWeb/Pile preparation
stages; no reference analog). All pure DataFrame compositions, each
with an exact DuckDB oracle twin in ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "chunk_documents",
    "domain_caps",
    "dsir_importance_weights",
    "hashed_linear_score",
    "leakage_safe_split",
    "pack_sequences",
    "pii_signals",
    "shard_assign",
]


def chunk_documents(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    chunk_tokens: int = 32, overlap: int = 4,
) -> DataFrame:
    """Split each document into fixed-size token chunks with overlap —
    the context-window splitter (long doc → training samples). Chunk k
    starts at token ``k·(chunk_tokens − overlap) + 1``; the last chunk
    may be short but is never empty, and a doc shorter than one chunk
    yields itself. Pure projection + explode (no shuffle at all until
    the caller aggregates): at 100 TB this runs at scan speed.

    Returns (doc_id, chunk_id, chunk_text, n_tokens), chunk_id 0-based.
    """
    ts = F.split(F.col(text_col), " ")
    step = chunk_tokens - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    # number of chunks: ceil(max(size - overlap, 1) / step)
    n_chunks = F.greatest(
        F.ceil((F.size(ts) - F.lit(overlap)).cast("double") / F.lit(step)),
        F.lit(1),
    ).cast("int")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda k: F.struct(
                    k.alias("chunk_id"),
                    F.slice(ts, k * step + 1, chunk_tokens).alias("_toks"),
                ),
            )
        ).alias("c"),
    ).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.concat_ws(" ", F.col("c._toks")).alias("chunk_text"),
        F.size(F.col("c._toks")).alias("n_tokens"),
    )


def pack_sequences(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    budget: int = 256, n_parts: int | None = 32,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget training bins — streaming
    first-fit packing in doc-id order: consecutive docs accumulate into
    a bin until the cumulative prefix sum crosses the next ``budget``
    boundary. Bin fill is approximate by construction: a doc whose
    prefix sum lands near the end of a bin STRADDLES the boundary, so a
    bin can exceed ``budget`` by up to one doc's tokens minus one (and a
    single doc larger than the budget spans several boundaries on its
    own). Split long docs first with :func:`chunk_documents` if hard
    budget caps matter.

    This is the order-preserving relaxation of bin packing that stays
    fully relational: a window cumsum over the doc order — optimal
    packing is NP-hard and needs no more than this in practice, since a
    shuffled corpus's doc sizes are exchangeable.

    **Partitioning (the 100-TB shape, default):** with ``n_parts > 1``
    each doc is assigned a deterministic content-addressed part
    ``md5(doc_id) mod n_parts`` and packing runs independently per part
    — the window is partitioned by ``part_id``, so the exchange hashes
    on it and no single task ever sorts the whole corpus. Bins never
    cross parts; part assignment is engine-reproducible (the DuckDB
    oracle computes the identical md5 bucket), partitioning-stable, and
    retry-stable. Returns (part_id, bin_id, n_docs, n_tokens), bin_id
    0-based within its part.

    **Global form (``n_parts=None`` or 1):** one totally-ordered cumsum
    — a SINGLE-task window, the textbook unsplittable shape. Kept only
    for small inputs where one global in-order sequence is required.
    Returns (bin_id, n_docs, n_tokens).

    ``n_tokens_col`` switches the doc-size measure from the default
    whitespace split of ``text_col`` to a precomputed per-doc count
    column (e.g. real BPE token counts from
    :func:`~intelligent_ocr_spark.operators.bpe.bpe_token_counts`), so
    packing budgets can be actual tokenizer budgets.
    """
    if n_tokens_col is not None:
        sized = df.select(
            F.col(id_col).alias("doc_id"),
            F.col(n_tokens_col).cast("long").alias("n_tokens"),
        )
    else:
        sized = df.select(
            F.col(id_col).alias("doc_id"),
            F.size(F.split(F.col(text_col), " ")).alias("n_tokens"),
        )
    if n_parts and n_parts > 1:
        part = F.pmod(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
                16, 10,
            ).cast("long"),
            F.lit(n_parts),
        ).cast("int")
        sized = sized.withColumn("part_id", part)
        w = Window.partitionBy("part_id").orderBy("doc_id")
        group_cols = ["part_id", "bin_id"]
    else:
        w = Window.orderBy("doc_id")
        group_cols = ["bin_id"]
    # bin of a doc = floor(cumsum_before / budget): a doc enters the bin
    # its PREFIX sum points at (first-fit-in-order semantics; straddling
    # docs make the bin run over — see the docstring)
    binned = sized.withColumn(
        "cum_before",
        F.coalesce(
            F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).withColumn("bin_id", F.floor(F.col("cum_before") / F.lit(budget)))
    return (
        binned.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy(*group_cols)
    )


def domain_caps(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id",
    cap: int = 100,
) -> DataFrame:
    """Per-domain document quota — the crawl-diversification step public
    corpus pipelines run so one mega-host cannot dominate the training
    mix: keep at most ``cap`` documents per registrable host, chosen by
    a content-addressed hash order (md5 of the doc id — deterministic,
    partitioning- and retry-stable, unbiased by crawl order, the same
    property contract as ``deterministic_sample``).

    Scale shape: host extraction is a projection (``regexp_extract``,
    JVM codegen); the quota is ``row_number() <= cap`` over (host,
    hash-order) FILTERED immediately, which Spark's rank-limit pushdown
    (WindowGroupLimit) turns into a per-map-partition top-``cap``
    BEFORE the exchange — a mega-host's millions of rows reduce to
    ``cap × n_partitions`` candidates in flight, so the hot host never
    lands whole on one task (plan-pinned). The per-host totals come
    from a separate map-side-combined groupBy (host-count rows are
    vocab-sized), deliberately NOT from the window frame: keeping
    unfiltered ranks alive would disable the pushdown. Returns
    (host, n_docs, n_kept) ordered.
    """
    host = F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
    base = df.select(F.col(id_col).alias("doc_id"), host.alias("host"))
    totals = base.groupBy("host").agg(F.count(F.lit(1)).alias("n_docs"))
    kept = (
        base.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("host").orderBy(
                    F.md5(F.col("doc_id").cast("string").cast("binary")),
                    F.col("doc_id"),
                )
            ),
        )
        .filter(F.col("rk") <= cap)
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return totals.join(kept, "host", "left").select(
        "host",
        "n_docs",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
    ).orderBy("host")


# RE2-safe patterns (no backreferences/lookaround) so the DuckDB oracle
# evaluates the IDENTICAL regex: emails, dotted-quad IPs, and
# international-ish phone numbers long enough to avoid matching years
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
_PII_PHONE = r"\+?[0-9][0-9 ()-]{7,}[0-9]"


def pii_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc PII hit counts and the md5 of the redacted text — the
    decision signal for the scrub-or-drop policy step every public
    web-corpus pipeline runs before training. Counting and redaction are
    single-pass ``regexp_*`` column expressions (JVM codegen, no
    Python); the patterns are RE2-safe so the oracle runs the identical
    regex. Returns (doc_id, n_emails, n_ips, n_phones, redacted_md5).
    """
    t = F.col(text_col)
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _PII_EMAIL, "<EMAIL>"), _PII_IP, "<IP>"
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.regexp_extract_all(t, F.lit(_PII_EMAIL), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(_PII_IP), F.lit(0))).alias("n_ips"),
        F.size(F.regexp_extract_all(t, F.lit(_PII_PHONE), F.lit(0))).alias("n_phones"),
        F.md5(red.cast("binary")).alias("redacted_md5"),
    ).orderBy("doc_id")


def shard_assign(
    df: DataFrame, id_col: str = "doc_id", n_shards: int = 32, salt: str = "s0",
) -> DataFrame:
    """Deterministic training-shard assignment with a within-shard
    shuffle order — the "global shuffle" a distributed training run
    needs, made resumable: ``df.repartition`` + ``rand()`` changes on
    every retry, while content-addressed hashing gives every doc a
    stable (shard, order_key) no matter the partitioning, task retries,
    or cluster size.  Consumers write one output file per shard and
    read each shard sorted by ``order_key`` — a reproducible
    epoch-0 permutation of the corpus.

    shard     = first 8 md5 hex chars of ``salt|id``  (mod n_shards)
    order_key = next 8 md5 hex chars — independent of the shard bits,
                so within-shard order is unbiased by shard membership.

    Pure projection (zero exchange; the per-shard write is the caller's
    one unavoidable shuffle). Same hash family as
    ``textstats.deterministic_sample`` — DuckDB twin:
    ``('0x' || substr(md5(s||'|'||id), 1, 8))::UBIGINT``.
    """
    h = F.md5(
        F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")).cast("binary")
    )
    to_long = lambda c: F.conv(c, 16, 10).cast("long")  # noqa: E731
    return df.withColumns(
        {
            "shard": F.pmod(to_long(F.substring(h, 1, 8)), F.lit(n_shards)).cast("int"),
            "order_key": to_long(F.substring(h, 9, 8)),
        }
    )


def dsir_importance_weights(
    df: DataFrame,
    target_col: str = "is_target",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023): score every raw-corpus document by how
    much its hashed n-gram profile looks like a small TARGET corpus
    (curated text, a benchmark's training split, a high-quality source)
    relative to the raw corpus itself — the published recipe behind
    "pick the Pile-like 5% of Common Crawl".

    Features are word unigrams + bigrams hashed into ``n_buckets``
    buckets (the paper's hashed generative model); each occurrence of a
    feature in bucket b contributes
    ``ln p̂_target(b) − ln p̂_raw(b)`` with add-1 smoothing, and a doc's
    weight is the sum over its feature occurrences. ``target_col`` is a
    boolean column marking the target subset (target docs are part of
    the raw corpus, matching the paper's setup of raw ⊇ target draws).

    Exactness across engines: each bucket's contribution is rounded to
    integer NANO-units once on the ``n_buckets``-row table (both
    engines compute identical doubles from identical integer counts),
    and per-doc sums add BIGINTs — merge-order cannot move the result
    (same trick as ``textstats.source_token_drift``).

    Scale shape: explode → groupBy (doc, bucket) with map-side combine
    (the per-doc profile is ≤ n_buckets rows no matter how long the
    doc); the bucket frequency table is ``n_buckets`` rows — broadcast
    — so scoring is a broadcast join + one exchange on doc_id. No
    vocabulary-sized state anywhere: the hash fixes memory at
    ``n_buckets`` regardless of corpus size (the point of DSIR's hashed
    features at web scale). Docs with zero tokens have no features and
    are omitted.

    Returns (doc_id, n_feats, weight) ordered by doc_id, weight =
    nano-unit sum / 1e9.
    """
    from intelligent_ocr_spark.functions.textstats import tokens
    from intelligent_ocr_spark.util import ensure_parallelism

    t = tokens(F.col(text_col))
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(t, bigrams)
    ex = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        F.col(target_col).alias("_is_t"),
        F.explode(feats).alias("f"),
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("f").cast("binary")), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )
    # per-(doc, bucket) profile: bounded at n_buckets rows per doc
    prof = (
        ex.select("doc_id", "_is_t", bucket.alias("b"))
        .groupBy("doc_id", "_is_t", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bc = prof.groupBy("b").agg(
        F.sum("n").alias("c_r"),
        F.sum(F.when(F.col("_is_t"), F.col("n")).otherwise(F.lit(0))).alias("c_t"),
    )
    tot = bc.agg(F.sum("c_r").alias("n_r"), F.sum("c_t").alias("n_t"))
    m = F.lit(float(n_buckets))
    contrib = bc.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            (
                F.log((F.col("c_t") + F.lit(1.0)) / (F.col("n_t") + m))
                - F.log((F.col("c_r") + F.lit(1.0)) / (F.col("n_r") + m))
            )
            * F.lit(1e9)
        )
        .cast("long")
        .alias("cn"),
    )
    return (
        prof.join(F.broadcast(contrib), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_feats"),
            (F.sum(F.col("n") * F.col("cn")) / F.lit(1e9)).alias("weight"),
        )
        .orderBy("doc_id")
    )


def hashed_linear_score(
    df: DataFrame,
    weights: DataFrame,
    dim: int = 1024,
    bias_micro: int = 0,
    seed: str = "qlm0",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a HASHED-FEATURE linear classifier to every document —
    the fastText-style quality/domain classifier pass public corpus
    pipelines run at scale (CCNet's language-model filter, GPT-3/LLaMA
    quality classifiers are this shape: linear model over hashed
    bag-of-words, applied to every crawl document). ``weights`` is the
    trained model as a relational table (bucket, w_micro) — ``dim``
    rows max, integer micro-units; training happens offline, this
    operator is the corpus-scale APPLY step.

    ``score_micro = bias_micro + Σ_token-occurrences w[h(token) mod
    dim]`` — tf-weighted hashed bag-of-words, the hashing trick
    (Weinberger et al. 2009, public) that fixes model state at ``dim``
    buckets regardless of vocabulary. ``keep = score_micro >= 0``
    (fold the decision threshold into the bias). All-integer
    arithmetic: bit-stable across engines, partitionings, and
    retries. Docs with zero tokens emit no row (no evidence — they
    fail every upstream quality gate anyway; documented).

    Scale shape: token explode → md5 bucket (the ``shard_assign``
    hash idiom) → one map-side-combined (doc, bucket) count — per-doc
    profile rows are bounded by ``dim`` no matter the doc length —
    then a BROADCAST join against the ≤ ``dim``-row weight table and
    one doc-keyed sum. Zipf-head tokens are agg keys (collapsed
    map-side), never windows; no Python anywhere.

    Returns (doc_id, n_tokens, score_micro, keep) — n_tokens the
    exact occurrence count scored."""
    from intelligent_ocr_spark.functions.textstats import tokens

    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws("|", F.lit(seed), F.col("_tok")).cast("binary")
                ),
                1, 8,
            ),
            16, 10,
        ).cast("long"),
        F.lit(dim),
    )
    prof = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("_tok"),
        )
        .select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = weights.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("w_micro").cast("long").alias("w_micro"),
    )
    return (
        prof.join(F.broadcast(w), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_tokens"),
            (
                F.lit(bias_micro).cast("long")
                + F.sum(F.col("n") * F.coalesce("w_micro", F.lit(0)))
            ).alias("score_micro"),
        )
        .withColumn("keep", F.col("score_micro") >= 0)
    )


def leakage_safe_split(
    df: DataFrame,
    group_col: str = "host",
    val_num: int = 1,
    val_den: int = 10,
    salt: str = "sp0",
) -> DataFrame:
    """Train/validation assignment that cannot leak near-duplicates
    across the boundary: the split key is the GROUP (host/domain/
    source), not the document, so every page of a host lands on one
    side — the standard defence against same-site boilerplate and
    lightly-edited mirrors inflating validation scores.

    A group goes to ``val`` iff ``h32(salt|group) · val_den <
    val_num · 2^32`` (first 8 md5 hex chars; the integer-exact
    threshold of ``weighted_lang_sample``), i.e. a ``val_num/val_den``
    expected share of GROUPS. Deterministic across engines,
    partitionings, retries, and reruns; changing ``salt`` redraws.

    Shape: a pure projection (md5 + compare, JVM codegen) — zero
    exchanges; whatever aggregation follows dictates the shuffle.
    """
    h32 = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.lit(salt), F.col(group_col).cast("string")
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    return df.withColumn(
        "split",
        F.when(
            h32 * F.lit(val_den).cast("decimal(38,0)")
            < F.lit(val_num).cast("decimal(38,0)") * F.lit(2**32).cast("decimal(38,0)"),
            F.lit("val"),
        ).otherwise(F.lit("train")),
    )
