"""Document-shape quality rules from published web-corpus pipelines.

Two public filter suites, both pure ``pyspark.sql.functions``
compositions (JVM codegen, zero Python, zero exchange — each is a
per-row projection over array columns) with exact DuckDB oracle twins
in ``__spark_entry__.oracle_sql``:

* :func:`gopher_rules` — the MassiveText/Gopher document-shape gates
  (Rae et al. 2021, appendix A; see PAPERS.md): word-count bounds, mean
  word length, symbol-to-word ratio, bullet/ellipsis line fractions,
  alphabetic-word fraction, stopword hits.  Complements
  ``textstats.repetition_signals``, which carries the repetition half
  of the same suite.
* :func:`c4_filters` — the C4 line-level cleaning rules (Raffel et al.
  2020 §2.2): keep lines that end in terminal punctuation, carry at
  least five words, and don't mention javascript; gate pages on
  "lorem ipsum", curly braces, and a minimum sentence count.  Emits
  the keep decision AND an md5 of the cleaned text so the oracle pins
  the exact cleaned byte stream, not just the counts.

Scale shape: both operators are ``Project`` nodes — no shuffle, no
Python, no window.  At 100 TB they run at scan speed and compose with
any downstream gate (the same class as the reference's cheap-scan
filters F1/F4/F5, ``core/pdf_processor.py`` filter ladder).

Cross-engine exactness: fractions are exact double divisions of two
integers (identical in IEEE-754 on both engines) floor-scaled to 1e-6;
occurrence counts use length-difference-after-replace, whose greedy
left-to-right non-overlapping semantics agree between Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["gopher_rules", "c4_filters", "blocklist_gate", "quality_funnel"]

#: Gopher's stopword-presence gate list (appendix A: "contains at least
#: two of the following English words").
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _f6(c: Column) -> Column:
    """Floor-scale a double to 1e-6 — bit-identical across engines
    (round half-up boundaries are not)."""
    return F.floor(c * F.lit(1e6)) / F.lit(1e6)


def _occurrences(col: Column, needle: str) -> Column:
    """Non-overlapping occurrence count via length difference."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def gopher_rules(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Gopher document-shape signals and gate verdicts.

    Emits (doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
    ellipsis_frac, alpha_frac, stop_hits, passes):

    * ``n_words`` — whitespace tokens; gate: 50 ≤ n ≤ 100,000
    * ``mean_word_len`` — gate: 3 ≤ mean ≤ 10
    * ``symbol_ratio`` — (# + … + ...) occurrences per word; gate ≤ 0.1
    * ``bullet_frac`` — lines starting with a bullet; gate ≤ 0.9
    * ``ellipsis_frac`` — lines ending with an ellipsis; gate ≤ 0.3
    * ``alpha_frac`` — words containing an alphabetic char; gate ≥ 0.8
    * ``stop_hits`` — how many of Gopher's eight stopwords appear;
      gate ≥ 2
    * ``passes`` — conjunction of all gates

    The repetition half of the Gopher suite (distinct/max-word/bigram
    fractions) lives in ``textstats.repetition_signals``; together they
    reproduce the published filter set.  Reference parity: the cheap
    scan-then-threshold filter class of ``core/pdf_processor.py``'s
    blank/confidence gates, applied to corpus quality.
    """
    t = F.col(text_col)
    words = F.filter(F.split(t, "\\s+"), lambda w: w != F.lit(""))
    lines = F.split(t, "\n")
    n_words = F.size(words).cast("long")
    n_lines = F.size(lines).cast("long")
    nw = n_words.cast("double")
    char_sum = F.aggregate(
        F.transform(words, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    mean_len = F.when(n_words > 0, char_sum / nw).otherwise(F.lit(0.0))
    symbols = (
        _occurrences(t, "#") + _occurrences(t, "…") + _occurrences(t, "...")
    )
    symbol_ratio = F.when(n_words > 0, symbols / nw).otherwise(F.lit(0.0))
    bullet_frac = F.size(
        F.filter(lines, lambda l: l.rlike("^\\s*[•*\\-]"))
    ) / n_lines.cast("double")
    ellipsis_frac = F.size(
        F.filter(lines, lambda l: l.rlike("(\\.\\.\\.|…)\\s*$"))
    ) / n_lines.cast("double")
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / nw,
    ).otherwise(F.lit(0.0))
    toks = F.transform(words, lambda w: F.lower(w))
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(toks, s),
        )
    ).cast("long")
    out = df.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        _f6(mean_len).alias("mean_word_len"),
        _f6(symbol_ratio).alias("symbol_ratio"),
        _f6(bullet_frac).alias("bullet_frac"),
        _f6(ellipsis_frac).alias("ellipsis_frac"),
        _f6(alpha_frac).alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
    )
    return out.withColumn(
        "passes",
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100000)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("bullet_frac") <= 0.9)
        & (F.col("ellipsis_frac") <= 0.3)
        & (F.col("alpha_frac") >= 0.8)
        & (F.col("stop_hits") >= 2),
    )


def c4_filters(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document C4 cleaning: line-level keep rules plus page gates.

    A line (trimmed) is kept iff it ends in terminal punctuation
    (``. ! ? "``), has ≥ 5 whitespace words, and does not contain
    "javascript" (case-insensitive).  The page is kept iff its raw text
    has no "lorem ipsum" (case-insensitive), no ``{``, and the cleaned
    text holds ≥ 3 sentence-final marks.

    Emits (doc_id, n_lines, n_kept, n_sentences, page_kept,
    cleaned_md5) — the md5 is over the kept lines joined with newlines,
    so the oracle verifies the exact cleaned byte stream.
    """
    t = F.col(text_col)
    lines = F.transform(F.split(t, "\n"), lambda l: F.trim(l))
    kept = F.filter(
        lines,
        lambda l: l.rlike('[.!?"]$')
        & (
            F.size(F.filter(F.split(l, "\\s+"), lambda w: w != F.lit("")))
            >= 5
        )
        & ~F.lower(l).contains("javascript"),
    )
    cleaned = F.array_join(kept, "\n")
    n_sentences = F.length(
        F.regexp_replace(cleaned, "[^.!?]", "")
    ).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        n_sentences.alias("n_sentences"),
        (
            ~F.lower(t).contains("lorem ipsum")
            & ~t.contains("{")
            & (n_sentences >= 3)
        ).alias("page_kept"),
        F.md5(cleaned.cast("binary")).alias("cleaned_md5"),
    )


def blocklist_gate(
    df: DataFrame,
    words: tuple[str, ...] | list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4's word-blocklist page gate (Raffel et al. 2020 §2.2: pages
    containing any word on a banned-word list are dropped wholesale).
    The LIST is a caller-supplied parameter — C4 proper uses the public
    "List of Dirty, Naughty, Obscene..." list; tests and the registered
    query use neutral placeholder tokens because the engine's deliverable
    is the gate SHAPE (token-boundary matching, auditable hit evidence,
    keep decision), not any particular list's contents.

    Matching is on whole tokens from the shared corpus tokenizer
    (:func:`~intelligent_ocr_spark.functions.textstats.tokens`), not
    substrings — C4 matches words, and substring matching is the classic
    Scunthorpe false-positive. Emits per doc:

    * ``n_hits`` — blocklist token occurrences (with multiplicity)
    * ``hit_words`` — the DISTINCT blocklist words present, sorted (the
      audit column a filtering report needs)
    * ``hit_frac`` — hits / tokens, floor-scaled to 1e-6 (some pipelines
      gate on a fraction threshold instead of C4's any-hit rule)
    * ``page_kept`` — C4's rule: no hits at all

    Scale shape: a pure projection — the list folds into literal array
    expressions (constant, shipped in the plan, no broadcast join, no
    shuffle, no Python). At 100 TB this runs at scan speed like the
    other page gates; a list too large for a literal (C4's is ~400
    words — fine) would switch to a broadcast left-semi join on the
    exploded tokens.
    """
    wl = F.lit(list(words)).cast("array<string>")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )
    hits = F.filter(toks, lambda t: F.array_contains(wl, t))
    n_toks = F.size(toks)
    n_hits = F.size(hits)
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_hits.cast("long").alias("n_hits"),
        F.array_sort(F.array_distinct(hits)).alias("hit_words"),
        F.when(
            n_toks > 0,
            F.floor(n_hits.cast("double") / n_toks.cast("double") * F.lit(1e6))
            / F.lit(1e6),
        )
        .otherwise(F.lit(0.0))
        .alias("hit_frac"),
        (n_hits == 0).alias("page_kept"),
    )


def _gopher_flag(t: Column) -> Column:
    """:func:`gopher_rules`' ``passes`` verdict as ONE pure column
    expression — the funnel needs all gate booleans in a single
    projection (per-doc joins of three flag frames would shuffle the
    whole corpus on doc_id for three one-bit columns).  Gate thresholds
    apply to the same floor-scaled values the DataFrame form emits;
    ``test_flag_columns_match_rule_frames`` pins the equivalence so the
    two forms cannot drift.
    """
    words = F.filter(F.split(t, "\\s+"), lambda w: w != F.lit(""))
    lines = F.split(t, "\n")
    n_words = F.size(words).cast("long")
    nw = n_words.cast("double")
    n_lines = F.size(lines).cast("double")
    char_sum = F.aggregate(
        F.transform(words, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    mean_len = _f6(F.when(n_words > 0, char_sum / nw).otherwise(F.lit(0.0)))
    symbols = (
        _occurrences(t, "#") + _occurrences(t, "…") + _occurrences(t, "...")
    )
    symbol_ratio = _f6(F.when(n_words > 0, symbols / nw).otherwise(F.lit(0.0)))
    bullet_frac = _f6(
        F.size(F.filter(lines, lambda l: l.rlike("^\\s*[•*\\-]"))) / n_lines
    )
    ellipsis_frac = _f6(
        F.size(F.filter(lines, lambda l: l.rlike("(\\.\\.\\.|…)\\s*$"))) / n_lines
    )
    alpha_frac = _f6(
        F.when(
            n_words > 0,
            F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / nw,
        ).otherwise(F.lit(0.0))
    )
    toks = F.transform(words, lambda w: F.lower(w))
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(toks, s),
        )
    ).cast("long")
    return (
        (n_words >= 50)
        & (n_words <= 100000)
        & (mean_len >= 3.0)
        & (mean_len <= 10.0)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (stop_hits >= 2)
    )


def _c4_page_kept(t: Column) -> Column:
    """:func:`c4_filters`' ``page_kept`` verdict as one pure column
    (same drift guard as :func:`_gopher_flag`)."""
    lines = F.transform(F.split(t, "\n"), lambda l: F.trim(l))
    kept = F.filter(
        lines,
        lambda l: l.rlike('[.!?"]$')
        & (
            F.size(F.filter(F.split(l, "\\s+"), lambda w: w != F.lit("")))
            >= 5
        )
        & ~F.lower(l).contains("javascript"),
    )
    n_sentences = F.length(
        F.regexp_replace(F.array_join(kept, "\n"), "[^.!?]", "")
    )
    return (
        ~F.lower(t).contains("lorem ipsum")
        & ~t.contains("{")
        & (n_sentences >= 3)
    )


def quality_funnel(
    df: DataFrame,
    blocklist_words: tuple[str, ...] | list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sequential quality-gate ATTRITION report — the table every
    published corpus build ships (C4 §2.2's removal stats, Gopher
    appendix A ablations, RefinedWeb's stage-by-stage doc counts): how
    many documents each gate removes when gates apply IN ORDER.  Order
    matters — a doc failing two gates is charged to the FIRST, so these
    are funnel numbers, not independent per-gate drop rates.

    Stages: 1 ``gopher_shape`` (document-shape gates), 2
    ``c4_page_gates`` (line-rule page gate), 3 ``word_blocklist``
    (token blocklist, parametric list).

    Scale shape: all three verdicts evaluate in ONE zero-exchange
    projection over the text scan (column-level twins of the rule
    operators — no per-doc join of flag frames, which would shuffle the
    corpus on doc_id for three booleans).  A single global aggregation
    folds the corpus map-side into one row of four counters (the only
    exchange, scalar SinglePartition by nature), and the three stage
    rows are an explode of that row.  At 100 TB: scan speed + one
    4-counter shuffle.

    Returns (stage_idx, stage, n_in, n_dropped, n_out) ordered by
    stage_idx.
    """
    t = F.col(text_col)
    wl = F.lit(list(blocklist_words)).cast("array<string>")
    toks = F.filter(
        F.split(F.lower(t), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    flags = df.select(
        _gopher_flag(t).alias("g"),
        _c4_page_kept(t).alias("c"),
        (
            F.size(F.filter(toks, lambda x: F.array_contains(wl, x))) == 0
        ).alias("b"),
    )
    one = F.lit(1).cast("long")
    zero = F.lit(0).cast("long")
    counts = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.when(F.col("g"), one).otherwise(zero)).alias("n1"),
        F.sum(F.when(F.col("g") & F.col("c"), one).otherwise(zero)).alias("n2"),
        F.sum(
            F.when(F.col("g") & F.col("c") & F.col("b"), one).otherwise(zero)
        ).alias("n3"),
    )

    def stage(idx: int, name: str, n_in: str, n_out: str) -> Column:
        return F.struct(
            F.lit(idx).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col(n_in).alias("n_in"),
            (F.col(n_in) - F.col(n_out)).alias("n_dropped"),
            F.col(n_out).alias("n_out"),
        )

    return (
        counts.select(
            F.explode(
                F.array(
                    stage(1, "gopher_shape", "n0", "n1"),
                    stage(2, "c4_page_gates", "n1", "n2"),
                    stage(3, "word_blocklist", "n2", "n3"),
                )
            ).alias("s")
        )
        .select("s.*")
        .orderBy("stage_idx")
    )
