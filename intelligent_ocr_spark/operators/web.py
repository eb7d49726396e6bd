"""Crawl-compliance and link-graph operators: robots.txt evaluation
and anchor extraction at corpus scale.

RFC 9309 (Robots Exclusion Protocol — public spec) evaluation as a
relational plan: parse every host's robots.txt into its ``*``-group
rules, then decide each URL by the longest-matching path rule with
allow winning ties (§2.2.2). Real web pipelines run exactly this pass
when re-deriving a corpus from raw crawl data whose politeness filter
must be reapplied or audited.

Scope (documented): rules from the ``User-agent: *`` group(s) only
(pipeline audits evaluate the generic group), literal path prefixes —
rules whose path uses the ``*``/``$`` wildcards are skipped. Matching
is against the URL path (query strings excluded).

Scale shape: robots parsing windows per HOST (robots files are ≤ a few
KB — thousands of tiny window partitions, the benign kind); the
URL-side join is an equi-join on host followed by a prefix test, so
the fan-out per URL is that host's rule count (bounded by robots file
size, never corpus-sized), and the verdict is one max-of-struct
aggregate per URL — lexicographic (matched, prefix-length, is-allow)
implements longest-match-allow-wins without any window over URLs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "robots_star_rules",
    "robots_allowed",
    "robots_crawl_delay",
    "extract_links",
    "extract_links_base_resolved",
    "host_edges",
    "extract_anchor_texts",
    "anchor_retrieval_pairs",
    "host_anchor_profile",
    "parse_sitemaps",
    "url_path_templates",
    "resolve_redirect_chains",
]


def _robots_star_lines(robots: DataFrame, host_col: str,
                       txt_col: str) -> DataFrame:
    """Shared group machinery: every (host, k, v) line belonging to a
    ``User-agent: *`` group. Group tracking is the RFC's line-state
    machine made relational: a ``User-agent`` line RUN starts a group
    (lag window per host), directives attach to the nearest preceding
    group, and only groups naming ``*`` survive."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("idx", "line"),
    )
    key = F.lower(F.trim(F.regexp_extract("line", r"^\s*([A-Za-z-]+)\s*:", 1)))
    val = F.trim(F.regexp_extract("line", r"^[^:#]*:\s*([^#]*)", 1))
    parsed = (
        lines.select("host", "idx", key.alias("k"), val.alias("v"))
        .filter(F.col("k") != "")
        .withColumn("is_ua", F.col("k") == "user-agent")
    )
    w = Window.partitionBy("host").orderBy("idx")
    grouped = parsed.withColumn(
        "new_grp",
        (F.col("is_ua") & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False))).cast("int"),
    ).withColumn("grp", F.sum("new_grp").over(w))
    star = (
        grouped.filter(F.col("is_ua") & (F.col("v") == "*"))
        .select("host", "grp")
        .distinct()
    )
    return grouped.join(star, ["host", "grp"])


def robots_star_rules(robots: DataFrame, host_col: str = "host",
                      txt_col: str = "robots_txt") -> DataFrame:
    """Parse robots.txt bodies into the ``*``-group rule table
    (host, is_allow, path); see ``_robots_star_lines`` for the group
    state machine."""
    return (
        _robots_star_lines(robots, host_col, txt_col)
        .filter(
            F.col("k").isin("allow", "disallow")
            & (F.col("v") != "")
            & ~F.col("v").contains("*")
            & ~F.col("v").contains("$")
        )
        .select(
            "host",
            (F.col("k") == "allow").alias("is_allow"),
            F.col("v").alias("path"),
        )
        .distinct()
    )


def robots_crawl_delay(robots: DataFrame, host_col: str = "host",
                       txt_col: str = "robots_txt") -> DataFrame:
    """Per-host ``Crawl-delay`` from the ``*`` group(s):
    (host, crawl_delay_s). The de-facto politeness directive (not in
    RFC 9309 but honored by Bing/Yandex and emitted by a large share
    of real robots.txt files) — the number a crawl frontier needs to
    turn a per-host URL list into a fetch schedule.

    Scope (documented): integer-second values only (``^\\d+$`` —
    fractional or junk values are ignored, matching the conservative
    readers); multiple ``*``-group declarations take the MAX (the
    politest interpretation). Hosts without a valid directive emit no
    row — the caller chooses its default.

    Scale shape: same per-host line windows as ``robots_star_rules``
    (robots files are KB-sized → thousands of tiny window partitions),
    then one map-side-combined max per host."""
    return (
        _robots_star_lines(robots, host_col, txt_col)
        .filter((F.col("k") == "crawl-delay") & F.col("v").rlike(r"^\d+$"))
        .groupBy("host")
        .agg(F.max(F.col("v").cast("long")).alias("crawl_delay_s"))
    )


def robots_allowed(pages: DataFrame, robots: DataFrame,
                   url_col: str = "url") -> DataFrame:
    """Per-URL robots verdict: (url, host, allowed). Longest matching
    rule wins; exact-length tie → Allow (RFC 9309 §2.2.2); no matching
    rule (or no robots.txt for the host) → allowed."""
    rules = robots_star_rules(robots).withColumnRenamed("path", "rpath")
    host = F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
    path = F.coalesce(
        F.nullif(
            F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/]+(/[^#?]*)", 1),
            F.lit(""),
        ),
        F.lit("/"),
    )
    u = pages.select(F.col(url_col).alias("url"), host.alias("host"), path.alias("path"))
    j = u.join(rules, "host", "left")
    # lexicographic max over (matched, prefix_len, is_allow): picks the
    # longest match, allow on ties; an all-zero best means "no rule hit"
    hit = F.col("rpath").isNotNull() & F.col("path").startswith(F.col("rpath"))
    verdict = F.max(
        F.struct(
            F.when(hit, 1).otherwise(0).alias("m"),
            F.when(hit, F.length("rpath")).otherwise(F.lit(0)).alias("ln"),
            F.when(hit, F.col("is_allow").cast("int")).otherwise(F.lit(0)).alias("al"),
        )
    )
    return (
        j.groupBy("url", "host")
        .agg(verdict.alias("best"))
        .select(
            "url",
            "host",
            ((F.col("best.m") == 0) | (F.col("best.al") == 1)).alias("allowed"),
        )
        .orderBy("url")
    )


def extract_links(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html",
                  keep: list[str] | None = None,
                  resolve_root_relative: bool = False) -> DataFrame:
    """(url, html) → one row per outgoing anchor: (src_url, src_host,
    href, dst_host). The edge-extraction pass every link-graph /
    crawl-frontier pipeline runs over raw pages (reference scope: the
    repo's extractor consumes pages; authority signals over their link
    structure are the web-corpus extension).

    Scope (documented): double-quoted ``href`` attributes carrying an
    ABSOLUTE http(s) URL. Relative, fragment, ``mailto:`` and
    single-quoted hrefs are skipped — relative resolution needs a base
    tracked per page and is out of scope for the authority signal,
    which only consumes cross-host edges anyway. ``dst_host`` is the
    authority component, cut at the first of ``/ : ? #`` (ports
    dropped, same as ``robots_allowed``'s host parse).

    Scale shape: a pure projection + ``Generate`` (explode) — zero
    exchanges, whole-stage codegen end to end (plan-pinned); the regex
    is RE2-safe (no backtracking constructs). Dedup/aggregation is the
    caller's choice (see ``host_edges``), so the extraction itself
    never shuffles. ``keep`` names extra input columns to carry through
    (e.g. the event timestamp for streaming windows — a pass-through
    column beats a stream-stream self-join).

    ``resolve_root_relative=True`` additionally resolves ROOT-relative
    hrefs (``/path…``, the dominant intra-site link form in real
    crawls) against the page's scheme+host — frontier discovery needs
    them even though they never contribute cross-host authority edges.
    Path-relative (``a/b``), protocol-relative (``//host``) and
    fragment hrefs stay out of scope (they need a tracked ``<base>``).
    """
    href = F.explode(
        F.expr(
            f"regexp_extract_all({html_col}, '<a\\\\s[^>]*href=\"([^\"]*)\"', 1)"
        )
    ).alias("href")
    out = pages.select(
        F.col(url_col).alias("src_url"),
        F.regexp_extract(
            F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1
        ).alias("src_host"),
        href,
        *[F.col(c) for c in (keep or [])],
    )
    if resolve_root_relative:
        # '/path…' (but not protocol-relative '//host') → scheme+
        # authority+path; the authority KEEPS the port (unlike the
        # dst_host signal column, which strips it)
        base = F.regexp_extract(
            F.col("src_url"), r"^([a-z][a-z0-9+.-]*://[^/?#]+)", 1
        )
        out = out.withColumn(
            "href",
            F.when(
                F.col("href").rlike(r"^/([^/]|$)"),
                F.concat(base, F.col("href")),
            ).otherwise(F.col("href")),
        )
    return (
        out.filter(F.col("href").rlike(r"^https?://"))
        .withColumn(
            "dst_host",
            F.regexp_extract("href", r"^https?://([^/:?#]+)", 1),
        )
    )


def extract_links_base_resolved(pages: DataFrame, url_col: str = "url",
                                html_col: str = "html",
                                keep: list[str] | None = None) -> DataFrame:
    """(url, html) → one row per anchor with FULL relative-href
    resolution: (src_url, src_host, href, resolved, dst_host). Closes
    the scope ``extract_links`` documents away — path-relative
    (``a/b``, ``./a``, ``../a``), protocol-relative (``//host``),
    query-only and root-relative hrefs all resolve, honoring an
    HTML ``<base href>`` when the page declares one (first
    double-quoted ``<base>`` tag; used only if itself an absolute
    http(s) URL, the overwhelmingly dominant real-world form —
    a RELATIVE base href would itself need resolving and is ignored,
    documented scope). Un-fetchable refs (``mailto:``, ``javascript:``,
    fragment-only, empty) yield no row.

    Scale shape: identical to ``extract_links`` — a pure projection +
    ``Generate``, zero exchanges, whole-stage codegen (plan-pinned in
    tests/test_web.py); ``resolve_href`` is a CASE chain of built-in
    string expressions, no Python anywhere. ``href`` keeps the raw
    attribute value so lineage back to the page byte-stream survives
    resolution."""
    from ..functions.urlnorm import resolve_href

    base_tag = F.regexp_extract(
        F.col(html_col), r'<base\s[^>]*href="([^"]*)"', 1
    )
    eff_base = F.when(
        base_tag.rlike(r"^https?://"), base_tag
    ).otherwise(F.col(url_col))
    href = F.explode(
        F.expr(
            f"regexp_extract_all({html_col}, '<a\\\\s[^>]*href=\"([^\"]*)\"', 1)"
        )
    ).alias("href")
    return (
        pages.select(
            F.col(url_col).alias("src_url"),
            F.regexp_extract(
                F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1
            ).alias("src_host"),
            eff_base.alias("_base"),
            href,
            *[F.col(c) for c in (keep or [])],
        )
        .withColumn("resolved", resolve_href(F.col("_base"), F.col("href")))
        .filter(F.col("resolved").rlike(r"^https?://"))
        .withColumn(
            "dst_host",
            F.regexp_extract("resolved", r"^https?://([^/:?#]+)", 1),
        )
        .drop("_base")
    )


def host_edges(links: DataFrame) -> DataFrame:
    """Distinct cross-host (src, dst) edges from ``extract_links``
    output — the input shape ``graph.pagerank`` expects. One distinct
    (= one exchange on the edge key); self-links dropped."""
    return (
        links.filter(F.col("src_host") != F.col("dst_host"))
        .select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
        .distinct()
    )


_ANCHOR_RE = '<a\\\\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>'


def extract_anchor_texts(pages: DataFrame, url_col: str = "url",
                         html_col: str = "html") -> DataFrame:
    """(url, html) → (src_url, href, dst_host, anchor) per anchor whose
    TEXT is a plain run (no nested tags) and whose href is an absolute
    http(s) URL — the anchor-text signal retrieval pipelines aggregate
    per target page/host (public practice since anchor-text indexing in
    early web search; used today to mine query→document training
    pairs).

    Same zero-exchange projection + Generate shape as ``extract_links``
    (plan-pinned): the two capture groups come from two
    ``regexp_extract_all`` calls over the SAME pattern, positionally
    aligned by ``arrays_zip`` — the DuckDB twin aligns the same two
    calls with parallel ``unnest``.
    """
    pair = F.explode(
        F.arrays_zip(
            F.expr(f"regexp_extract_all({html_col}, '{_ANCHOR_RE}', 1)").alias("href"),
            F.expr(f"regexp_extract_all({html_col}, '{_ANCHOR_RE}', 2)").alias("anchor"),
        )
    ).alias("p")
    return (
        pages.select(F.col(url_col).alias("src_url"), pair)
        .select(
            "src_url",
            F.col("p.href").alias("href"),
            F.col("p.anchor").alias("anchor"),
        )
        .filter(F.col("href").rlike(r"^https?://"))
        .withColumn(
            "dst_host", F.regexp_extract("href", r"^https?://([^/:?#]+)", 1)
        )
    )


def anchor_retrieval_pairs(anchors: DataFrame,
                           min_src_hosts: int = 2) -> DataFrame:
    """Mine (query-term, target-host) weak-relevance pairs from
    CROSS-HOST anchor text — the classic anchor-text supervision signal
    (public practice since early web search; used today to build
    query→document training pairs for retrieval models): when several
    independent sites link to a host with anchors containing a term,
    that term is a query the host is relevant to.

    Input is ``extract_anchor_texts`` output. Same-host anchors are
    excluded (site navigation says nothing about external relevance),
    and a pair must be supported by ≥ ``min_src_hosts`` DISTINCT
    source hosts — one site repeating an anchor a thousand times is one
    vote, which is the standard anti-spam gate for this signal.

    Output: (term, dst_host, n_mentions, n_src_hosts) — ``n_mentions``
    counts term occurrences across qualifying anchors, ``n_src_hosts``
    the distinct supporting sources.

    Scale shape: tokenize-and-explode projection, then ONE
    map-side-combined aggregation on (term, dst_host); the distinct
    source count is Spark's standard two-level count-distinct
    expansion (partial on (term, dst, src) first), so Zipf-head terms
    are skewed AGG keys — collapsed map-side, never a window
    partition. No joins, no all-pairs anything."""
    from ..functions.textstats import tokens

    t = (
        anchors.withColumn(
            "src_host",
            F.regexp_extract(
                "src_url", r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1
            ),
        )
        .filter(F.col("src_host") != F.col("dst_host"))
        .select(
            "src_host", "dst_host",
            F.explode(tokens(F.col("anchor"))).alias("term"),
        )
    )
    return (
        t.groupBy("term", "dst_host")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.countDistinct("src_host").alias("n_src_hosts"),
        )
        .filter(F.col("n_src_hosts") >= min_src_hosts)
    )


def host_anchor_profile(anchors: DataFrame, k: int = 8) -> DataFrame:
    """Per-target-host anchor-term profile: the ``k`` most frequent
    anchor tokens per ``dst_host`` (ties broken by term), with exact
    counts. Term counting is a map-side-combined groupBy; the per-host
    top-k uses the salted tournament (``topk_per_key`` on the ranked
    tuple), so a host receiving links from half the web never becomes
    one window task."""
    from ..functions.freq import topk_per_key
    from ..functions.textstats import tokens

    counts = (
        anchors.select(
            "dst_host", F.explode(tokens(F.col("anchor"))).alias("term")
        )
        .groupBy("dst_host", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # rank by (-n, term): encode as a single orderable string so the
    # tournament's order column is unique within a host
    ranked = counts.withColumn(
        "_ord",
        F.concat(
            F.lpad((F.lit(10**9) - F.col("n")).cast("string"), 10, "0"),
            F.lit("|"),
            F.col("term"),
        ),
    )
    out = topk_per_key(ranked, "dst_host", "_ord", k)
    w = Window.partitionBy("dst_host").orderBy("_ord")
    return (
        out.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("dst_host", "term", "n", "rank")
    )


def parse_sitemaps(sitemaps: DataFrame, host_col: str = "host",
                   xml_col: str = "sitemap_xml") -> DataFrame:
    """Sitemap parsing (sitemaps.org protocol, public spec): each
    ``<url>`` entry of a urlset and each ``<sitemap>`` entry of a
    sitemapindex becomes a row (host, kind, loc, lastmod) — ``kind``
    is ``'url'`` or ``'sitemap'`` so the crawl frontier can enqueue
    page fetches and child-sitemap fetches from one pass. ``loc`` is
    whitespace-trimmed per the spec; absent ``<lastmod>`` → NULL.

    Scope (documented): the two entry kinds' ``<loc>``/``<lastmod>``
    children; other optional tags (changefreq, priority) and XML
    namespaces/CDATA are ignored — corpus-side frontier building only
    needs locations and staleness.

    Scale shape: same zero-exchange projection + Generate as
    ``extract_links`` — entry blocks via non-greedy
    ``regexp_extract_all`` (RE2-safe), fields via ``regexp_extract``
    on the exploded block. A sitemap file is ≤ 50k entries by spec,
    so the per-row fan-out is bounded.
    """
    def _entries(tag: str, kind: str) -> DataFrame:
        block = F.explode(
            F.expr(
                f"regexp_extract_all({xml_col},"
                f" '<{tag}>([\\\\s\\\\S]*?)</{tag}>', 1)"
            )
        ).alias("block")
        return (
            sitemaps.select(F.col(host_col).alias("host"), block)
            .select(
                "host",
                F.lit(kind).alias("kind"),
                F.regexp_extract("block", r"<loc>\s*([^<]*?)\s*</loc>", 1).alias("loc"),
                F.nullif(
                    F.regexp_extract(
                        "block", r"<lastmod>\s*([^<]*?)\s*</lastmod>", 1
                    ),
                    F.lit(""),
                ).alias("lastmod"),
            )
            .filter(F.col("loc") != "")
        )

    return _entries("url", "url").unionAll(_entries("sitemap", "sitemap"))


def resolve_redirect_chains(
    redirects: DataFrame,
    rounds: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Resolve HTTP redirect chains to their final landing URL:
    (src, dst) one-hop redirect observations → one row per redirecting
    URL (url, final_url, n_hops, resolved). The canonical-URL pass a
    crawl corpus needs before any URL-keyed dedup or frontier
    scheduling: a 301/302/meta-refresh chain means the crawler stored
    the SAME page under several URLs, and authority/dedup signals must
    key on the chain's end, not its hops.

    Semantics (documented): the map is made a FUNCTION first — multiple
    observed targets for one source (re-crawls that disagree) collapse
    to ``min(dst)``, self-redirects are dropped. A URL resolves when
    its chain reaches a non-redirecting URL within ``2**rounds`` hops;
    ``n_hops`` is the exact chain length. Chains still inside the map
    after that many hops are redirect LOOPS (or over-long chains —
    browsers cap at ~20 hops and treat both the same): ``resolved`` is
    false and ``final_url``/``n_hops`` are NULL, mirroring the fetch
    error a real client reports.

    Scale shape — POINTER DOUBLING, not a sequential walk: the state
    table ``P(u) = (nxt, hops)`` starts as the one-hop map and each
    round composes with ITSELF (``P∘P``, one url-keyed equi-join +
    coalesce), so covered depth doubles per round: ``rounds`` = 5
    resolves 32-hop chains in 5 joins where the naive walk needs 32.
    Each round is one equi-join between node-keyed tables (AQE skew
    handling covers a Zipf-head redirect target, e.g. every page of a
    dead site 301-ing to one parking page), ``localCheckpoint`` keeps
    the plan flat (the ``graph.pagerank`` loop discipline), and the
    terminal test is one final left join against the state table's own
    key set — no collect, no window anywhere."""
    m = (
        redirects.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src")
        .agg(F.min("dst").alias("dst"))
    )
    p = m.select(
        F.col("src").alias("url"),
        F.col("dst").alias("nxt"),
        F.lit(1).cast("long").alias("hops"),
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        step = p.select(
            F.col("url").alias("_u"),
            F.col("nxt").alias("_n"),
            F.col("hops").alias("_h"),
        )
        p = (
            p.join(step, p["nxt"] == step["_u"], "left")
            .select(
                "url",
                F.coalesce("_n", "nxt").alias("nxt"),
                (F.col("hops") + F.coalesce("_h", F.lit(0))).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
    redirecting = p.select(F.col("url").alias("nxt"), F.lit(True).alias("_loops"))
    return (
        p.join(redirecting, "nxt", "left")
        .select(
            "url",
            F.when(F.col("_loops").isNull(), F.col("nxt")).alias("final_url"),
            F.when(F.col("_loops").isNull(), F.col("hops")).alias("n_hops"),
            F.col("_loops").isNull().alias("resolved"),
        )
    )


def url_path_templates(pages: DataFrame, url_col: str = "url",
                       min_urls: int = 2) -> DataFrame:
    """Collapse URLs into per-host PATH TEMPLATES: runs of ≥8 hex
    chars become ``{H}`` (content hashes, session ids), digit runs
    become ``{N}`` (ids, page numbers, dates) →
    (host, template, n_urls, example_url). The crawl-ops census
    behind trap detection (a template with millions of instances —
    calendars, faceted search — is a crawler trap to cap), URL-space
    dedup (mirror families share templates), and frontier budgeting
    at template granularity rather than raw-URL granularity.

    ``example_url`` is the MIN url of the template — deterministic, so
    the row is oracle-exact. Templates below ``min_urls`` are noise
    (every URL is trivially its own template) and are dropped.

    Scale shape: pure projection (two RE2-safe regexp_replace passes,
    JVM codegen) then ONE map-side-combined aggregation on (host,
    template) — the Zipf-head template is a skewed AGG key, collapsed
    map-side. No windows, no joins."""
    host = F.regexp_extract(
        F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1
    )
    path = F.coalesce(
        F.nullif(
            F.regexp_extract(
                F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/]+(/[^#?]*)", 1
            ),
            F.lit(""),
        ),
        F.lit("/"),
    )
    template = F.regexp_replace(
        F.regexp_replace(path, r"[0-9a-f]{8,}", "{H}"), r"[0-9]+", "{N}"
    )
    return (
        pages.select(
            host.alias("host"),
            template.alias("template"),
            F.col(url_col).alias("url"),
        )
        .groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.min("url").alias("example_url"),
        )
        .filter(F.col("n_urls") >= min_urls)
    )


def extract_canonical(pages: DataFrame, url_col: str = "url",
                      html_col: str = "html") -> DataFrame:
    """(url, html) → (url, canonical, is_self): the page's declared
    ``<link rel="canonical">`` target, resolved against the page URL.

    The cheapest exact-dup signal a crawl carries: mirror/alias pages
    (tracking-parameter variants, m.-subdomain twins, pagination roots)
    DECLARE their primary themselves, so grouping by the resolved
    canonical collapses alias families with zero content comparison —
    the step public CC pipelines run before any fingerprint dedup.
    Reference scope note: the reference never sees URLs (file inputs,
    ``core/pdf_processor.py``); this belongs to the web-corpus
    extension alongside ``extract_links`` (same file, same shape).

    Both attribute orders are matched (``rel`` before or after
    ``href``); the FIRST declaration wins (regexp_extract = leftmost
    match, matching browser behavior); pages without one emit
    canonical = NULL. Relative targets resolve through
    ``urlnorm.resolve_href``'s full RFC 3986 §5 chain. ``is_self``
    marks pages already canonical (string-exact after resolution).

    Scale shape: pure projection — two RE2-safe regexp_extracts, the
    resolution CASE chain, zero exchanges (plan-pinned); grouping by
    the canonical target is the caller's aggregation.
    """
    from intelligent_ocr_spark.functions.urlnorm import resolve_href

    h = F.col(html_col)
    raw = F.coalesce(
        F.nullif(
            F.regexp_extract(
                h, '<link\\s[^>]*rel="canonical"[^>]*href="([^"]*)"', 1
            ),
            F.lit(""),
        ),
        F.nullif(
            F.regexp_extract(
                h, '<link\\s[^>]*href="([^"]*)"[^>]*rel="canonical"', 1
            ),
            F.lit(""),
        ),
    )
    resolved = resolve_href(F.col(url_col), raw)
    return pages.select(
        F.col(url_col).alias("url"),
        resolved.alias("canonical"),
        F.when(resolved.isNull(), F.lit(None).cast("boolean"))
        .otherwise(resolved == F.col(url_col))
        .alias("is_self"),
    )


def canonical_alias_groups(pages: DataFrame, url_col: str = "url",
                           html_col: str = "html",
                           min_claimers: int = 2) -> DataFrame:
    """Alias families by declared canonical: one row per canonical
    target claimed by ≥ ``min_claimers`` pages — (canonical,
    n_claimers, n_aliases, sample_alias). ``n_aliases`` counts
    non-self claimers (the rows a dedup pass would drop in favor of
    the canonical); ``sample_alias`` is the min alias URL for stable
    audit output. One map-side-combined exchange on the canonical key."""
    c = extract_canonical(pages, url_col, html_col).filter(
        F.col("canonical").isNotNull()
    )
    return (
        c.groupBy("canonical")
        .agg(
            F.count(F.lit(1)).alias("n_claimers"),
            F.sum(F.when(~F.col("is_self"), 1).otherwise(0)).alias("n_aliases"),
            F.min(F.when(~F.col("is_self"), F.col("url"))).alias("sample_alias"),
        )
        .filter(F.col("n_claimers") >= min_claimers)
    )
