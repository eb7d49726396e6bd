"""Link-graph analytics: integer-exact PageRank over a (src, dst)
edge table — the domain-authority signal a web-corpus pipeline uses
for source weighting and crawl prioritization (alongside the per-domain
caps and robots gates in ``prep.py``/``web.py``).

Floating-point PageRank is merge-order-dependent: a tree-reduced
float sum differs in the last ulp between partitionings, which breaks
exact cross-engine oracles and retry determinism. This implementation
works entirely in scaled int64 ("nano-rank" units, the same
integer-units trick as ``textstats.source_kl_drift``):

* ranks start at ``scale`` (default 1e9) per node;
* each iteration, a node's share is ``rank div out_degree`` (integer
  division), its new rank ``((den-num)·scale) div den + (num·Σ
  in-shares) div den`` with damping ``num/den`` (default 85/100);
* dangling nodes (no out-edges) contribute nothing — their mass leaks,
  the standard simplification, implemented identically in the DuckDB
  oracle so the driver check stays bit-exact.

Everything is int64 arithmetic over sums of int64, so the result is
independent of partitioning, task order and merge shape — pinned by a
partitioning-invariance test.

Scale shape (the iterative-loop pattern shared with
``dedup.near_dup_clusters`` and ``bpe.bpe_train``): the edge set joins
its out-degree ONCE up front and is ``localCheckpoint``-ed; each
iteration is then one equi-join on ``src`` (ranks are node-keyed, AQE
reuses the partitioning) plus one ``dst``-keyed aggregation with
map-side combine, and a left join back to the node list. A Zipf-head
domain (everyone links to it) is a skewed AGG key, not a window — the
partial aggregation collapses it map-side, and AQE's skew handling
covers the join. ``n_iter`` is a fixed small constant (rank converges
geometrically at the damping rate), so the driver loop holds no data,
only the loop counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "pagerank",
    "hits",
    "cocitation_pairs",
    "label_propagation",
    "reciprocity",
]


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**9,
    src_col: str = "src",
    dst_col: str = "dst",
    seeds: DataFrame | None = None,
) -> DataFrame:
    """(src, dst) edges → (node, rank_scaled) after ``n_iter`` exact
    integer power iterations. Edges are deduplicated and self-loops
    dropped; every node appearing on either side gets a row.

    ``seeds`` (a one-column ``node`` DataFrame) switches to
    PERSONALIZED PageRank — TrustRank (Gyöngyi et al. 2004, public):
    the restart mass lands only on seed nodes (initial rank ``scale``
    on seeds, 0 elsewhere; per iteration the ``(1-d)·scale`` base term
    applies to seeds only), so authority flows outward from a trusted
    set — the structural spam/quality signal web pipelines compute
    next to global PageRank. The seed flag is joined ONCE into the
    checkpointed node list (broadcast — seed lists are small), so the
    iteration plan is unchanged: join + map-side-combined agg + left
    join, all integer arithmetic."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if seeds is not None:
        seed_flag = seeds.select(
            F.col("node"), F.lit(True).alias("_is_seed")
        ).distinct()
        nodes = nodes.join(F.broadcast(seed_flag), "node", "left").select(
            "node", F.coalesce("_is_seed", F.lit(False)).alias("is_seed")
        )
    else:
        nodes = nodes.select("node", F.lit(True).alias("is_seed"))
    nodes = nodes.localCheckpoint(eager=True)
    base = ((damping_den - damping_num) * scale) // damping_den
    ranks = nodes.select(
        "node",
        F.when(F.col("is_seed"), F.lit(scale)).otherwise(F.lit(0))
        .cast("long")
        .alias("r"),
    )
    for _ in range(n_iter):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(F.col("dst"), F.expr("r div out_deg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.when(F.col("is_seed"), F.lit(base)).otherwise(F.lit(0))
                    + F.expr(
                        f"({damping_num} * coalesce(s, CAST(0 AS BIGINT)))"
                        f" div {damping_den}"
                    )
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def hits(
    edges: DataFrame,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999, public) over a
    (src, dst) edge table → (node, hub, auth) after ``n_iter`` exact
    integer mutual-reinforcement iterations — the second classic link
    signal next to PageRank: ``auth`` finds the pages good hubs point
    AT (content authorities), ``hub`` the pages that point at good
    authorities (directories/link farms), and the pair separates the
    two roles a single PageRank score conflates.

    INTEGER EXACTNESS over normalization: the textbook algorithm
    L2-normalizes each round, which makes every score a
    merge-order-dependent float. Per round the normalizer is a single
    positive scalar, so the UNNORMALIZED iterate is the normalized one
    times a constant — identical ranking, identical ratios — and
    staying in integers keeps the result independent of partitioning
    and bit-exact against the DuckDB oracle (the ``pagerank`` design
    constraint). Scores start at ``hub = 1``; each round
    ``auth(v) = Σ_{u→v} hub(u)`` then ``hub(u) = Σ_{u→v} auth(v)``.
    Growth is geometric in the principal eigenvalue of AᵀA, so values
    are computed in ``decimal(38,0)`` (int128 range, DuckDB HUGEINT);
    with host-graph degrees that bounds safe ``n_iter`` at ≥ 4 — the
    signal consumes rank order, and rank stabilizes in 3-5 rounds.

    Scale shape: identical to ``pagerank``'s loop — the deduped edge
    set is ``localCheckpoint``-ed once; each round is two equi-joins
    against node-keyed score tables plus two map-side-combined
    aggregations (hot authorities are skewed AGG keys, never window
    partitions), and a left join back to the node list for zero fill.
    The driver loop holds only the counter."""
    zero = F.lit(0).cast("decimal(38,0)")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hub = nodes.select("node", F.lit(1).cast("decimal(38,0)").alias("hub"))
    auth = nodes.select("node", zero.alias("auth"))
    for _ in range(n_iter):
        a = (
            e.join(hub, e["src"] == hub["node"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("a"))
        )
        auth = (
            nodes.join(a, nodes["node"] == a["dst"], "left")
            .select("node", F.coalesce("a", zero).alias("auth"))
            .localCheckpoint(eager=True)
        )
        h = (
            e.join(auth, e["dst"] == auth["node"])
            .groupBy("src")
            .agg(F.sum("auth").alias("h"))
        )
        hub = (
            nodes.join(h, nodes["node"] == h["src"], "left")
            .select("node", F.coalesce("h", zero).alias("hub"))
            .localCheckpoint(eager=True)
        )
    return hub.join(auth, "node").select("node", "hub", "auth")


def cocitation_pairs(
    edges: DataFrame,
    by: str = "src",
    max_degree: int = 64,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Co-citation similarity: pairs of nodes linked FROM the same
    pivot (``by='src'`` — classic co-citation of link targets) or
    linking TO the same pivot (``by='dst'`` — bibliographic coupling
    of link sources), with the exact count of shared pivots. The
    host-similarity signal web pipelines derive from pure structure
    (no content), e.g. to find mirror families or topical clusters.

    Scale shape: the pair join fans out quadratically in the pivot's
    degree, so pivots above ``max_degree`` are EXCLUDED first (the
    stop-shingle / doc-freq cap idiom from ``dedup.ngram_jaccard`` —
    a hub linking to everything asserts nothing about its targets'
    similarity, exactly like "the" asserts nothing about documents).
    Degree comes from one map-side-combined groupBy; the cap join is
    a broadcast of the (tiny) over-cap pivot list; the self-join is an
    equi-join on the pivot with ``a < b`` ordering so each unordered
    pair appears once; the final count is one pair-keyed aggregation.
    Output: (node_a, node_b, n_common) — node_a < node_b.
    """
    if by not in ("src", "dst"):
        raise ValueError("by must be 'src' or 'dst'")
    pivot, other = (src_col, dst_col) if by == "src" else (dst_col, src_col)
    e = (
        edges.select(F.col(pivot).alias("pivot"), F.col(other).alias("node"))
        .filter(F.col("pivot") != F.col("node"))
        .distinct()
    )
    deg = e.groupBy("pivot").agg(F.count(F.lit(1)).alias("d"))
    hot = deg.filter(F.col("d") > max_degree).select("pivot")
    kept = e.join(F.broadcast(hot), "pivot", "left_anti")
    a = kept.select("pivot", F.col("node").alias("node_a"))
    b = kept.select("pivot", F.col("node").alias("node_b"))
    return (
        a.join(b, "pivot")
        .filter(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )


def reciprocity(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node link reciprocity over a (src, dst) edge table →
    (node, n_out, n_reciprocal, reciprocity_micro). The classic
    link-exchange signal next to PageRank/TrustRank: organic linking
    is largely one-directional (a blog cites a reference site; the
    reference site does not cite back), while paid link exchanges and
    mutual-admiration farms produce hosts whose out-links are mostly
    reciprocated — a high ``n_reciprocal/n_out`` ratio on a
    non-trivial ``n_out`` is a standard spam-mass feature (Gyöngyi et
    al.'s link-spam literature, public).

    Exactness: counts are integers and the ratio is emitted in
    floor-micro-units (``n_reciprocal·10^6 div n_out``) — the repo's
    integer-ratio idiom, bit-stable across engines and partitionings.
    Edges are deduped and self-loops dropped first, so "reciprocal"
    means the DISTINCT reverse edge exists.

    Scale shape: one distinct on the edge key, then one LEFT SEMI
    self-join on the full (src, dst) = (dst, src) pair — both
    components in the key, so even a Zipf-head host's edge set spreads
    across the hash space (never a per-node key) — and two map-side-
    combined counts joined node-keyed. No windows, no collect."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    rec = e.join(rev, ["src", "dst"], "left_semi")
    n_out = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("n_out")
    )
    n_rec = rec.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("n_reciprocal")
    )
    return (
        n_out.join(n_rec, "node", "left")
        .select(
            "node",
            "n_out",
            F.coalesce("n_reciprocal", F.lit(0)).cast("long").alias(
                "n_reciprocal"
            ),
            F.expr(
                "coalesce(n_reciprocal, CAST(0 AS BIGINT)) * 1000000"
                " div n_out"
            ).alias("reciprocity_micro"),
        )
    )


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Semi-supervised host classification by label propagation: seed
    nodes carry fixed labels ((node, label) DataFrame); each round,
    every non-seed node adopts the most common label among its
    IN-neighbors' current labels, keeping its previous label when no
    labeled neighbor exists. The standard graph-propagation baseline
    for topic/language/spam host classification from a small curated
    seed list.

    DETERMINISM is the design constraint (retries, partitionings, and
    the DuckDB oracle must agree): votes are integer counts, and the
    winner is ``min_by(label, key)`` over an encoded sort key
    ``lpad(10^9 - votes) || label`` — most votes first, ties broken by
    the lexicographically smallest label. ``n_iter`` is a fixed small
    constant, so the driver loop holds no data.

    Scale shape per round: one equi-join of the edge table against the
    current label set (src-keyed), one map-side-combined (dst, label)
    count, one ``min_by`` argmax per node (group sizes are bounded by
    the label alphabet, never corpus-sized), and a coalesce join back
    to the node list. Same localCheckpoint discipline as ``pagerank``.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    seed = seeds.select("node", F.col("label").alias("seed_label")).distinct()
    nodes = nodes.join(F.broadcast(seed), "node", "left").localCheckpoint(
        eager=True
    )
    labels = nodes.select("node", F.col("seed_label").alias("label"))
    for _ in range(n_iter):
        votes = (
            e.join(
                labels.filter(F.col("label").isNotNull()),
                e["src"] == labels["node"],
            )
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        key = F.concat(
            F.lpad((F.lit(10**9) - F.col("n")).cast("string"), 10, "0"),
            F.col("label"),
        )
        winner = votes.groupBy("dst").agg(
            F.min_by(F.col("label"), key).alias("win_label")
        )
        labels = (
            nodes.join(winner, nodes["node"] == winner["dst"], "left")
            .join(
                labels.select(
                    F.col("node").alias("pnode"), F.col("label").alias("prev")
                ),
                F.col("node") == F.col("pnode"),
                "left",
            )
            .select(
                "node",
                F.coalesce("seed_label", "win_label", "prev").alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return labels
