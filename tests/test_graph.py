"""Integer-exact PageRank (operators/graph.py): known answers, a
pure-Python differential replay, and the partitioning-invariance
property the integer-units design exists for."""

import pytest

from intelligent_ocr_spark.operators.graph import pagerank

SCALE = 10**9
BASE = (15 * SCALE) // 100


def _py_pagerank(edges, n_iter=5, num=85, den=100, scale=SCALE):
    """Reference replay of the exact integer semantics."""
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    deg = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    r = {n: scale for n in nodes}
    base = ((den - num) * scale) // den
    for _ in range(n_iter):
        contrib = dict.fromkeys(nodes, 0)
        for s, d in e:
            contrib[d] += r[s] // deg[s]
        r = {n: base + (num * contrib[n]) // den for n in nodes}
    return r


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.rank_scaled for r in pagerank(df, **kw).collect()}


def test_two_cycle_is_stationary(spark):
    # A<->B: each node receives exactly its own emitted rank back, so
    # rank stays at scale forever: 0.15e9 + 0.85e9 = 1e9
    got = _run(spark, [(0, 1), (1, 0)], n_iter=3)
    assert got == {0: SCALE, 1: SCALE}


def test_chain_and_dangling_leak(spark):
    # A -> B, B dangling: A never receives, B receives A's share
    got = _run(spark, [(0, 1)], n_iter=2)
    # iter1: r_A = base; r_B = base + 85% * scale
    # iter2: r_B = base + 85% * r_A(iter1)
    assert got[0] == BASE
    assert got[1] == BASE + (85 * BASE) // 100


def test_self_loops_and_dup_edges_ignored(spark):
    got = _run(spark, [(0, 1), (0, 1), (1, 0), (7, 7)], n_iter=2)
    assert got == {0: SCALE, 1: SCALE}  # node 7 only self-loops: no row


def test_differential_vs_python_replay(spark):
    edges = [(i % 13, (i * 7 + 3) % 13) for i in range(60)] + [
        (i % 13, (i * 11 + 5) % 13) for i in range(60)
    ]
    want = _py_pagerank(edges, n_iter=5)
    got = _run(spark, edges, n_iter=5)
    assert got == want


@pytest.mark.parametrize("parts", [1, 7])
def test_partitioning_invariance(spark, parts):
    edges = [(i % 9, (i * 5 + 2) % 9) for i in range(40)]
    df = spark.createDataFrame(edges, "src long, dst long").repartition(parts)
    got = {r.node: r.rank_scaled for r in pagerank(df, n_iter=4).collect()}
    assert got == _py_pagerank(edges, n_iter=4)


def test_cocitation_pairs_basic(spark):
    from intelligent_ocr_spark.operators.graph import cocitation_pairs

    edges = spark.createDataFrame(
        [("s1", "a"), ("s1", "b"), ("s1", "c"),
         ("s2", "a"), ("s2", "b"),
         ("s3", "b"), ("s3", "b"),          # duplicate edge collapses
         ("s4", "s4")],                     # self-loop dropped
        "src string, dst string",
    )
    got = sorted(map(tuple, cocitation_pairs(edges).collect()))
    assert got == [("a", "b", 2), ("a", "c", 1), ("b", "c", 1)]


def test_cocitation_hub_cap_and_coupling(spark):
    from intelligent_ocr_spark.operators.graph import cocitation_pairs

    rows = [("hub", f"n{i}") for i in range(10)] + [
        ("s1", "x"), ("s1", "y"),
        ("a", "t"), ("b", "t"), ("c", "t"),
    ]
    edges = spark.createDataFrame(rows, "src string, dst string")
    # hub excluded at max_degree=8: none of its n0..n9 pairs appear
    got = sorted(map(tuple, cocitation_pairs(edges, max_degree=8).collect()))
    assert got == [("x", "y", 1)]
    # coupling: sources sharing a target
    coup = sorted(map(tuple, cocitation_pairs(edges, by="dst").collect()))
    assert ("a", "b", 1) in coup and ("a", "c", 1) in coup and ("b", "c", 1) in coup


def test_trustrank_all_seeds_equals_pagerank(spark):
    """seeds = every node must reproduce global PageRank exactly."""
    from intelligent_ocr_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i % 7, (i * 3 + 1) % 7) for i in range(25)], "src long, dst long"
    )
    allnodes = edges.selectExpr("src as node").union(
        edges.selectExpr("dst as node")
    ).distinct()
    a = sorted(map(tuple, pagerank(edges, n_iter=4).collect()))
    b = sorted(map(tuple, pagerank(edges, n_iter=4, seeds=allnodes).collect()))
    assert a == b


def test_trustrank_seed_restart_only(spark):
    """Restart mass lands on seeds only: a node with no in-links and
    not in the seed set holds rank 0; a seed with no in-links holds
    exactly the base term after the first iteration."""
    from pyspark.sql import functions as F

    from intelligent_ocr_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("seed", "mid"), ("mid", "leaf"), ("spam", "leaf")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("seed",)], "node string")
    got = {r.node: r.rank_scaled for r in pagerank(edges, n_iter=3, seeds=seeds).collect()}
    base = (15 * 10**9) // 100
    assert got["spam"] == 0
    assert got["seed"] == base
    # mid receives only seed's damped share: d*(base after it.1 = scale)
    # replay the integer arithmetic by hand for 3 iterations
    r = {"seed": 10**9, "mid": 0, "leaf": 0, "spam": 0}
    for _ in range(3):
        share = {n: r[n] // 1 for n in r}  # out_deg is 1 for all srcs
        nxt = {
            "seed": base,
            "mid": 85 * share["seed"] // 100,
            "leaf": (85 * (share["mid"] + share["spam"])) // 100,
            "spam": 0,
        }
        r = nxt
    assert got == r


def test_label_propagation_semantics(spark):
    """Seeds immutable; majority wins; ties break to the smaller label;
    unreached nodes stay NULL; deterministic under repartitioning."""
    from intelligent_ocr_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [("a", "m"), ("b", "m"), ("c", "m"),   # m: 2×L0 vs 1×L1 → L0
         ("a", "t"), ("c", "t"),               # t: 1×L0 vs 1×L1 → tie → L0
         ("m", "far"), ("far", "unreach3")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame(
        [("a", "L0"), ("b", "L0"), ("c", "L1")], "node string, label string"
    )
    got = {r.node: r.label for r in label_propagation(edges, seeds, n_iter=2).collect()}
    assert got["m"] == "L0" and got["t"] == "L0"
    assert got["a"] == "L0" and got["c"] == "L1"   # seeds keep labels
    assert got["far"] == "L0"                       # 2 hops in 2 iters
    assert got["unreach3"] is None                  # needs a 3rd round
    b = {r.node: r.label for r in
         label_propagation(edges.repartition(7), seeds, n_iter=2).collect()}
    assert got == b


# ---------------------------------------------------------------- HITS


def _py_hits(edges, n_iter=3):
    """Reference replay of the exact unnormalized integer semantics."""
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    hub = dict.fromkeys(nodes, 1)
    auth = dict.fromkeys(nodes, 0)
    for _ in range(n_iter):
        auth = dict.fromkeys(nodes, 0)
        for s, d in e:
            auth[d] += hub[s]
        hub = dict.fromkeys(nodes, 0)
        for s, d in e:
            hub[s] += auth[d]
    return hub, auth


def _run_hits(spark, edges, **kw):
    from intelligent_ocr_spark.operators.graph import hits

    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r.node: (int(r.hub), int(r.auth)) for r in hits(df, **kw).collect()
    }


def test_hits_one_iteration_by_hand(spark):
    # 0->2, 1->2, 2->3: auth counts in-pointing hubs, hub sums new auths
    got = _run_hits(spark, [("0", "2"), ("1", "2"), ("2", "3")], n_iter=1)
    assert got == {
        "0": (2, 0),  # hub = auth(2) = 2
        "1": (2, 0),
        "2": (1, 2),  # auth = hub0(0)+hub0(1) = 2; hub = auth(3) = 1
        "3": (0, 1),
    }


def test_hits_separates_hub_and_authority_roles(spark):
    # directory d links to a, b, c; nothing links to d
    got = _run_hits(spark, [("d", "a"), ("d", "b"), ("d", "c")], n_iter=3)
    assert got["d"][1] == 0 and got["d"][0] > 0          # pure hub
    assert all(got[n][0] == 0 and got[n][1] > 0 for n in "abc")  # pure auth


def test_hits_dup_edges_and_self_loops_ignored(spark):
    got = _run_hits(
        spark, [("a", "b"), ("a", "b"), ("x", "x"), ("b", "a")], n_iter=2
    )
    hub, auth = _py_hits([("a", "b"), ("b", "a")], n_iter=2)
    assert got == {n: (hub[n], auth[n]) for n in hub}
    assert "x" not in got


def test_hits_differential_vs_python_replay(spark):
    edges = [(f"n{i % 11}", f"n{(i * 7 + 3) % 11}") for i in range(50)] + [
        (f"n{i % 11}", f"n{(i * 5 + 1) % 11}") for i in range(50)
    ]
    hub, auth = _py_hits(edges, n_iter=4)
    got = _run_hits(spark, edges, n_iter=4)
    assert got == {n: (hub[n], auth[n]) for n in hub}


def test_hits_partitioning_invariance(spark):
    from intelligent_ocr_spark.operators.graph import hits

    edges = [(f"h{i % 9}", f"h{(i * 5 + 2) % 9}") for i in range(40)]
    hub, auth = _py_hits(edges, n_iter=3)
    df = spark.createDataFrame(edges, "src string, dst string").repartition(7)
    got = {r.node: (int(r.hub), int(r.auth)) for r in hits(df, n_iter=3).collect()}
    assert got == {n: (hub[n], auth[n]) for n in hub}


def test_reciprocity_known_answers(spark):
    """Mutual edges count as reciprocal on both endpoints; one-way
    edges don't; duplicates collapse; self-loops drop; micro ratio is
    exact floor division."""
    from intelligent_ocr_spark.operators.graph import reciprocity

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"),          # mutual pair
            ("a", "c"),                      # one-way
            ("a", "c"),                      # duplicate: collapses
            ("c", "d"), ("d", "c"),          # second mutual pair
            ("a", "e"),
            ("e", "e"),                      # self-loop: dropped
        ],
        "src string, dst string",
    )
    got = {
        r.node: (r.n_out, r.n_reciprocal, r.reciprocity_micro)
        for r in reciprocity(edges).collect()
    }
    assert got == {
        "a": (3, 1, 333333),     # b/c/e out, only b reciprocates
        "b": (1, 1, 1000000),
        "c": (1, 1, 1000000),    # c->d mutual; a->c doesn't add out for c
        "d": (1, 1, 1000000),
    }
    # 'e' has no out-edges after the self-loop drop: no row
    assert "e" not in got
