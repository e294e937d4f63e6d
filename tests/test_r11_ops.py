"""Round-11 operator tests: in-loop release of dead iterative
generations (VERDICT r10 ask #3), lineage truncation on deep walks,
and the eager-cleanup default for the r10 corpus pins (ADVICE r10).
"""

from __future__ import annotations

import pytest


def _n_cache_entries(spark) -> int:
    """Live cache-manager entries (the .cache()/persist() pins — the
    storage-tab signal, minus GC-managed localCheckpoint blocks)."""
    return spark._jsparkSession.sharedState().cacheManager().numCachedEntries()


# ------------------------------------------ in-loop dead-generation release


def test_bfs_hops_releases_dead_frontiers_in_loop(spark):
    """VERDICT r10 ask #3: on a deep path graph the per-round storage
    footprint stays bounded — at each round's start only the
    adjacency, the current visited set, and the current frontier hold
    cached blocks (frontier h−1 is unpersisted once round h's visited
    materializes). Before the fix, every round's frontier stayed
    pinned to function exit (2h+1 frames by round h)."""
    from transe_pyspark_spark.operators import graph

    spark.catalog.clearCache()
    path = [(i, i + 1) for i in range(10)]  # 0-1-...-10
    edges = spark.createDataFrame(path, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")

    observed = []
    real = graph._bfs_frontier

    def spy(adj, frontier, visited, h):
        observed.append(_n_cache_entries(spark))
        return real(adj, frontier, visited, h)

    graph._bfs_frontier = spy
    try:
        got = {r["node"]: r["hops"] for r in graph.bfs_hops(edges, seeds, 7).collect()}
    finally:
        graph._bfs_frontier = real
    assert got == {i: i for i in range(8)}  # hops = index, bounded at 7
    assert len(observed) == 7
    # round 1 sees adj + seeds(=visited=frontier) = 2; later rounds
    # adj + visited + frontier = 3 (after the cadence lineage
    # truncation the frontier is a filter view of visited, so 2) —
    # never the accumulating 2h+1
    assert max(observed) <= 3, f"dead frontiers left pinned: {observed}"
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "bfs_hops exited with cache-manager entries pinned"
    )


def test_sssp_rounds_releases_dead_rounds_in_loop(spark):
    """Same contract for the weighted loop: round r−1's relaxed frame
    is released once round r's materializes — mid-loop storage is the
    adjacency + one live round, not one frame per round."""
    from transe_pyspark_spark.operators import graph

    spark.catalog.clearCache()
    path = [(i, i + 1, 10 + i) for i in range(10)]
    edges = spark.createDataFrame(path, "src long, dst long, w long")
    seeds = spark.createDataFrame([(0,)], "node long")

    observed = []
    real = graph._sssp_relax

    def spy(adj, frontier, dist):
        observed.append(_n_cache_entries(spark))
        return real(adj, frontier, dist)

    graph._sssp_relax = spy
    try:
        got = {r["node"]: r["cost"] for r in graph.sssp_rounds(edges, seeds, 7).collect()}
    finally:
        graph._sssp_relax = real
    want = {0: 0}
    for i in range(7):
        want[i + 1] = want[i] + 10 + i
    assert got == want
    assert len(observed) == 7
    assert max(observed) <= 3, f"dead rounds left pinned: {observed}"
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "sssp_rounds exited with cache-manager entries pinned"
    )


def test_deep_walks_cross_lineage_checkpoint_boundary(spark):
    """Walks longer than _LINEAGE_CHECKPOINT_EVERY rounds cross the
    localCheckpoint truncation path; results are identical to the
    short-walk recurrences (the truncation is pure bookkeeping)."""
    from transe_pyspark_spark.operators.graph import (
        _LINEAGE_CHECKPOINT_EVERY,
        bfs_hops,
        sssp_rounds,
    )

    depth = _LINEAGE_CHECKPOINT_EVERY + 3
    path = [(i, i + 1) for i in range(depth + 2)]
    edges = spark.createDataFrame(path, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, depth).collect()}
    assert got == {i: i for i in range(depth + 1)}

    wedges = spark.createDataFrame(
        [(a, b, 7) for a, b in path], "src long, dst long, w long"
    )
    costs = {r["node"]: r["cost"] for r in sssp_rounds(wedges, seeds, depth).collect()}
    assert costs == {i: 7 * i for i in range(depth + 1)}
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


# ------------------------------------- pareto staircase distributed prefix


def test_pareto_frontier_continuous_x_matches_bruteforce(spark):
    """VERDICT r10 ask #2: with a CONTINUOUS x (every row its own x
    value — the per-x aggregate is corpus-sized) the staircase must
    still equal the quadratic NOT-EXISTS definition, including
    duplicate extremes and cross-partition staircase steps."""
    import random

    from transe_pyspark_spark.operators.relational import pareto_frontier_2d

    rng = random.Random(23)
    pts = [(i, rng.random() * 1000.0, rng.randrange(1000)) for i in range(500)]
    pts += [(9000, -1.0, 5), (9001, -1.0, 5)]  # duplicate extreme pair
    df = spark.createDataFrame(pts, "pid long, x double, y long")
    got = sorted(r.pid for r in pareto_frontier_2d(df, "x", "y").collect())
    want = sorted(
        p[0]
        for p in pts
        if not any(
            q[1] <= p[1] and q[2] <= p[2] and (q[1] < p[1] or q[2] < p[2])
            for q in pts
        )
    )
    assert got == want
    assert 9000 in got and 9001 in got


def test_pareto_plan_has_no_pidless_x_window(spark):
    """The staircase prefix-min must ride the distributed prefix:
    every window ordered on the x column also partitions on __pid — a
    pid-less x window funnels the (corpus-sized for continuous x)
    per-x aggregate through one task (the ks_statistic contract)."""
    from transe_pyspark_spark.operators.relational import pareto_frontier_2d

    df = spark.createDataFrame(
        [(i, float(i), (37 * i) % 11) for i in range(200)], "pid long, x double, y long"
    )
    plan = pareto_frontier_2d(df, "x", "y")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    bad = [
        line.strip()[:120]
        for line in plan.splitlines()
        if "windowspecdefinition(x#" in line and "__pid#" not in line
    ]
    assert not bad, bad


# --------------------------------------- eager-cleanup for r10 corpus pins


def test_r10_corpus_ops_default_eager_cleanup_releases_pins(spark):
    """ADVICE r10 (medium): bm25_scores / source_divergence /
    semantic_near_pairs with the library default leave the cache
    manager EMPTY after returning — repeated calls no longer
    accumulate corpus-sized pinned caches. Values match the lazy
    (plan-gate) form exactly."""
    import numpy as np

    from transe_pyspark_spark.functions.text import bm25_scores, source_divergence
    from transe_pyspark_spark.operators.similarity import semantic_near_pairs

    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [
            (1, "spark joins streams", "a"),
            (2, "joins joins windows", "a"),
            (3, "vector hash windows stream", "b"),
            (4, "totally unrelated prose", "b"),
        ],
        "doc_id long, text string, source string",
    )
    terms = ["joins", "stream"]
    eager = {r["doc_id"]: r for r in bm25_scores(docs, terms).collect()}
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "bm25_scores default left the tokenization pinned"
    )
    lazy_df = bm25_scores(docs, terms, eager_cleanup=False)
    lazy = {r["doc_id"]: r for r in lazy_df.collect()}
    assert not spark._jsparkSession.sharedState().cacheManager().isEmpty()
    spark.catalog.clearCache()
    assert {k: (v["n_matched_terms"], v["score"]) for k, v in eager.items()} == {
        k: (v["n_matched_terms"], v["score"]) for k, v in lazy.items()
    }

    sd = {r["source"]: r for r in source_divergence(docs).collect()}
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "source_divergence default left the (source, token) pin"
    )
    assert set(sd) == {"a", "b"} and all(r["entropy"] is not None for r in sd.values())

    rng = np.random.default_rng(3)
    base = rng.normal(size=8)
    rows = [(0, [float(x) for x in base]), (1, [float(x) for x in base * 2.0])] + [
        (i, [float(x) for x in rng.normal(size=8)]) for i in range(2, 40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = semantic_near_pairs(emb, threshold=0.99, n_cells=2, n_assign=2).collect()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "semantic_near_pairs default left the assignment pinned"
    )
    assert any((r["id_a"], r["id_b"]) == (0, 1) for r in pairs)
