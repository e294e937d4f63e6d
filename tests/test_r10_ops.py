"""Round-10 regression tests: bench fails loudly on dead sections
(VERDICT r09 ask #7) and the semantic-dedup assignment pin
(VERDICT r09 ask #6)."""

from __future__ import annotations

import sys

import pytest


# ------------------------------------------------- bench incomplete trailer


def _bench_module():
    sys.path.insert(0, "/root/repo")
    import bench

    return bench


def test_bench_exits_nonzero_on_sf1_section_error(capsys):
    """The r09 artifact memorialized `"sf1": {"error": ...}` and exited 0,
    so the aborted section went unnoticed for a whole round. A dead
    section must now print `# BENCH INCOMPLETE` and exit nonzero."""
    bench = _bench_module()
    with pytest.raises(SystemExit) as exc:
        bench._fail_if_incomplete({"error": "tuple.count() ..."}, {})
    assert exc.value.code == 1
    assert "# BENCH INCOMPLETE" in capsys.readouterr().err


def test_bench_exits_nonzero_on_corpus_pipeline_error(capsys):
    bench = _bench_module()
    with pytest.raises(SystemExit) as exc:
        bench._fail_if_incomplete(
            {"jaccard_prefix_near_pairs": 10.1, "corpus_pipeline_error": "boom"}, {}
        )
    assert exc.value.code == 1
    assert "corpus_pipeline_error" in capsys.readouterr().err


def test_bench_exits_nonzero_on_scale_path_error(capsys):
    bench = _bench_module()
    with pytest.raises(SystemExit) as exc:
        bench._fail_if_incomplete({}, {"transe_epoch_auto_error": "OOM"})
    assert exc.value.code == 1
    assert "transe_epoch_auto_error" in capsys.readouterr().err


def test_bench_complete_sections_do_not_exit():
    bench = _bench_module()
    # plain timing rows in every section: no exit, no trailer
    bench._fail_if_incomplete(
        {"jaccard_prefix_near_pairs": 10.1, "corpus_pipeline": 42.0},
        {"transe_epoch_auto": 6.15, "skew_join_aqe": 1.2},
    )


# ------------------------------------------- semantic-dedup assignment pin


def test_semantic_near_pairs_assignment_runs_once(spark):
    """VERDICT r09 advisory: the self-join of `binned` must read ONE
    pinned assignment subtree (repartition-on-cell + cache), not
    re-execute the Arrow kernel per join side. Structural check: the
    executed plan has exactly one MapInPandas node id and the join
    reads the cache on both sides (>=2 InMemoryTableScan ids)."""
    import re

    import numpy as np
    from pyspark.sql import functions as F

    from transe_pyspark_spark.operators.similarity import semantic_near_pairs

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, emb array<double>")
    pairs = semantic_near_pairs(df, id_col="id", vec_col="emb",
                                threshold=0.2, n_cells=4, n_assign=2)
    plan = pairs._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    n_mip = len(set(re.findall(r"\((\d+)\) MapInPandas", plan)))
    n_imts = len(set(re.findall(r"\((\d+)\) InMemoryTableScan", plan)))
    assert n_mip == 1, f"assignment kernel appears {n_mip}x in the plan"
    assert n_imts >= 2, "both join sides should read the pinned cache"
    # and the pin must not change results: pairs are still symmetric-free
    got = pairs.collect()
    assert all(r.id_a < r.id_b for r in got)


# --------------------------------------------------------------- bfs_hops


def test_bfs_hops_path_graph_distances_and_early_exit(spark):
    """A 0-1-2-3-4-5 path seeded at {0}: hops = node index, bounded at
    max_hops; with max_hops far beyond the diameter the frontier
    empties and the loop early-exits (same contract as kcore's
    converge mode). Node 99 is an isolated seed: distance 0, present
    even though it touches no edge."""
    from transe_pyspark_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (99,)], "node long")
    got = {r.node: r.hops for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got == {0: 0, 99: 0, 1: 1, 2: 2, 3: 3}
    full = {r.node: r.hops for r in bfs_hops(edges, seeds, max_hops=50).collect()}
    assert full == {0: 0, 99: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5}


def test_bfs_hops_multi_source_takes_min(spark):
    """Two seeds on a 6-cycle: every node's hops is the min over
    sources; undirected edges walk both ways."""
    from transe_pyspark_spark.operators.graph import bfs_hops

    n = 6
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (3,)], "node long")
    got = {r.node: r.hops for r in bfs_hops(edges, seeds, max_hops=10).collect()}
    assert got == {0: 0, 3: 0, 1: 1, 2: 1, 4: 1, 5: 1}


# ------------------------------------------------------- pareto_frontier_2d


def test_pareto_frontier_matches_bruteforce(spark):
    """Random integer points: the staircase plan must equal the
    quadratic NOT-EXISTS definition, including co-surviving exact
    duplicates (no strict inequality between equal points)."""
    import random

    from transe_pyspark_spark.operators.relational import pareto_frontier_2d

    rng = random.Random(17)
    pts = [(i, rng.randrange(20), rng.randrange(20)) for i in range(300)]
    pts += [(1000, 0, 0), (1001, 0, 0)]  # duplicate extreme pair: both survive
    df = spark.createDataFrame(pts, "pid long, x long, y long")
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
    assert 1000 in got and 1001 in got


# ---------------------------------------------------------------- bm25


def test_bm25_matches_python_model(spark):
    """Four tiny docs vs a hand-rolled BM25 (same Lucene idf variant):
    scores to 4 decimals, matched-term counts exact, non-matching doc
    absent."""
    import math

    from transe_pyspark_spark.functions.text import bm25_scores

    docs = [
        (1, "cat dog cat"),
        (2, "dog fish"),
        (3, "bird bird bird bird"),
        (4, "CAT, dog! cat cat"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    terms = ["cat", "dog"]
    toks = {d: [t for t in __import__("re").split(r"[^a-z0-9]+", txt.lower()) if t] for d, txt in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    k1, b = 1.2, 0.75
    want = {}
    for d, v in toks.items():
        score, m = 0.0, 0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            m += 1
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if m:
            want[d] = (m, round(score, 4))
    got = {r.doc_id: (r.n_matched_terms, r.score) for r in bm25_scores(df, terms).collect()}
    assert set(got) == {1, 2, 4}
    for d in got:
        assert got[d][0] == want[d][0]
        assert abs(got[d][1] - want[d][1]) < 1e-9, (d, got[d], want[d])
