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
                                threshold=0.2, n_cells=4, n_assign=2,
                                eager_cleanup=False)
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


# --------------------------------------------------------------- sssp


def test_sssp_prefers_cheap_multi_hop_and_respects_bound(spark):
    """Triangle 0-1-2 with an expensive direct edge 0→2 (10) and a
    cheap two-hop path 0-1-2 (1+1): with 2+ rounds cost(2)=2; with
    rounds=1 only the direct edge is reachable, cost(2)=10. An
    isolated seed 99 sits at cost 0 either way."""
    from transe_pyspark_spark.operators.graph import sssp_rounds

    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (0, 2, 10)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(0,), (99,)], "node long")
    two = {r.node: r.cost for r in sssp_rounds(edges, seeds, rounds=3).collect()}
    assert two == {0: 0, 99: 0, 1: 1, 2: 2}
    one = {r.node: r.cost for r in sssp_rounds(edges, seeds, rounds=1).collect()}
    assert one == {0: 0, 99: 0, 1: 1, 2: 10}


def test_sssp_matches_python_bellman_ford(spark):
    """Random sparse weighted graph vs a reference Bellman-Ford bounded
    at the same number of edge relaxations (multi-source, min over
    seeds) — including the early-exit path (rounds far beyond the
    diameter)."""
    import random

    from transe_pyspark_spark.operators.graph import sssp_rounds

    rng = random.Random(23)
    n = 40
    raw = [
        (rng.randrange(n), rng.randrange(n), rng.randrange(1, 50)) for _ in range(60)
    ]
    seeds = [0, 7, 13]
    # python model: undirected simple graph, parallel edges -> min w
    best = {}
    for u, v, w in raw:
        if u == v:
            continue
        k = (min(u, v), max(u, v))
        best[k] = min(best.get(k, 10**9), w)
    adj = {}
    for (u, v), w in best.items():
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    H = 50
    dist = {s: 0 for s in seeds}
    for _ in range(H):
        nxt = dict(dist)
        for u, d in dist.items():
            for v, w in adj.get(u, []):
                if d + w < nxt.get(v, 10**18):
                    nxt[v] = d + w
        if nxt == dist:
            break
        dist = nxt
    edges = spark.createDataFrame(raw, "src long, dst long, w long")
    seeds_df = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {r.node: r.cost for r in sssp_rounds(edges, seeds_df, rounds=H).collect()}
    assert got == dist


# ------------------------------------------------------ degree assortativity


def test_assortativity_star_is_minus_one(spark):
    """A star graph is perfectly disassortative: every edge joins the
    hub (deg n) to a leaf (deg 1) — r = -1 exactly."""
    from transe_pyspark_spark.operators.graph import degree_assortativity

    edges = spark.createDataFrame([(0, i) for i in range(1, 7)], "src long, dst long")
    row = degree_assortativity(edges).collect()[0]
    assert row.m_directed == 12
    assert abs(row.r - (-1.0)) < 1e-12


def test_assortativity_matches_python_model(spark):
    """Random graph vs the direct Pearson-over-doubled-edges formula."""
    import random

    from transe_pyspark_spark.operators.graph import degree_assortativity

    rng = random.Random(5)
    raw = {(a, b) for a, b in ((rng.randrange(30), rng.randrange(30)) for _ in range(80)) if a != b}
    und = {(min(a, b), max(a, b)) for a, b in raw}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs = [deg[a] for a, b in und] + [deg[b] for a, b in und]
    ys = [deg[b] for a, b in und] + [deg[a] for a, b in und]
    m = len(xs)
    sx, sxy, sxx = sum(xs), sum(x * y for x, y in zip(xs, ys)), sum(x * x for x in xs)
    want = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    edges = spark.createDataFrame(sorted(raw), "src long, dst long")
    row = degree_assortativity(edges).collect()[0]
    assert row.m_directed == m and row.sum_deg == sx
    assert abs(row.r - want) < 1e-12


# ------------------------------------------------------- source divergence


def test_source_divergence_matches_python_model(spark):
    """Tiny two-source corpus vs a hand-rolled entropy/KL with the same
    nano-quantization; a source identical to the corpus mix has small
    KL, a skewed one large."""
    import math
    import re

    from transe_pyspark_spark.functions.text import source_divergence

    docs = [
        (1, "a", "cat dog cat bird"),
        (2, "a", "dog cat fish"),
        (3, "b", "fish fish fish fish"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    # python model with identical quantization
    st = {}
    for _, s, txt in docs:
        for t in (x for x in re.split(r"[^a-z0-9]+", txt.lower()) if x):
            st[(s, t)] = st.get((s, t), 0) + 1
    ct = {}
    for (s, t), c in st.items():
        ct[t] = ct.get(t, 0) + c
    ns = {}
    nd = {}
    for (s, t), c in st.items():
        ns[s] = ns.get(s, 0) + c
        nd[s] = nd.get(s, 0) + 1
    n = sum(ct.values())
    kl_nano, pl_nano = {}, {}
    for (s, t), c in st.items():
        p = c / ns[s]
        q = ct[t] / n
        kl_nano[s] = kl_nano.get(s, 0) + round(p * math.log(p / q) * 1e9)
        pl_nano[s] = pl_nano.get(s, 0) + round(p * math.log(p) * 1e9)
    want = {
        s: (ns[s], nd[s], round(-pl_nano[s] / 1e9, 4), round(kl_nano[s] / 1e9, 4))
        for s in ns
    }
    got = {
        r.source: (r.n_tokens, r.n_distinct_tokens, r.entropy, r.kl_vs_corpus)
        for r in source_divergence(df).collect()
    }
    assert got == want
    assert got["b"][3] > got["a"][3]  # the all-fish source diverges more


# ------------------------------------------------------------ KS statistic


def test_ks_statistic_matches_python_model(spark):
    """Random two-sample data vs the direct max|cumA·nB − cumB·nA|
    formula; a planted location shift must dominate a same-distribution
    pair."""
    import random

    from transe_pyspark_spark.operators.relational import ks_statistic

    rng = random.Random(11)
    rows = [("a", float(rng.randrange(100))) for _ in range(400)]
    rows += [("b", float(rng.randrange(100)) + 30.0) for _ in range(300)]  # shifted
    df = spark.createDataFrame(rows, "g string, v double")
    got = ks_statistic(df, "g", "v", "a", "b").collect()[0]
    vals = sorted({v for _, v in rows})
    na = sum(1 for g, _ in rows if g == "a")
    nb = len(rows) - na
    cuma = cumb = dnum = 0
    for v in vals:
        cuma += sum(1 for g, x in rows if g == "a" and x == v)
        cumb += sum(1 for g, x in rows if g == "b" and x == v)
        dnum = max(dnum, abs(cuma * nb - cumb * na))
    assert (got.n_a, got.n_b, got.d_num) == (na, nb, dnum)
    assert abs(got.ks_d - dnum / (na * nb)) < 1e-15
    assert got.ks_d > 0.25  # the 30-point shift is visible


def test_ks_statistic_identical_samples_zero(spark):
    """The same multiset in both groups: D == 0 exactly."""
    from transe_pyspark_spark.operators.relational import ks_statistic

    rows = [(g, float(v)) for g in ("a", "b") for v in (1, 2, 2, 5, 9)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = ks_statistic(df, "g", "v", "a", "b").collect()[0]
    assert got.d_num == 0 and got.ks_d == 0.0


def test_ks_plan_has_no_pidless_value_window(spark):
    """The cumulative CDFs must ride the distributed prefix: every
    window ordered on the value column also partitions on __pid — a
    pid-less value window is the single-task funnel the operator
    exists to avoid."""
    import re

    from transe_pyspark_spark.operators.relational import ks_statistic

    rows = [("a", float(i % 7)) for i in range(50)] + [("b", float(i % 5)) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, v double")
    plan = ks_statistic(df, "g", "v", "a", "b")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    bad = [
        line.strip()[:120]
        for line in plan.splitlines()
        if "windowspecdefinition(__v#" in line and "__pid#" not in line
    ]
    assert not bad, bad


# --------------------------------------------------------- streaming drift


def test_windowed_value_drift_known_histograms(spark):
    """Batch twin on hand-built frames: a window identical to the
    reference has TV 0; a window fully concentrated in one of two
    equally-likely reference buckets has TV 0.5 exactly (exact
    integers: tv_num = |4·4−2·4| + (4−2)·4 = 16, 16/(2·4·4) = 0.5)."""
    import datetime

    from transe_pyspark_spark.streaming.windows import windowed_value_drift

    t0 = datetime.datetime(2024, 1, 1, 0, 30)
    ref = [(0, 2), (1, 2)]  # buckets 0 and 1, 2 rows each, R = 4
    skewed = [(None, t0, float(v)) for v in (1.0, 2.0, 3.0, 4.0)]  # all bucket 0
    df = spark.createDataFrame(skewed, "user_id long, ts timestamp, value double")
    row = windowed_value_drift(df, ref, 4).collect()[0]
    assert (row.n_events, row.tv_num, row.tv) == (4, 16, 0.5)
    same = [(None, t0, float(v)) for v in (1.0, 2.0, 11.0, 12.0)]  # 2 per bucket
    df2 = spark.createDataFrame(same, "user_id long, ts timestamp, value double")
    row2 = windowed_value_drift(df2, ref, 4).collect()[0]
    assert (row2.n_events, row2.tv_num, row2.tv) == (4, 0, 0.0)


def test_windowed_value_drift_ref_only_and_window_only_buckets(spark):
    """Buckets present only in the reference contribute r_b·N; buckets
    only in the window contribute n_b·R — both folds verified against
    a hand model with NULL values excluded."""
    import datetime

    from transe_pyspark_spark.streaming.windows import windowed_value_drift

    t0 = datetime.datetime(2024, 1, 1, 5, 10)
    ref = [(0, 6), (5, 3)]  # R = 9
    rows = [(None, t0, 51.0), (None, t0, 52.0), (None, t0, 99.0), (None, t0, None)]
    # window: bucket 5 ×2, bucket 9 ×1 (NULL dropped) -> N = 3
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    row = windowed_value_drift(df, ref, 9).collect()[0]
    # matched: |2*9 - 3*3| + |1*9 - 0*3| = 9 + 9 = 18; ref-only: (9-3)*3 = 18
    assert (row.n_events, row.tv_num) == (3, 36)
    assert abs(row.tv - 36 / (2 * 3 * 9)) < 1e-15
