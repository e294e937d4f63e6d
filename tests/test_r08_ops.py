"""Round-8 operator tests: the four r07 advisory fixes (nearest-join
NULL-key semantics, repeated-step funnels, graph cache cleanup, the
interval explode cap) and the adversarial hub-graph triangle census
(VERDICT r07 ask #7)."""

from __future__ import annotations

import datetime as dt
import math

import pytest


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 7, 1, 12, minute)


def test_nearest_join_null_keys_follow_equi_join_semantics(spark):
    """NULL never matches NULL (the oracle's correlated equality
    predicate): a NULL-key left row is PRESERVED with a NULL match,
    and a NULL-key right row is never selectable — even when both
    would land in the same Window.partitionBy NULL partition."""
    from transe_pyspark_spark.operators.asof import nearest_join

    left = spark.createDataFrame(
        [(1, _ts(10)), (None, _ts(10))],
        "user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(11), 100), (None, _ts(10), 200)],
        "user_id long, ts timestamp, event_id long",
    )
    rows = {
        r["user_id"]: (r["event_id_nearest"], r["delta_us_nearest"])
        for r in nearest_join(left, right, on="user_id").collect()
    }
    assert rows[1] == (100, 60_000_000)
    # NULL-key left row preserved, matched to nothing — NOT to the
    # NULL-key right row sitting at the exact same timestamp
    assert rows[None] == (None, None)


def test_ordered_funnel_repeated_step_requires_new_event(spark):
    """["click","click"] counts users with >=2 clicks; a single click
    can no longer complete both occurrences (r08 advisory fix)."""
    from transe_pyspark_spark.operators.asof import ordered_funnel

    rows = [
        (1, "click", _ts(0)),          # one click only
        (2, "click", _ts(0)), (2, "click", _ts(0)),  # two at the SAME ts
        (3, "click", _ts(0)), (3, "click", _ts(5)),  # two, strictly later
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r["step_idx"]: r["n_users"] for r in ordered_funnel(df, ["click", "click"]).collect()}
    # step 0: all three users clicked; step 1: only user 3 has a
    # strictly LATER second click (user 2's duplicate shares the ts)
    assert got == {0: 3, 1: 1}


def test_graph_eager_cleanup_releases_cache_entries(spark):
    """pagerank_integer and triangle_stats with the default
    eager_cleanup=True leave the cache manager EMPTY after returning —
    repeated calls over different graphs no longer accumulate pinned
    entries (r08 advisory fix). Results are still correct."""
    from transe_pyspark_spark.operators.graph import pagerank_integer, triangle_stats

    spark.catalog.clearCache()
    for salt in (0, 1):  # different inputs → would pin 2 entry sets each
        edges = spark.createDataFrame(
            [(1 + salt * 10, 2 + salt * 10), (2 + salt * 10, 3 + salt * 10),
             (3 + salt * 10, 1 + salt * 10)],
            "src long, dst long",
        )
        ranks = {r["node"]: r["rank_micro"] for r in pagerank_integer(edges).collect()}
        assert len(ranks) == 3 and len(set(ranks.values())) == 1  # ring fixed point
        tri = triangle_stats(edges).collect()[0]
        assert (tri["n_triangles"], tri["n_wedges"]) == (1, 3)
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "eager_cleanup left entries pinned in the cache manager"
    )


def test_triangle_stats_hub_graph_count_and_orientation_bound(spark):
    """Adversarial hub shape (VERDICT r07 ask #7): a star around one
    hub plus a few spoke-spoke closing edges. The exact triangle count
    equals the number of closing edges (each closes exactly one
    triangle through the hub), and the degree orientation keeps the
    wedge-join candidate volume at Σ outdeg⁺·(outdeg⁺−1) ≪ the hub's
    deg² an id-orientation could pay — with max outdeg⁺ ≤ O(√E)."""
    from transe_pyspark_spark.operators.graph import triangle_stats

    hub, n_spokes = 0, 60
    star = [(hub, s) for s in range(1, n_spokes + 1)]
    closing = [(1, 2), (3, 4), (5, 6), (7, 8)]  # 4 triangles via the hub
    edges = spark.createDataFrame(star + closing, "src long, dst long")
    got = triangle_stats(edges).collect()[0]
    assert got["n_nodes"] == n_spokes + 1
    assert got["n_edges"] == n_spokes + len(closing)
    assert got["n_triangles"] == len(closing)
    # exact wedge count: hub C(60,2) + each closed spoke C(2,2)... from
    # degrees: hub d=60; spokes 1..8 d=2; spokes 9..60 d=1
    want_wedges = 60 * 59 // 2 + 8 * (2 * 1 // 2)
    assert got["n_wedges"] == want_wedges

    # replicate the operator's (degree, id) orientation in python and
    # bound the wedge-join candidate volume the plan generates
    deg: dict[int, int] = {}
    und = {tuple(sorted(e)) for e in star + closing}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    outdeg: dict[int, int] = {}
    for a, b in und:
        u = a if (deg[a], a) <= (deg[b], b) else b
        outdeg[u] = outdeg.get(u, 0) + 1
    candidates = sum(d * (d - 1) for d in outdeg.values())
    bound = sum(d * d for d in outdeg.values())
    assert candidates <= bound
    # the orientation property the O(sqrt E) claim rests on: every
    # oriented outdegree is tiny — the hub (deg 60) receives edges
    # from its lower-degree spokes and emits none
    assert outdeg.get(hub, 0) == 0
    assert max(outdeg.values()) <= math.isqrt(2 * len(und)) + 1
    # and the candidate volume is nowhere near the hub's naive deg²
    assert candidates < 60 * 59 / 4


def test_interval_overlap_explode_guard_raises_actionably(spark):
    """A badly undersized bucket fails with an actionable message (an
    in-plan per-row check — no extra scan jobs), while intervals under
    the cap still join exactly (r08 advisory fix)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from transe_pyspark_spark.operators.asof import interval_overlap_join

    base = dt.datetime(2024, 7, 1)
    mk = lambda s, e: (base + dt.timedelta(minutes=s), base + dt.timedelta(minutes=e))
    left = spark.createDataFrame([mk(0, 100)], "start timestamp, end timestamp")
    right = spark.createDataFrame([mk(50, 60)], "start timestamp, end timestamp")

    # 100-minute interval at 1-minute buckets = 100 > cap of 10
    with pytest.raises(SparkRuntimeException, match="max_explode_factor"):
        interval_overlap_join(
            left, right, bucket_micros=60_000_000, max_explode_factor=10
        ).collect()

    # same data, cap not exceeded: the overlap is found exactly
    ok = interval_overlap_join(
        left, right, bucket_micros=60_000_000, max_explode_factor=1_000
    ).collect()
    assert len(ok) == 1


def test_transition_counts_matches_python_model(spark):
    """Random event log: transition counts equal a per-user python
    walk under the same deterministic (ts, id) order; probabilities
    are n/total per source state; invariant under repartition."""
    import random

    from transe_pyspark_spark.operators.sequences import transition_counts

    rng = random.Random(11)
    base = dt.datetime(2024, 7, 1)
    rows = [
        (i, base + dt.timedelta(minutes=rng.randrange(50)), rng.randrange(12),
         rng.choice("abcd"))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p_from"])
        for r in transition_counts(df).collect()
    }
    got_rep = {
        (r["from_type"], r["to_type"]): (r["n"], r["p_from"])
        for r in transition_counts(df.repartition(7)).collect()
    }
    assert got == got_rep

    by_user: dict[int, list] = {}
    for eid, ts, u, t in rows:
        by_user.setdefault(u, []).append((ts, eid, t))
    want_n: dict[tuple, int] = {}
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            want_n[(a, b)] = want_n.get((a, b), 0) + 1
    totals: dict[str, int] = {}
    for (a, _), n in want_n.items():
        totals[a] = totals.get(a, 0) + n
    want = {k: (n, n / totals[k[0]]) for k, n in want_n.items()}
    assert got == want


def test_time_to_convert_matches_python_model(spark):
    """Known small log: per-cohort conversion counts, rates, and exact
    interpolated percentiles; non-converters counted in n_started."""
    import numpy as np

    from transe_pyspark_spark.operators.sequences import time_to_convert

    t0 = dt.datetime(2024, 7, 1)  # a Monday
    rows = [
        # user 1: view @0, purchase @10min → 600e6 us
        (1, t0, "view"), (1, t0 + dt.timedelta(minutes=10), "purchase"),
        # user 2: purchase BEFORE first view → not converted
        (2, t0 + dt.timedelta(minutes=5), "purchase"),
        (2, t0 + dt.timedelta(minutes=30), "view"),
        # user 3: view only
        (3, t0 + dt.timedelta(hours=1), "view"),
        # user 4: view @0, purchases at 20min and 5min-later-week — earliest after view counts
        (4, t0, "view"), (4, t0 + dt.timedelta(minutes=20), "purchase"),
        (4, t0 + dt.timedelta(days=8), "purchase"),
        # user 5: next-week cohort, converts in 1 min
        (5, t0 + dt.timedelta(days=7), "view"),
        (5, t0 + dt.timedelta(days=7, minutes=1), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["cohort_week"]: r for r in time_to_convert(df).collect()}
    wk0, wk1 = t0, t0 + dt.timedelta(days=7)
    assert got[wk0]["n_started"] == 4 and got[wk0]["n_converted"] == 2
    assert got[wk0]["conv_rate"] == 0.5
    durs = np.array([600e6, 1200e6])
    assert got[wk0]["p50_us"] == float(np.percentile(durs, 50))
    assert got[wk0]["p90_us"] == float(np.percentile(durs, 90))
    assert got[wk1]["n_started"] == 1 and got[wk1]["n_converted"] == 1
    assert got[wk1]["p50_us"] == 60e6


def test_ab_ztest_known_counts(spark):
    """Hand-checked z statistic: arms by user parity, exposure=view,
    conversion=purchase-after-any-view (distinct users)."""
    import math

    from pyspark.sql import functions as F

    from transe_pyspark_spark.operators.sequences import ab_conversion_ztest

    t0 = dt.datetime(2024, 7, 1)
    rows = []
    # arm 0 (even ids): users 0,2,4,6 exposed; 0,2 convert
    for u in (0, 2, 4, 6):
        rows.append((u, t0, "view"))
    for u in (0, 2):
        rows.append((u, t0, "purchase"))
    # arm 1 (odd ids): users 1,3,5 exposed; 3 converts; user 7 purchases
    # without exposure → excluded from both n1 and conv1
    for u in (1, 3, 5):
        rows.append((u, t0, "view"))
    rows += [(3, t0, "purchase"), (7, t0, "purchase")]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    r = ab_conversion_ztest(df, arm_expr=F.pmod(F.col("user_id"), F.lit(2))).collect()[0]
    assert (r["n0"], r["conv0"], r["n1"], r["conv1"]) == (4, 2, 3, 1)
    p0, p1 = 2 / 4, 1 / 3
    pooled = 3 / 7
    se = math.sqrt(pooled * (1 - pooled) * (1 / 4 + 1 / 3))
    assert abs(r["z"] - (p1 - p0) / se) < 1e-12


def test_cross_source_dup_matrix_counts(spark):
    """Within-source C(n,2) and cross-source n_a*n_b pair arithmetic,
    with whitespace/case normalization collapsing variants."""
    from transe_pyspark_spark.operators.dedup import cross_source_dup_matrix

    rows = [
        ("Hello  World", "a"), ("hello world", "a"), ("HELLO WORLD ", "a"),  # 3 in a
        ("hello world", "b"),                                                # 1 in b
        ("unique doc", "a"),
        ("other doc", "b"), ("other doc", "c"),
    ]
    df = spark.createDataFrame(rows, "text string, source string")
    got = {(r["source_a"], r["source_b"]): r["dup_pairs"]
           for r in cross_source_dup_matrix(df).collect()}
    assert got == {("a", "a"): 3, ("a", "b"): 3, ("b", "c"): 1}


def test_kcore_peel_cascades_on_path_graph(spark):
    """Path graph 0-1-2-...-9 with k=2: endpoints (degree 1) peel off
    one PER ROUND from each end — the cascading-removal case the fixed
    trading-graph face can't show. After r rounds the path loses r
    nodes per side; a triangle welded to the middle survives forever."""
    from transe_pyspark_spark.operators.graph import kcore_peel

    path = [(i, i + 1) for i in range(9)]          # 0..9 path
    tri = [(4, 100), (100, 101), (101, 4), (100, 5)]  # clique-ish anchor at 4-5
    edges = spark.createDataFrame(path + tri, "src long, dst long")
    for rounds, lost_per_side in ((1, 1), (2, 2), (3, 3)):
        got = {r["node"] for r in kcore_peel(edges, k=2, rounds=rounds).collect()}
        want = set(range(0 + rounds, 10 - rounds)) | {100, 101}
        assert got == want, (rounds, sorted(got))
    # cache hygiene: default eager_cleanup leaves nothing pinned
    spark.catalog.clearCache()
    kcore_peel(edges, k=2, rounds=2).collect()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_daily_count_correlation_known_values(spark):
    """Hand-checked Pearson r incl. zero-filled gap days, and the
    degenerate zero-variance NULL case."""
    import numpy as np

    from transe_pyspark_spark.operators.sequences import daily_count_correlation

    t0 = dt.datetime(2024, 7, 1)
    rows = []
    # day 0: 3 views, 1 purchase; day 1: 1 view; day 3: 2v 2p (day 2 = gap)
    rows += [(t0, "view")] * 3 + [(t0, "purchase")]
    rows += [(t0 + dt.timedelta(days=1), "view")]
    rows += [(t0 + dt.timedelta(days=3), "view")] * 2
    rows += [(t0 + dt.timedelta(days=3), "purchase")] * 2
    rows += [(t0, "error")]  # other types never counted
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    r = daily_count_correlation(df, "view", "purchase").collect()[0]
    assert (r["n_days"], r["sum_x"], r["sum_y"]) == (4, 6, 3)
    x, y = np.array([3, 1, 0, 2]), np.array([1, 0, 0, 2])
    assert abs(r["r"] - float(np.corrcoef(x, y)[0, 1])) < 1e-12

    # constant y → zero variance → NULL r
    df2 = spark.createDataFrame(
        [(t0, "view"), (t0 + dt.timedelta(days=1), "view")],
        "ts timestamp, event_type string",
    )
    assert daily_count_correlation(df2, "view", "purchase").collect()[0]["r"] is None


def test_top_event_paths_matches_python_model(spark):
    """Random log: top-k 3-paths equal a per-user python sliding
    window with (ts, id) ordering and (n desc, path asc) tie-break."""
    import random

    from transe_pyspark_spark.operators.sequences import top_event_paths

    rng = random.Random(5)
    base = dt.datetime(2024, 7, 1)
    rows = [
        (i, base + dt.timedelta(minutes=rng.randrange(60)), rng.randrange(15),
         rng.choice("abc"))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = [(r["path"], r["n"]) for r in top_event_paths(df, path_len=3, top_k=5).collect()]

    by_user: dict[int, list] = {}
    for eid, ts, u, t in rows:
        by_user.setdefault(u, []).append((ts, eid, t))
    counts: dict[str, int] = {}
    for evs in by_user.values():
        evs.sort()
        types = [t for _, _, t in evs]
        for i in range(len(types) - 2):
            p = ">".join(types[i : i + 3])
            counts[p] = counts.get(p, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == want


def test_cusum_changepoint_detects_level_shift(spark):
    """Synthetic step series: 5 days at ~2/day then 5 days at ~8/day —
    the CUSUM argmax lands on the last low-level day, gap days count
    as zero, and the range matches the python model exactly."""
    from transe_pyspark_spark.operators.sequences import cusum_changepoint

    t0 = dt.datetime(2024, 7, 1)
    rows = []
    for day in range(10):
        n = 2 if day < 5 else 8
        if day == 2:
            n = 0  # gap day: no rows at all, spine must zero-fill
        rows += [(t0 + dt.timedelta(days=day, hours=h), "a") for h in range(n)]
    rows += [(t0, "b"), (t0 + dt.timedelta(days=9), "b")]  # flat type
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    got = {r["event_type"]: r for r in cusum_changepoint(df).collect()}

    # python model for type a
    xs = [2, 2, 0, 2, 2, 8, 8, 8, 8, 8]
    n, tot = len(xs), sum(xs)
    cx = 0
    ns = []
    for i, x in enumerate(xs, start=1):
        cx += x
        ns.append(cx * n - i * tot)
    m = max(abs(v) for v in ns)
    change_idx = min(i for i, v in enumerate(ns) if abs(v) == m)
    a = got["a"]
    assert a["n_days"] == n and a["total"] == tot
    assert a["change_day"] == (t0 + dt.timedelta(days=change_idx)).date()
    assert a["cusum_range"] == (max(ns) - min(ns)) / n
    # the shift really is detected at the regime boundary (day 4)
    assert change_idx == 4
    b = got["b"]
    assert b["n_days"] == 10 and b["total"] == 2


def test_compact_parquet_rewrites_small_files(spark, tmp_path):
    """A 40-file directory compacts to the computed file count with
    identical data (order-insensitive), and the staged swap leaves no
    temp directory behind."""
    import os

    from pyspark.sql import functions as F

    from transe_pyspark_spark.sources.readers import compact_parquet

    path = str(tmp_path / "frag")
    df = spark.range(10_000).select("id", (F.col("id") * 3).alias("v"))
    df.repartition(40).write.parquet(path)
    n_before = sum(f.startswith("part-") for f in os.listdir(path))
    assert n_before == 40

    stats = compact_parquet(spark, path, target_file_bytes=1 << 30, min_files=2)
    assert stats["files_before"] == 40 and stats["files_after"] == 2
    n_after = sum(f.startswith("part-") for f in os.listdir(path))
    assert n_after == 2
    assert not os.path.exists(os.path.join(path, "__compact_tmp"))

    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).collect()[0][0] == sum(i * 3 for i in range(10_000))
    # schema preserved
    assert [f.name for f in back.schema.fields] == ["id", "v"]


def test_kcore_peel_fuzz_vs_python(spark):
    """Random graphs at several k: the fixed-round peel equals a python
    simulation of the same per-round rule (drop nodes with degree < k,
    then their edges)."""
    import random

    from transe_pyspark_spark.operators.graph import kcore_peel

    rng = random.Random(29)
    for trial in range(3):
        n, m = 40, 90
        edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(m)}
        df = spark.createDataFrame(sorted(edges), "src long, dst long")
        for k in (2, 3):
            rounds = 3
            got = {r["node"]: r["degree"] for r in kcore_peel(df, k=k, rounds=rounds).collect()}

            und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
            for _ in range(rounds):
                deg: dict[int, int] = {}
                for a, b in und:
                    deg[a] = deg.get(a, 0) + 1
                    deg[b] = deg.get(b, 0) + 1
                keep = {v for v, d in deg.items() if d >= k}
                und = {(a, b) for a, b in und if a in keep and b in keep}
            want: dict[int, int] = {}
            for a, b in und:
                want[a] = want.get(a, 0) + 1
                want[b] = want.get(b, 0) + 1
            assert got == want, (trial, k)


def test_group_percent_rank_matches_python_and_partitioning(spark):
    """Random (group, value) rows incl. ties and a singleton group:
    pr equals the (value, id)-ordered python model and is invariant
    under input repartitioning (the frozen range-partition contract)."""
    import random

    from transe_pyspark_spark.operators.relational import group_percent_rank

    rng = random.Random(41)
    rows = [(rng.choice("xyz"), rng.randrange(10), i) for i in range(300)]
    rows.append(("solo", 7, 999))
    df = spark.createDataFrame(rows, "g string, v long, id long")
    got = {r["id"]: r["pr"] for r in group_percent_rank(df, "g", "v", "id").collect()}
    got_rep = {
        r["id"]: r["pr"]
        for r in group_percent_rank(df.repartition(7), "g", "v", "id").collect()
    }
    assert got == got_rep

    by_g: dict[str, list] = {}
    for g, v, i in rows:
        by_g.setdefault(g, []).append((v, i))
    want = {}
    for g, vs in by_g.items():
        vs.sort()
        n = len(vs)
        for pos, (_, i) in enumerate(vs, start=1):
            want[i] = (pos - 1) / (n - 1) if n > 1 else 0.0
    assert got == want
    assert got[999] == 0.0  # singleton group


def test_oov_rates_matches_python_model(spark):
    """Small corpus with a forced vocab cut: rates equal a python model
    using the same (freq desc, token asc) top-k rule."""
    from transe_pyspark_spark.functions.text import oov_rates

    docs = [
        (1, "aa aa bb cc"),
        (2, "bb bb dd"),
        (3, "ee"),
        (4, "  AA   bb  "),  # case/whitespace normalization
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in oov_rates(df, vocab_size=2).collect()
    }
    # freqs: aa=3, bb=4, cc=1, dd=1, ee=1 → top-2 = {bb, aa}
    model_vocab = {"bb", "aa"}
    want = {}
    for did, text in docs:
        ws = [w for w in text.lower().strip().split() if w]
        oov = sum(1 for w in ws if w not in model_vocab)
        want[did] = (len(ws), oov, oov / len(ws))
    assert got == want


def test_dynamic_partition_overwrite_touches_only_written_partitions(spark, tmp_path):
    """partitionOverwriteMode=dynamic: overwriting a partitioned table
    with a frame that holds only SOME partition values replaces exactly
    those partitions and leaves the rest intact — the incremental
    backfill semantics a 100 TB partitioned warehouse depends on
    (static mode would wipe every partition first)."""
    from pyspark.sql import functions as F

    from transe_pyspark_spark.sources.readers import write_parquet

    path = str(tmp_path / "by_day")
    base = spark.createDataFrame(
        [(d, i, d * 100 + i) for d in (1, 2, 3) for i in range(10)],
        "day int, id int, v long",
    )
    write_parquet(base, path, partition_by=["day"])

    fixed_day2 = spark.createDataFrame(
        [(2, i, 9999) for i in range(5)], "day int, id int, v long"
    )
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fixed_day2.write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)

    back = spark.read.parquet(path)
    per_day = {
        r["day"]: (r["n"], r["s"])
        for r in back.groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    # day 2 fully replaced by the 5-row backfill; days 1 and 3 untouched
    assert per_day[2] == (5, 5 * 9999)
    assert per_day[1] == (10, sum(100 + i for i in range(10)))
    assert per_day[3] == (10, sum(300 + i for i in range(10)))


def test_session_type_affinity_matches_python_model(spark):
    """Random log with forced session gaps: pair counts and lift equal
    a python sessionizer + basket model."""
    import random

    from transe_pyspark_spark.operators.sequences import session_type_affinity

    rng = random.Random(53)
    base = dt.datetime(2024, 7, 1)
    rows = []
    eid = 0
    for u in range(8):
        t = base
        for _ in range(rng.randrange(3, 15)):
            # gaps sometimes exceed the 600s session gap
            t += dt.timedelta(seconds=rng.choice([30, 90, 2000]))
            rows.append((eid, u, t, rng.choice("pqr")))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = {
        (r["type_a"], r["type_b"]): (r["n_ab"], r["lift"])
        for r in session_type_affinity(df, gap_seconds=600).collect()
    }

    # python model
    by_user: dict[int, list] = {}
    for eid_, u, ts, ty in rows:
        by_user.setdefault(u, []).append((ts, eid_, ty))
    baskets = []
    for evs in by_user.values():
        evs.sort()
        cur, prev = None, None
        for ts, _, ty in evs:
            if prev is None or (ts - prev).total_seconds() > 600:
                cur = set()
                baskets.append(cur)
            cur.add(ty)
            prev = ts
    S = len(baskets)
    from collections import Counter
    n_t = Counter(t for b in baskets for t in b)
    n_ab: Counter = Counter()
    for b in baskets:
        ts_sorted = sorted(b)
        for i in range(len(ts_sorted)):
            for j in range(i + 1, len(ts_sorted)):
                n_ab[(ts_sorted[i], ts_sorted[j])] += 1
    want = {
        pair: (n, n * S / (n_t[pair[0]] * n_t[pair[1]]))
        for pair, n in n_ab.items()
    }
    assert got == want


def test_node_clustering_known_and_fuzz(spark):
    """Hub graph with known per-node values, then random-graph fuzz vs
    a python triangle counter."""
    import itertools
    import random

    from transe_pyspark_spark.operators.graph import node_clustering

    # known: triangle 1-2-3 + pendant 4 attached to 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 4)], "src long, dst long"
    )
    got = {r["node"]: (r["degree"], r["n_tri"], r["clustering"])
           for r in node_clustering(edges).collect()}
    assert got[2] == (2, 1, 1.0) and got[3] == (2, 1, 1.0)
    assert got[1] == (3, 1, 2 * 1 / (3 * 2))
    assert got[4] == (1, 0, None)

    rng = random.Random(71)
    for _ in range(2):
        und = {tuple(sorted((rng.randrange(25), rng.randrange(25)))) for _ in range(60)}
        und = {e for e in und if e[0] != e[1]}
        df = spark.createDataFrame(sorted(und), "src long, dst long")
        got = {r["node"]: (r["degree"], r["n_tri"]) for r in node_clustering(df).collect()}
        adj: dict[int, set] = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want = {}
        for n, nb in adj.items():
            t = sum(1 for x, y in itertools.combinations(sorted(nb), 2) if y in adj.get(x, ()))
            want[n] = (len(nb), t)
        assert got == want


def test_constraint_audit_counts_known_violations(spark):
    """Every check type against a frame with KNOWN violations — exact
    counts, including NULL handling (NULLs violate not_null only)."""
    from transe_pyspark_spark.operators import quality as Q

    child = spark.createDataFrame(
        [(1, "a", 5), (1, "b", -2), (2, None, 60), (None, "a", 7), (3, "z", 8)],
        "k long, status string, v long",
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    rep = {
        r["check_name"]: (r["n_checked"], r["n_violations"])
        for r in Q.constraint_audit(
            [
                Q.check_not_null(child, "status"),
                Q.check_unique(child, "k"),
                Q.check_accepted_values(child, "status", ["a", "b"]),
                Q.check_range(child, "v", lo=0, hi=50),
                Q.check_foreign_key(child, "k", parent, "pk"),
            ]
        ).collect()
    }
    assert rep["not_null:status"] == (5, 1)
    # 4 non-null keys, k=1 twice -> 1 beyond-first duplicate
    assert rep["unique:k"] == (4, 1)
    # non-null statuses: a,b,a,z -> one outside {a,b}
    assert rep["accepted:status"] == (4, 1)
    # values 5,-2,60,7,8 -> -2 below lo, 60 above hi
    assert rep["range:v"] == (5, 2)
    # non-null child keys 1,1,2,3 -> 3 has no parent
    assert rep["fk:k->pk"] == (4, 1)


def test_constraint_audit_empty_frame_and_bounds(spark):
    """Empty input yields (0, 0) rows, not NULLs; single-bound ranges
    check only that side; missing bounds raise."""
    import pytest

    from transe_pyspark_spark.operators import quality as Q

    empty = spark.createDataFrame([], "v long")
    rep = {
        r["check_name"]: (r["n_checked"], r["n_violations"])
        for r in Q.constraint_audit(
            [Q.check_range(empty, "v", lo=0), Q.check_accepted_values(empty, "v", [1])]
        ).collect()
    }
    assert rep["range:v"] == (0, 0) and rep["accepted:v"] == (0, 0)
    some = spark.createDataFrame([(-5,), (500,)], "v long")
    lo_only = Q.check_range(some, "v", lo=0).collect()[0]
    hi_only = Q.check_range(some, "v", hi=100).collect()[0]
    assert lo_only["n_violations"] == 1 and hi_only["n_violations"] == 1
    with pytest.raises(ValueError):
        Q.check_range(some, "v")
    with pytest.raises(ValueError):
        Q.constraint_audit([])


def test_rfm_segments_matches_python_model(spark):
    """Random small orders table vs an exact python replica of the
    metric + floor(rank*5/n) tiling rules."""
    import datetime
    import random

    from transe_pyspark_spark.operators.relational import rfm_segments

    rng = random.Random(95)
    rows = []
    base = datetime.date(2024, 1, 1)
    for i in range(400):
        ck = rng.randrange(60)
        d = base + datetime.timedelta(days=rng.randrange(365))
        price = round(rng.uniform(10, 5000), 2)
        rows.append((ck, d, price))
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate date, o_totalprice double"
    )
    got = {
        (r["r_score"], r["f_score"], r["m_score"]): (
            r["n_customers"],
            r["sum_monetary_cents"],
        )
        for r in rfm_segments(df).collect()
    }
    maxd = max(d for _, d, _ in rows)
    pc = {}
    for ck, d, p in rows:
        last, f, m = pc.get(ck, (datetime.date.min, 0, 0))
        pc[ck] = (max(last, d), f + 1, m + round(p * 100))
    met = {ck: ((maxd - last).days, f, m) for ck, (last, f, m) in pc.items()}
    n = len(met)

    def tiles(idx, invert):
        order = sorted(met, key=lambda ck: (met[ck][idx], ck))
        return {
            ck: (5 - (i * 5) // n) if invert else (1 + (i * 5) // n)
            for i, ck in enumerate(order)
        }

    rs, fs, ms = tiles(0, True), tiles(1, False), tiles(2, False)
    want = {}
    for ck, (_, _, m) in met.items():
        key = (rs[ck], fs[ck], ms[ck])
        c0, m0 = want.get(key, (0, 0))
        want[key] = (c0 + 1, m0 + m)
    assert got == want


def test_rfm_segments_cleanup_and_invariants(spark):
    """eager_cleanup truncates the result plan (the customer-grain pin
    is released; what remains in storage is the frozen-partition
    localCheckpoint leaves every prefix-rank operator leaves behind);
    scores stay in 1..5 and segment counts sum to the customer count."""
    import datetime

    from transe_pyspark_spark.operators.relational import rfm_segments

    rows = [
        (i % 7, datetime.date(2024, 1, 1 + (i % 20)), 100.0 + i)
        for i in range(50)
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate date, o_totalprice double"
    )
    res = rfm_segments(df)
    # eager mode: the returned plan is the checkpoint alone (no live
    # aggregate/join lineage keeping the pin reachable)
    assert "Aggregate" not in res._jdf.queryExecution().optimizedPlan().toString()
    lazy = rfm_segments(df, eager_cleanup=False)
    assert "Aggregate" in lazy._jdf.queryExecution().optimizedPlan().toString()
    out = res.collect()
    assert sum(r["n_customers"] for r in out) == 7
    for r in out:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5


def test_table_diff_known_changes_and_null_safety(spark):
    """Hand-built versions with every row class (added, removed,
    changed single/both columns, NULL transitions, identical)."""
    from transe_pyspark_spark.operators.relational import table_diff

    old = spark.createDataFrame(
        [
            (1, "a", 10),    # identical
            (2, "b", 20),    # changed: v only
            (3, None, 30),   # changed: NULL -> value (x)
            (4, "d", None),  # identical (NULL == NULL)
            (5, "e", 50),    # removed
        ],
        "k long, x string, v long",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "b", 99),
            (3, "c", 30),
            (4, "d", None),
            (6, "f", 60),    # added
        ],
        "k long, x string, v long",
    )
    rep = {r["metric"]: r["n"] for r in table_diff(old, new, ["k"]).collect()}
    assert rep == {
        "added": 1,
        "removed": 1,
        "changed": 2,
        "identical": 2,
        "changed:x": 1,
        "changed:v": 1,
    }


def test_table_diff_arg_contract(spark):
    import pytest

    from transe_pyspark_spark.operators.relational import table_diff

    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError):
        table_diff(df, df, [])
    with pytest.raises(ValueError):
        table_diff(df.select("k"), df.select("k"), ["k"])


def test_snapshot_changeset_roundtrip_law(spark):
    """cdc_apply(old, snapshot_changeset(old, new)) == new exactly —
    on random keyed tables with inserts, deletes, updates, NULL
    transitions, and identical rows."""
    import random

    from transe_pyspark_spark.operators.relational import cdc_apply, snapshot_changeset

    rng = random.Random(29)
    old_rows, new_rows = [], []
    for k in range(200):
        a = rng.choice([None, rng.randrange(5)])
        b = rng.randrange(1000)
        fate = rng.random()
        if fate < 0.2:
            old_rows.append((k, a, b))                      # deleted
        elif fate < 0.4:
            new_rows.append((k, a, b))                      # inserted
        elif fate < 0.7:
            old_rows.append((k, a, b))                      # updated
            new_rows.append((k, rng.choice([None, 9]), b + 1))
        else:
            old_rows.append((k, a, b))                      # identical
            new_rows.append((k, a, b))
    schema = "k long, a long, v long"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    batch = snapshot_changeset(old, new, ["k"])
    # the batch is |changes|-sized: identical keys emit nothing
    om = {r[0]: r[1:] for r in old_rows}
    nm = {r[0]: r[1:] for r in new_rows}
    want_batch = sum(
        1 for k in om.keys() | nm.keys() if om.get(k, "_") != nm.get(k, "_")
    )
    assert batch.count() == want_batch
    applied = cdc_apply(old, batch, ["k"])
    got = sorted(tuple(r) for r in applied.collect())
    want = sorted(new_rows)
    assert got == want
    ops = {r["op"] for r in batch.collect()}
    assert ops <= {"I", "U", "D"}


def test_snapshot_changeset_schema_contract(spark):
    import pytest

    from transe_pyspark_spark.operators.relational import snapshot_changeset

    a = spark.createDataFrame([(1, 2)], "k long, v long")
    b = spark.createDataFrame([(1, 2, 3)], "k long, v long, w long")
    with pytest.raises(ValueError):
        snapshot_changeset(a, b, ["k"])
    with pytest.raises(ValueError):
        snapshot_changeset(a, a, [])


def test_pyds_triples_partitioning_and_determinism(spark):
    """The custom data source plans the requested partitions (scan
    parallelism = n_partitions), two reads are identical, the row set
    matches the closed form, and bad options raise."""
    from transe_pyspark_spark.sources import pydatasource

    pydatasource.register(spark)

    def load(**kw):
        r = spark.read.format("kg_triples")
        for k, v in kw.items():
            r = r.option(k, str(v))
        return r.load()

    df = load(n_rows=1000, n_entities=50, n_relations=5, n_partitions=7)
    assert df.rdd.getNumPartitions() == 7
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(
        ((i * 40503 + 7) % 50, (i * 69621 + 3) % 5, (i * 16807 + 11) % 50)
        for i in range(1000)
    )
    assert got == want
    assert got == sorted(tuple(r) for r in df.collect())  # re-read identical

    # ragged split: 10 rows over 4 partitions still covers exactly
    assert load(n_rows=10, n_partitions=4).count() == 10

    # option validation raises at PLAN time (the reader is built
    # driver-side); the wrapper type varies, the message is ours
    with pytest.raises(Exception, match="kg_triples options"):
        load(n_rows=0).count()


def test_pyds_filter_pushdown_equivalence_and_residual(spark):
    """With option("pushdown","true") + the session conf, an l = const
    filter is consumed by the source (only isnotnull remains in the
    plan) and results equal the unpushed scan — including the
    gcd-degenerate relation count where the congruence has no
    solutions. Plain reads stay functional with the conf off."""
    import re

    from pyspark.sql import functions as F

    from transe_pyspark_spark.sources import pydatasource

    pydatasource.register(spark)
    old = spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        def load(push, nr=20):
            r = (spark.read.format("kg_triples").option("n_rows", "4000")
                 .option("n_entities", "100").option("n_relations", str(nr))
                 .option("n_partitions", "5"))
            if push:
                r = r.option("pushdown", "true")
            return r.load()

        want = sorted(tuple(r) for r in load(False).collect() if r[1] == 3)
        filt = load(True).filter(F.col("l") == 3)
        assert sorted(tuple(r) for r in filt.collect()) == want
        assert len(want) == 4000 // 20
        plan = filt._jdf.queryExecution().executedPlan().toString()
        # the EqualTo was consumed: any residual Filter is isnotnull only
        for line in plan.splitlines():
            if re.search(r"\(\d+\) Filter", line) or "* Filter" in line:
                assert "isnotnull" in line and "= 3" not in line

        # nr=6: multiplier 69621 ≡ 3 (mod 6) → l only ever hits {0, 3};
        # pushing l = 1 must yield the same empty set as brute force
        assert load(True, nr=6).filter(F.col("l") == 1).count() == 0
        assert sum(1 for r in load(False, nr=6).collect() if r[1] == 1) == 0
        assert load(True, nr=6).filter(F.col("l") == 3).count() == \
            sum(1 for r in load(False, nr=6).collect() if r[1] == 3)
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", old)
    # with pushdown disabled again, both reader variants still work
    assert load(False).count() == 4000


def test_pyds_stream_equals_batch_and_replays(spark):
    """The streaming variant drains to exactly the batch reader's row
    multiset, and a restart from an existing checkpoint replays the
    remaining range without duplicating or dropping rows."""
    import tempfile
    import uuid

    from transe_pyspark_spark.sources import pydatasource

    pydatasource.register(spark)
    opts = {"n_rows": "3000", "n_entities": "200", "n_relations": "9",
            "n_partitions": "4", "batch_rows": "700"}

    def batch_rows():
        r = spark.read.format("kg_triples")
        for k, v in opts.items():
            r = r.option(k, v)
        return sorted(tuple(x) for x in r.load().collect())

    def stream_df():
        r = spark.readStream.format("kg_triples")
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    # parquet sink (fault-tolerant, unlike memory) so the restart leg
    # can recover from the same checkpoint
    ckpt = tempfile.mkdtemp(prefix="ckpt_pyds_")
    out = tempfile.mkdtemp(prefix="out_pyds_") + "/rows"

    def drain():
        q = (stream_df().writeStream.format("parquet")
             .outputMode("append").option("path", out)
             .option("checkpointLocation", ckpt).start())
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

    drain()
    got = sorted(tuple(x) for x in spark.read.parquet(out).collect())
    assert got == batch_rows()

    # restart on the SAME checkpoint: the source is fully drained, so
    # exactly-once replay must add NOTHING to the sink
    drain()
    assert sorted(tuple(x) for x in spark.read.parquet(out).collect()) == got


def test_tsv_sink_two_phase_commit_and_abort(spark):
    """The custom Python sink: task temps only become part-files at
    DRIVER commit (with a _SUCCESS row-count manifest); a failing
    write aborts without touching the previously committed output."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from transe_pyspark_spark.sources import pydatasource
    from transe_pyspark_spark.sources.readers import read_triples_tsv

    pydatasource.register(spark)
    src = (spark.read.format("kg_triples").option("n_rows", "1200")
           .option("n_entities", "80").option("n_relations", "6")
           .option("n_partitions", "3").load())
    d = tempfile.mkdtemp(prefix="kgtsv_t_")
    src.write.format("kg_tsv").option("path", d).mode("overwrite").save()
    files = sorted(os.listdir(d))
    assert files == ["_SUCCESS", "part-00000.tsv", "part-00001.tsv", "part-00002.tsv"]
    assert open(os.path.join(d, "_SUCCESS")).read().strip() == "1200"
    back = read_triples_tsv(spark, d + "/part-*.tsv")
    assert sorted(tuple(r) for r in src.collect()) == sorted(
        (int(r["head"]), int(r["label"]), int(r["tail"])) for r in back.collect()
    )

    # failing job: one row poisons str() via a UDF raise -> tasks fail,
    # abort runs, and the COMMITTED output is untouched (no temps, no
    # partial part-files, same _SUCCESS)
    @F.udf("long")
    def boom(v):
        raise RuntimeError("poisoned row")

    import pytest

    with pytest.raises(Exception):
        (src.withColumn("h", boom(F.col("h")))
         .write.format("kg_tsv").option("path", d).mode("overwrite").save())
    assert sorted(os.listdir(d)) == files  # nothing added, nothing removed
    assert open(os.path.join(d, "_SUCCESS")).read().strip() == "1200"

    # missing path is an actionable error
    with pytest.raises(Exception, match="path"):
        src.write.format("kg_tsv").mode("overwrite").save()
