"""Property tests for the r06 second-wave operators: CDC apply, cohort
retention, MAD outliers, keyword lift, blocked linkage, containment
pairs, and the chained streaming aggregation — each checked against an
independent pure-Python model or hand-computed edge cases the fixture
oracles don't hit."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# cdc_apply
# ---------------------------------------------------------------------------

def _python_cdc(snapshot, changes):
    """snapshot: {key: attrs}; changes: [(key, op, seq, attrs)] →
    applied {key: attrs} with highest-seq-wins and D removing."""
    latest = {}
    for key, op, seq, attrs in changes:
        if key not in latest or seq > latest[key][1] or (
            seq == latest[key][1] and op < latest[key][0]
        ):
            latest[key] = (op, seq, attrs)
    out = dict(snapshot)
    for key, (op, _seq, attrs) in latest.items():
        if op == "D":
            out.pop(key, None)
        else:
            out[key] = attrs
    return out


def test_cdc_apply_matches_python_model(spark):
    from transe_pyspark_spark.operators.relational import cdc_apply

    rng = random.Random(11)
    snapshot = {k: (rng.randrange(100), rng.randrange(1000)) for k in range(50)}
    changes = []
    for i in range(120):
        key = rng.randrange(80)  # keys beyond the snapshot exercise inserts
        op = rng.choice(["I", "U", "D"])
        seq = rng.randrange(1, 6)
        attrs = (rng.randrange(100), rng.randrange(1000)) if op != "D" else (None, None)
        changes.append((key, op, seq, attrs))
    # dedupe (key, seq) collisions: the operator contract requires them unique
    seen = set()
    uniq = []
    for c in changes:
        if (c[0], c[2]) not in seen:
            seen.add((c[0], c[2]))
            uniq.append(c)
    changes = uniq

    snap_df = spark.createDataFrame(
        [(k, a, b) for k, (a, b) in snapshot.items()], "k long, a long, b long"
    )
    ch_df = spark.createDataFrame(
        [(k, attrs[0], attrs[1], op, seq) for k, op, seq, attrs in changes],
        "k long, a long, b long, op string, seq long",
    )
    got = {r["k"]: (r["a"], r["b"]) for r in cdc_apply(snap_df, ch_df, ["k"]).collect()}
    model = _python_cdc(snapshot, changes)
    assert got == model


def test_cdc_apply_empty_batch_is_identity(spark):
    from transe_pyspark_spark.operators.relational import cdc_apply

    snap = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    empty = spark.createDataFrame([], "k long, v long, op string, seq long")
    got = sorted((r["k"], r["v"]) for r in cdc_apply(snap, empty, ["k"]).collect())
    assert got == [(1, 10), (2, 20)]


def test_cdc_apply_missing_columns_raises(spark):
    from transe_pyspark_spark.operators.relational import cdc_apply

    snap = spark.createDataFrame([(1, 10)], "k long, v long")
    bad = spark.createDataFrame([(1, "D", 1)], "k long, op string, seq long")
    with pytest.raises(ValueError, match="missing"):
        cdc_apply(snap, bad, ["k"])


# ---------------------------------------------------------------------------
# cohort_retention
# ---------------------------------------------------------------------------

def test_cohort_retention_hand_computed(spark):
    from transe_pyspark_spark.operators.asof import cohort_retention

    # Mondays: 2024-01-01, 2024-01-08, 2024-01-15
    t = lambda d, h=0: dt.datetime(2024, 1, d, h)
    rows = [
        # user 1: first Jan 2 (cohort wk Jan 1), active wk0 and wk2
        (1, t(2)), (1, t(3)), (1, t(16)),
        # user 2: first Jan 5 (cohort wk Jan 1), active wk0 only
        (2, t(5)),
        # user 3: first Jan 9 (cohort wk Jan 8), active wk0 and wk1
        (3, t(9)), (3, t(15)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort_week"].date(), r["age_weeks"]): (r["n_active"], r["n_cohort"], r["retention"])
        for r in cohort_retention(df).collect()
    }
    wk1, wk2 = dt.date(2024, 1, 1), dt.date(2024, 1, 8)
    assert got == {
        (wk1, 0): (2, 2, 1.0),
        (wk1, 2): (1, 2, 0.5),
        (wk2, 0): (1, 1, 1.0),
        (wk2, 1): (1, 1, 1.0),
    }


def test_cohort_retention_age_zero_is_full(spark):
    """Every cohort's age-0 cell is by construction the whole cohort."""
    from transe_pyspark_spark.operators.asof import cohort_retention

    rng = random.Random(5)
    base = dt.datetime(2024, 2, 5)
    rows = [
        (rng.randrange(40), base + dt.timedelta(minutes=rng.randrange(0, 40 * 24 * 60)))
        for _ in range(600)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    for r in cohort_retention(df).filter(F.col("age_weeks") == 0).collect():
        assert r["n_active"] == r["n_cohort"]
        assert r["retention"] == 1.0


# ---------------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------------

def test_mad_outliers_planted(spark):
    from transe_pyspark_spark.operators.relational import mad_outliers

    # group "a": tight cluster around 10 plus two wild outliers
    vals_a = [10.0 + 0.1 * i for i in range(-5, 6)] + [1000.0, -500.0]
    # group "b": all identical → mad 0, any deviation is an outlier
    vals_b = [5.0] * 9 + [5.1]
    rows = [("a", v) for v in vals_a] + [("b", v) for v in vals_b]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in mad_outliers(df, "g", "v", k=3.0).collect()}
    assert got["a"]["n"] == 13
    assert got["a"]["n_outliers"] == 2
    assert got["a"]["med"] == 10.0
    assert got["b"]["n_outliers"] == 1  # mad 0 → threshold 0 → 5.1 flagged
    assert got["b"]["mad"] == 0.0


def _python_mad(rows, k=3.0):
    import statistics

    out = {}
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        med = statistics.median(vs)
        mad = statistics.median([abs(v - med) for v in vs])
        n_out = sum(1 for v in vs if abs(v - med) > k * 1.4826 * mad)
        out[g] = (len(vs), n_out)
    return out


def test_mad_outliers_matches_python_model(spark):
    from transe_pyspark_spark.operators.relational import mad_outliers

    rng = random.Random(23)
    rows = [
        (rng.choice(["x", "y", "z"]), round(rng.gauss(50, 10), 2))
        for _ in range(500)
    ] + [(g, round(rng.uniform(500, 900), 2)) for g in "xyz" for _ in range(3)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: (r["n"], r["n_outliers"]) for r in mad_outliers(df, "g", "v").collect()}
    assert got == _python_mad(rows)


# ---------------------------------------------------------------------------
# doc_keywords
# ---------------------------------------------------------------------------

def test_doc_keywords_matches_python_model(spark):
    from transe_pyspark_spark.functions.text import doc_keywords

    docs = [
        (0, "apple apple banana cherry"),
        (1, "banana banana banana date"),
        (2, "apple cherry cherry cherry elderberry"),
        (3, "date elderberry fig fig"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["kw_rank"]): (r["term"], r["tf"], r["df"])
        for r in doc_keywords(df, k=2).collect()
    }
    n = len(docs)
    tf = {}
    for i, text in docs:
        for w in text.split():
            tf[(i, w)] = tf.get((i, w), 0) + 1
    dfreq = {}
    for (_i, w) in tf:
        dfreq[w] = dfreq.get(w, 0) + 1
    model = {}
    for i, _text in docs:
        terms = [(w, c) for (j, w), c in tf.items() if j == i]
        scored = sorted(
            terms, key=lambda wc: (-(wc[1] * (n + 1)) / (dfreq[wc[0]] + 1), wc[0])
        )
        for rank, (w, c) in enumerate(scored[:2], start=1):
            model[(i, rank)] = (w, c, dfreq[w])
    assert got == model


# ---------------------------------------------------------------------------
# blocked_levenshtein_pairs
# ---------------------------------------------------------------------------

def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_blocked_levenshtein_matches_python(spark):
    from transe_pyspark_spark.operators.linkage import blocked_levenshtein_pairs

    names = [
        (0, "acme widget co"), (1, "acme widgets co"), (2, "acme wadget inc"),
        (3, "zenith bolt ltd"), (4, "zenith bolts ltd"), (5, "acme completely different"),
        (6, "apex bolt ltd"),
    ]
    df = spark.createDataFrame(names, "id long, nm string")
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in blocked_levenshtein_pairs(
            df, "id", "nm", block_expr=F.split(F.col("nm"), " ").getItem(0), max_distance=6
        ).collect()
    }
    by_block = {}
    for i, nm in names:
        by_block.setdefault(nm.split()[0], []).append((i, nm))
    model = {}
    for blk in by_block.values():
        for x in range(len(blk)):
            for y in range(x + 1, len(blk)):
                (ia, na), (ib, nb) = sorted([blk[x], blk[y]])
                d = _lev(na, nb)
                if d <= 6 and abs(len(na) - len(nb)) <= 6:
                    model[(ia, ib)] = d
    assert got == model
    # cross-block pairs never appear even when textually close
    assert (3, 6) not in got  # "zenith bolt ltd" vs "apex bolt ltd": blocked apart


def test_blocked_levenshtein_arg_contract(spark):
    from transe_pyspark_spark.operators.linkage import blocked_levenshtein_pairs

    df = spark.createDataFrame([(1, "x", "b")], "id long, nm string, blk string")
    with pytest.raises(ValueError, match="exactly one"):
        blocked_levenshtein_pairs(df, "id", "nm")
    with pytest.raises(ValueError, match="exactly one"):
        blocked_levenshtein_pairs(
            df, "id", "nm", block_cols=["blk"], block_expr=F.col("blk")
        )


# ---------------------------------------------------------------------------
# containment_prefix_pairs
# ---------------------------------------------------------------------------

def _python_containment(docs, t, n=3):
    def grams(text):
        ws = text.split()
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    sets = {i: grams(tx) for i, tx in docs if len(tx.split()) >= n}
    out = {}
    for a, ga in sets.items():
        for b, gb in sets.items():
            if a != b and ga:
                c = len(ga & gb) / len(ga)
                if c >= t:
                    out[(a, b)] = round(c, 6)
    return out


def test_containment_matches_python_bruteforce(spark):
    from transe_pyspark_spark.operators.dedup import containment_prefix_pairs

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(40):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(6, 30)))))
    # plant a strict subset: doc 100 is a contiguous slice of doc 0
    base = docs[0][1].split()
    docs.append((100, " ".join(base[2:10])))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_prefix_pairs(df, threshold=0.5, shingle_n=3).collect()
    }
    model = _python_containment(docs, 0.5)
    assert got == model
    assert got[(100, 0)] == 1.0  # the planted subset is fully contained


def test_containment_threshold_contract(spark):
    from transe_pyspark_spark.operators.dedup import containment_prefix_pairs

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        containment_prefix_pairs(df, threshold=0.0)


# ---------------------------------------------------------------------------
# chained_windowed_counts
# ---------------------------------------------------------------------------

def test_chained_windowed_counts_batch_twin(spark):
    from transe_pyspark_spark.streaming.windows import chained_windowed_counts

    t = lambda m, s=0: dt.datetime(2024, 5, 1, 9, m, s)
    rows = [
        ("a", t(1)), ("a", t(2)), ("a", t(11)), ("a", t(59, 59)),
        ("b", t(5)), ("b", t(25)),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {
        (r["window_start"], r["event_type"]): (r["total_events"], r["peak_10min"], r["n_slices"])
        for r in chained_windowed_counts(df).collect()
    }
    h9 = dt.datetime(2024, 5, 1, 9)
    # "a": slices 9:00(2), 9:10(1), 9:50(1) → total 4, peak 2, 3 slices
    assert got[(h9, "a")] == (4, 2, 3)
    # "b": slices 9:00(1), 9:20(1) → total 2, peak 1, 2 slices
    assert got[(h9, "b")] == (2, 1, 2)


def test_chained_streaming_equals_gated_batch(spark, sf_dir):
    """The streaming face emits exactly the batch twin restricted to
    hourly windows finalized by the terminal watermark."""
    from transe_pyspark_spark.sources.readers import load_table
    from transe_pyspark_spark.streaming.windows import (
        chained_windowed_counts,
        read_events_stream,
        run_available_now,
    )

    events = load_table(spark, sf_dir, "events")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    gate = max_ts - dt.timedelta(hours=2)
    batch = {
        tuple(r)
        for r in chained_windowed_counts(events)
        .filter(F.col("window_start") + F.expr("INTERVAL 1 HOUR") <= F.lit(gate))
        .collect()
    }
    streamed = {
        tuple(r)
        for r in run_available_now(
            chained_windowed_counts(read_events_stream(spark, sf_dir)),
            spark,
            output_mode="append",
        ).collect()
    }
    assert streamed == batch


# ---------------------------------------------------------------------------
# pagerank_integer
# ---------------------------------------------------------------------------

def _python_pagerank(edges, iterations, scale=1_000_000, damping=85):
    """Rank domain = nodes with out-edges; a node with no incoming
    contributions holds the teleport term (r07: the dst-keyed rebuild
    dropped source-only nodes — identical on bidirectional graphs)."""
    outdeg = {}
    for s, _d in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = {n: scale for n in outdeg}
    base = (100 - damping) * scale // 100
    for _ in range(iterations):
        sums = {n: 0 for n in outdeg}
        for s, d in edges:
            sums[d] += ranks[s] // outdeg[s]
        ranks = {n: base + (damping * sums[n]) // 100 for n in outdeg}
    return ranks


def test_pagerank_matches_python_model(spark):
    from transe_pyspark_spark.operators.graph import pagerank_integer

    rng = random.Random(17)
    fwd = {(rng.randrange(20), 100 + rng.randrange(10)) for _ in range(80)}
    edges = list(fwd) + [(d, s) for s, d in fwd]  # bidirectional: no dangling
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_micro"] for r in pagerank_integer(df, iterations=4).collect()}
    assert got == _python_pagerank(edges, 4)


def test_pagerank_ring_is_fixed_point(spark):
    """On a directed ring (outdeg 1 everywhere) every rank stays
    exactly SCALE: base + damping·SCALE/100 = SCALE."""
    from transe_pyspark_spark.operators.graph import SCALE, pagerank_integer

    n = 12
    df = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    # checkpoint_every=2 also exercises the lineage-truncation path
    out = pagerank_integer(df, iterations=5, checkpoint_every=2).collect()
    assert len(out) == n
    assert all(r["rank_micro"] == SCALE for r in out)


def test_pagerank_iterations_contract(spark):
    from transe_pyspark_spark.operators.graph import pagerank_integer

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        pagerank_integer(df, iterations=0)


# ---------------------------------------------------------------------------
# copurchase_pairs
# ---------------------------------------------------------------------------

def test_copurchase_matches_python_model(spark):
    from transe_pyspark_spark.operators.graph import copurchase_pairs

    rng = random.Random(29)
    rows = [(rng.randrange(30), rng.randrange(12)) for _ in range(300)]
    rows += rows[:50]  # duplicate (basket, item) rows must not inflate support
    df = spark.createDataFrame(rows, "b long, it long")
    got = [
        (r["item_a"], r["item_b"], r["n_baskets"])
        for r in copurchase_pairs(df, "b", "it", top_k=15).collect()
    ]
    baskets = {}
    for b, it in set(rows):
        baskets.setdefault(b, set()).add(it)
    support = {}
    for items in baskets.values():
        s = sorted(items)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                support[(s[x], s[y])] = support.get((s[x], s[y]), 0) + 1
    model = sorted(
        ((a, b, n) for (a, b), n in support.items()),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:15]
    assert got == model


# ---------------------------------------------------------------------------
# key_skew_report
# ---------------------------------------------------------------------------

def _python_weighted_sample(rows, n_target, salt=1):
    """rows: [(id, w)] → selected ids via Madow systematic PPS in the
    MINSTD-hash order."""
    m = 2147483647

    def h(i):
        return ((i % m) * 48271 + salt) % m * 48271 % m

    ordered = sorted(rows, key=lambda r: (h(r[0]), r[0]))
    tot = sum(w for _i, w in ordered)
    out, cum = [], 0
    for i, w in ordered:
        prev = cum
        cum += w
        if (cum * n_target) // tot > (prev * n_target) // tot:
            out.append((i, cum))
    return out


def test_weighted_sample_matches_python_model(spark):
    from transe_pyspark_spark.operators.relational import weighted_systematic_sample

    rng = random.Random(41)
    rows = [(i, rng.randrange(1, 500)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = sorted(
        (r["doc_id"], r["cum_weight"])
        for r in weighted_systematic_sample(df, "w", n_target=40).collect()
    )
    assert got == sorted(_python_weighted_sample(rows, 40))


def test_weighted_sample_heavy_row_and_determinism(spark):
    """A row heavier than total/n covers several stride points but
    emits once; the selected set is stable under repartitioning."""
    from transe_pyspark_spark.operators.relational import weighted_systematic_sample

    rows = [(i, 1) for i in range(50)] + [(999, 10_000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    sel = weighted_systematic_sample(df, "w", n_target=10)
    ids = [r["doc_id"] for r in sel.collect()]
    assert ids.count(999) == 1  # one output row despite covering ~9 points
    again = weighted_systematic_sample(df.repartition(7), "w", n_target=10)
    assert sorted(ids) == sorted(r["doc_id"] for r in again.collect())
    with pytest.raises(ValueError, match="n_target"):
        weighted_systematic_sample(df, "w", n_target=0)


def _python_rolling_wau(rows, window_days=7):
    days = {}
    for d, u in set(rows):
        days.setdefault(d, set()).add(u)
    md = max(days)
    out = {}
    all_days = sorted({d + dt.timedelta(days=k) for d in days for k in range(window_days)})
    for day in all_days:
        if day > md:
            continue
        active = set()
        for k in range(window_days):
            active |= days.get(day - dt.timedelta(days=k), set())
        if active:
            out[day] = (len(days.get(day, set())), len(active))
    return out


def test_rolling_wau_matches_python_model(spark):
    from transe_pyspark_spark.operators.asof import rolling_active_users

    rng = random.Random(47)
    base = dt.date(2024, 3, 1)
    rows = []
    for _ in range(400):
        d = base + dt.timedelta(days=rng.randrange(0, 25))
        rows.append((dt.datetime.combine(d, dt.time(rng.randrange(24))), rng.randrange(30)))
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    got = {r["day"]: (r["dau"], r["wau"]) for r in rolling_active_users(df).collect()}
    model = _python_rolling_wau([(ts.date(), u) for ts, u in rows])
    assert got == model
    # gap days (no activity that day, activity within the window) have dau 0
    for day, (dau, wau) in got.items():
        assert wau >= dau


def test_collapse_bursts_chain_semantics(spark):
    """Predecessor-chained semantics: a chain of events each within
    the gap of the PREVIOUS one collapses to its first event, even
    when later events are far from the survivor; a gap longer than
    ``gap_seconds`` starts a new burst; distinct keys never interact."""
    from transe_pyspark_spark.operators.asof import collapse_bursts

    t = lambda m: dt.datetime(2024, 9, 1, 0, m)
    rows = [
        (1, 10, "a", t(0)), (2, 10, "a", t(4)), (3, 10, "a", t(8)),  # chain → keep 1
        (4, 10, "a", t(20)),                                          # new burst
        (5, 10, "b", t(4)),                                           # other key
        (6, 11, "a", t(4)),                                           # other user
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string, ts timestamp")
    kept = sorted(
        r["event_id"]
        for r in collapse_bursts(df, ["user_id", "event_type"], gap_seconds=300).collect()
    )
    assert kept == [1, 4, 5, 6]


def test_winsorize_report_hand_computed(spark):
    from transe_pyspark_spark.operators.relational import winsorize_report

    vals = [float(x) for x in range(1, 101)]  # 1..100
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    r = winsorize_report(df, "g", "v", lo_q=0.1, hi_q=0.9).collect()[0]
    # quantile_cont(0.1) over 1..100 = 10.9; (0.9) = 90.1
    assert r["lo_bound"] == 10.9
    assert r["hi_bound"] == 90.1
    assert r["n_clipped_lo"] == 10   # 1..10 < 10.9
    assert r["n_clipped_hi"] == 10   # 91..100 > 90.1
    assert r["sum_cents_raw"] == sum(round(v * 100) for v in vals)
    clipped = sum(
        1090 if v < 10.9 else 9010 if v > 90.1 else round(v * 100) for v in vals
    )
    assert r["sum_cents_winsorized"] == clipped


def test_wav_roundtrip_and_chunk_walk(spark):
    """encode_wav payloads decode back to the generator's exact values,
    and the decoder's chunk walk survives extra chunks and odd-size
    padding (real WAV files carry LIST/INFO chunks before data)."""
    import struct

    from transe_pyspark_spark.operators.multimodal import (
        decode_wav_bytes,
        encode_wav,
    )

    df = spark.createDataFrame([(i,) for i in (0, 1, 7, 399, 1234)], "doc_id long")
    rows = {r["doc_id"]: bytes(r["payload"]) for r in encode_wav(df).collect()}
    for i, payload in rows.items():
        meta = decode_wav_bytes(payload)
        ch, n = 1 + i % 2, 100 + i % 400
        assert meta["sample_rate"] == 8000
        assert meta["channels"] == ch
        assert meta["n_frames"] == n
        assert meta["duration_ms"] == n * 1000 // 8000
        total = n * ch
        expect = sum(abs(((i * 31 + 7 * k) % 65536) - 32768) for k in range(total)) // total
        assert meta["mean_abs_sample"] == expect

    # inject an odd-sized LIST chunk between WAVE and fmt: the walker
    # must skip it (with pad byte) and still find fmt/data
    p = rows[7]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    hacked = p[:12] + extra + p[12:]
    hacked = b"RIFF" + struct.pack("<I", len(hacked) - 8) + hacked[8:]
    assert decode_wav_bytes(hacked) == decode_wav_bytes(p)

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_bytes(b"nonsense bytes")


def test_distribution_drift_hand_computed(spark):
    """Identical distributions drift 0 everywhere; a bucket present on
    one side only contributes its full rate/2; TV contributions sum to
    the known total-variation distance."""
    from pyspark.sql import functions as F

    from transe_pyspark_spark.operators.relational import distribution_drift

    a = spark.createDataFrame([(v,) for v in [1, 1, 2, 2]], "v long")
    b = spark.createDataFrame([(v,) for v in [1, 1, 1, 3]], "v long")
    got = {
        r["bucket"]: (r["n_a"], r["n_b"], r["rate_a"], r["rate_b"], r["tv_contrib"])
        for r in distribution_drift(a, b, F.col("v")).collect()
    }
    # p = {1: .5, 2: .5}; q = {1: .75, 3: .25}; TV = .5*( .25 + .5 + .25 ) = 0.5
    assert got[1] == (2, 3, 0.5, 0.75, 0.125)
    assert got[2] == (2, 0, 0.5, 0.0, 0.25)
    assert got[3] == (0, 1, 0.0, 0.25, 0.125)
    assert abs(sum(v[4] for v in got.values()) - 0.5) < 1e-12

    same = distribution_drift(a, a, F.col("v")).collect()
    assert all(r["tv_contrib"] == 0.0 for r in same)


def test_trend_per_key_exact_line_and_degenerate(spark):
    """A perfectly linear series recovers its slope/intercept exactly;
    a single observation and an all-same-timestamp key yield NULL
    slope (undefined), not a crash or a garbage value."""
    from transe_pyspark_spark.operators.relational import trend_per_key

    t = lambda s: dt.datetime(2024, 8, 1, 0, 0, s)
    rows = (
        # y_cents = 500 + 3·x over x = 0, 10, 20, 30 seconds
        [("lin", t(x), (500 + 3 * x) / 100.0) for x in (0, 10, 20, 30)]
        + [("single", t(5), 42.0)]
        + [("samets", t(7), 1.0), ("samets", t(7), 9.0)]
    )
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {r["k"]: r for r in trend_per_key(df, "k", "ts", "v").collect()}
    assert got["lin"]["slope_cents_per_s"] == 3.0
    assert got["lin"]["intercept_cents"] == 500.0
    assert got["single"]["slope_cents_per_s"] is None
    assert got["samets"]["slope_cents_per_s"] is None


def test_trend_per_key_matches_numpy(spark):
    import numpy as np

    from transe_pyspark_spark.operators.relational import trend_per_key

    rng = random.Random(73)
    base = dt.datetime(2024, 8, 1)
    rows = [
        ("a", base + dt.timedelta(seconds=rng.randrange(0, 100000)), round(rng.uniform(1, 80), 2))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    r = trend_per_key(df, "k", "ts", "v").collect()[0]
    t0 = min(ts for _k, ts, _v in rows)
    x = np.array([int((ts - t0).total_seconds()) for _k, ts, _v in rows], dtype=float)
    y = np.array([round(v * 100) for _k, _ts, v in rows], dtype=float)
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(r["slope_cents_per_s"] - slope) < 1e-6
    assert abs(r["intercept_cents"] - intercept) < 1e-3


def test_sample_k_per_group_matches_python(spark):
    from transe_pyspark_spark.operators.relational import sample_k_per_group

    rng = random.Random(71)
    rows = [(i, rng.choice(["en", "de", "zh"])) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        (r["lang"], r["sample_rank"]): r["doc_id"]
        for r in sample_k_per_group(df, ["lang"], "doc_id", k=5).collect()
    }
    m = 2147483647

    def h(i):
        return (((i % m) * 48271 + 1) % m) * 48271 % m

    model = {}
    for lang in ("en", "de", "zh"):
        members = sorted((i for i, l in rows if l == lang), key=lambda i: (h(i), i))
        for rank, i in enumerate(members[:5], start=1):
            model[(lang, rank)] = i
    assert got == model
    # stable under repartitioning
    again = {
        (r["lang"], r["sample_rank"]): r["doc_id"]
        for r in sample_k_per_group(df.repartition(7), ["lang"], "doc_id", k=5).collect()
    }
    assert again == got
    with pytest.raises(ValueError, match="k must"):
        sample_k_per_group(df, ["lang"], "doc_id", k=0)


def test_attribution_linear_matches_python(spark):
    from transe_pyspark_spark.operators.asof import attribute_conversions

    rng = random.Random(67)
    base = dt.datetime(2024, 7, 1)
    convs, touches = [], []
    for i in range(40):
        u = rng.randrange(8)
        cts = base + dt.timedelta(minutes=rng.randrange(0, 7 * 24 * 60))
        convs.append((u, cts, round(rng.uniform(1, 200), 2)))
    for i in range(200):
        u = rng.randrange(8)
        tts = base + dt.timedelta(minutes=rng.randrange(0, 7 * 24 * 60))
        touches.append((u, tts, rng.choice(["click", "view", "email"])))
    cdf = spark.createDataFrame(convs, "user_id long, ts timestamp, value double")
    tdf = spark.createDataFrame(touches, "user_id long, ts timestamp, event_type string")
    got = {
        r["channel"]: (r["n_touches"], r["attributed_microcents"])
        for r in attribute_conversions(cdf, tdf, horizon_hours=6).collect()
    }
    model = {}
    for u, cts, v in convs:
        cents = round(v * 100)
        inw = [
            ch for (tu, tts, ch) in touches
            if tu == u and cts - dt.timedelta(hours=6) < tts <= cts
        ]
        if not inw:
            n, credit = model.get("direct", (0, 0))
            model["direct"] = (n + 1, credit + cents * 1_000_000)
        else:
            per = (cents * 1_000_000) // len(inw)
            for ch in inw:
                n, credit = model.get(ch, (0, 0))
                model[ch] = (n + 1, credit + per)
    assert got == model


def test_interpolate_resample_hand_computed(spark):
    """Observations at hours 0 (100.00) and 4 (500.00): the three gap
    hours fill with the straight line 200/300/400; observed buckets
    reduce to their own value exactly."""
    from transe_pyspark_spark.operators.asof import interpolate_resample

    t = lambda h: dt.datetime(2024, 6, 1, h)
    rows = [(1, t(0), 100.0), (1, t(4), 500.0), (2, t(1), 50.0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["bucket_ts"].hour): (r["value_interp"], r["observed"])
        for r in interpolate_resample(df).collect()
    }
    assert got == {
        (1, 0): (10000.0, True),
        (1, 1): (20000.0, False),
        (1, 2): (30000.0, False),
        (1, 3): (40000.0, False),
        (1, 4): (50000.0, True),
        (2, 1): (5000.0, True),  # single-observation key: grid is one bucket
    }


def test_interval_overlap_matches_bruteforce(spark):
    from transe_pyspark_spark.operators.asof import interval_overlap_join

    rng = random.Random(61)
    base = dt.datetime(2024, 4, 1)

    def mk(n, seed_off):
        out = []
        for i in range(n):
            s = base + dt.timedelta(minutes=rng.randrange(0, 5000))
            e = s + dt.timedelta(minutes=rng.randrange(1, 90))
            out.append((i + seed_off, s, e))
        return out

    lrows, rrows = mk(60, 0), mk(60, 1000)
    ldf = spark.createDataFrame(lrows, "id long, start timestamp, end timestamp")
    rdf = spark.createDataFrame(rrows, "id long, start timestamp, end timestamp")
    got = {
        (r["id"], r["id_r"])
        for r in interval_overlap_join(ldf, rdf, bucket_micros=2 * 3600 * 1_000_000).collect()
    }
    model = {
        (a, b)
        for a, s1, e1 in lrows
        for b, s2, e2 in rrows
        if s1 < e2 and s2 < e1
    }
    assert got == model


def test_interval_overlap_boundary_and_contract(spark):
    """Half-open semantics: touching endpoints do NOT overlap; an
    undersized bucket is a COST knob, not a correctness bound — every
    interval explodes into all buckets it spans, so the pair set is
    identical at any width (r07: the eager max-length guard and its
    wrong pairs-would-be-missed rationale are gone)."""
    from transe_pyspark_spark.operators.asof import interval_overlap_join

    t = lambda m: dt.datetime(2024, 4, 1, 0, m)
    ldf = spark.createDataFrame([(1, t(0), t(10))], "id long, start timestamp, end timestamp")
    rdf = spark.createDataFrame(
        [(2, t(10), t(20)), (3, t(9), t(11))], "id long, start timestamp, end timestamp"
    )
    for bucket in (3600 * 1_000_000, 60_000_000):  # 1 h and 1 min (< interval length)
        got = {
            (r["id"], r["id_r"])
            for r in interval_overlap_join(ldf, rdf, bucket_micros=bucket).collect()
        }
        assert got == {(1, 3)}  # [0,10) vs [10,20) touch but do not overlap
    with pytest.raises(ValueError, match="positive"):
        interval_overlap_join(ldf, rdf, bucket_micros=0)


def _py_morton(vals, bits):
    z = 0
    ndim = len(vals)
    for d, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * ndim + d)
    return z


def test_z_order_value_matches_python(spark):
    from transe_pyspark_spark.operators.relational import z_order_value

    rng = random.Random(53)
    rows = [(i, rng.randrange(1 << 16), rng.randrange(1 << 16)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r["id"]: r["z"]
        for r in df.select("id", z_order_value(["x", "y"]).alias("z")).collect()
    }
    assert got == {i: _py_morton((x, y), 16) for i, x, y in rows}
    with pytest.raises(ValueError, match="64-bit"):
        z_order_value(["x", "y"], bits=32)


def test_zorder_layout_locality(spark, tmp_path):
    """The point of z-ordering: every written file has a TIGHT min/max
    span on BOTH dimensions, so engine min/max skipping prunes on
    either. A linear sort by x gives tight x-spans but full-range
    y-spans; the z-sorted layout must bound both."""
    import pandas as pd

    from pyspark.sql import functions as F

    from transe_pyspark_spark.operators.relational import write_zordered_parquet

    rng = random.Random(59)
    n = 1 << 14
    side = 1 << 8  # x, y uniform in [0, 256)
    rows = [(i, rng.randrange(side), rng.randrange(side)) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    n_files = 16
    path = str(tmp_path / "zorded")
    write_zordered_parquet(df, path, ["x", "y"], n_files=n_files, bits=8)

    spans = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .toPandas()
    )
    assert len(spans) == n_files
    # 16 files over a 256×256 z-curve: each file covers ~1/16 of the
    # curve = a few 64×64 quadrant cells; both per-file spans must stay
    # well under the full 255 range (a linear x-sort yields sy ≈ 255
    # for every file). Allow generous slack for range-boundary files.
    assert spans["sx"].median() <= side // 2
    assert spans["sy"].median() <= side // 2
    assert spans["sx"].max() < side - 1 or spans["sy"].max() < side - 1

    # contrast: linear sort by x alone leaves y unclustered
    lin = str(tmp_path / "linear")
    df.repartitionByRange(n_files, "x").sortWithinPartitions("x").write.parquet(lin)
    lin_spans = (
        spark.read.parquet(lin)
        .groupBy(F.input_file_name().alias("f"))
        .agg((F.max("y") - F.min("y")).alias("sy"))
        .toPandas()
    )
    assert lin_spans["sy"].median() > spans["sy"].median()


def test_key_skew_report_hand_computed(spark):
    from transe_pyspark_spark.operators.relational import key_skew_report

    # key 1 → 6 rows, key 2 → 3 rows, key 3 → 1 row
    rows = [(1,)] * 6 + [(2,)] * 3 + [(3,)]
    df = spark.createDataFrame(rows, "k long")
    r = key_skew_report(df, "k").collect()[0]
    assert r["key_name"] == "k"
    assert r["n_rows"] == 10
    assert r["n_keys"] == 3
    assert r["max_count"] == 6
    assert r["p50_count"] == 3.0  # median of [1, 3, 6]
    assert r["top1_share"] == 0.6
    assert abs(r["avg_count"] - 10 / 3) < 1e-12
