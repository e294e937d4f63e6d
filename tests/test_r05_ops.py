"""Property tests for the r05 operators: batch sessionization, SCD2
merge, and bigram familiarity — each compared against an independent
pure-Python model (the DuckDB oracle covers the fixture shapes; these
cover edges the fixtures don't hit)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F


def _python_sessionize(rows, gap_s):
    """(user, ts_µs, event_id, value) → {(user, seq): [rows]}"""
    out = {}
    by_user = {}
    for r in rows:
        by_user.setdefault(r[0], []).append(r)
    for u, rs in by_user.items():
        rs.sort(key=lambda r: (r[1], r[2]))
        seq = 0
        prev = None
        for r in rs:
            if prev is None or r[1] - prev > gap_s * 1_000_000:
                seq += 1
            prev = r[1]
            out.setdefault((u, seq), []).append(r)
    return out


def test_sessionize_matches_python_model(spark):
    rng = random.Random(7)
    base = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(400):
        u = rng.randrange(8)
        ts = base + dt.timedelta(seconds=rng.randrange(0, 3 * 86400), microseconds=rng.randrange(1_000_000))
        rows.append((u, ts, i, round(rng.uniform(0, 50), 2)))
    # duplicate-timestamp edge: same user, same ts, distinct event ids
    rows.append((1, rows[0][1], 9001, 1.0))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, value double")

    from transe_pyspark_spark.operators.asof import sessionize

    got = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["sum_value_cents"],
                                           r["session_start"], r["session_end"])
        for r in sessionize(df, gap_seconds=3600, agg_value_col="value").collect()
    }
    model = _python_sessionize(
        [(u, int(ts.timestamp() * 1_000_000), e, v) for u, ts, e, v in rows], 3600
    )
    assert set(got) == set(model)
    for key, rs in model.items():
        n, cents, start, end = got[key]
        assert n == len(rs)
        assert cents == sum(round(r[3] * 100) for r in rs)
        assert int(start.timestamp() * 1_000_000) == min(r[1] for r in rs)
        assert int(end.timestamp() * 1_000_000) == max(r[1] for r in rs)


def test_scd2_merge_invariants(spark):
    from transe_pyspark_spark.operators.relational import scd2_merge

    dim = spark.createDataFrame(
        [
            # key 1: open, will change; key 2: open, unchanged snapshot;
            # key 3: open, absent from changes; key 4: already-closed history
            (1, 100, "A", dt.date(2024, 1, 1), None),
            (2, 200, "B", dt.date(2024, 1, 1), None),
            (3, 300, "C", dt.date(2024, 1, 1), None),
            (4, 400, "D", dt.date(2023, 1, 1), dt.date(2024, 1, 1)),
            (4, 410, "D", dt.date(2024, 1, 1), None),
            # key 6: NULL attribute transitioning to a value — must count as a change
            (6, None, "F", dt.date(2024, 1, 1), None),
        ],
        "k long, bal long, seg string, valid_from date, valid_to date",
    )
    changes = spark.createDataFrame(
        [(1, 150, "A"), (2, 200, "B"), (5, 500, "E"), (6, 600, "F")],
        "k long, bal long, seg string",
    )
    eff = F.to_date(F.lit("2024-06-01"))
    out = scd2_merge(dim, changes, ["k"], ["bal", "seg"], eff).collect()
    rows = {(r["k"], r["bal"], str(r["valid_from"]), str(r["valid_to"])) for r in out}
    assert rows == {
        (1, 100, "2024-01-01", "2024-06-01"),   # closed
        (1, 150, "2024-06-01", "None"),          # new version
        (2, 200, "2024-01-01", "None"),          # no-op stays open
        (3, 300, "2024-01-01", "None"),          # untouched key stays open
        (4, 400, "2023-01-01", "2024-01-01"),   # history passes through
        (4, 410, "2024-01-01", "None"),
        (5, 500, "2024-06-01", "None"),          # brand-new key
        (6, None, "2024-01-01", "2024-06-01"),  # NULL→600 is a change
        (6, 600, "2024-06-01", "None"),
    }
    # exactly one open row per live key
    open_by_key = {}
    for r in out:
        if r["valid_to"] is None:
            open_by_key[r["k"]] = open_by_key.get(r["k"], 0) + 1
    assert all(v == 1 for v in open_by_key.values())


def test_bigram_familiarity_matches_python(spark):
    docs = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat"),
        (2, "zzz qqq"),          # unique bigram: familiarity 1.0
        (3, "one"),              # < 2 words: dropped
        (4, "The CAT sat"),      # case-folds onto doc 1's bigrams
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    from transe_pyspark_spark.functions.text import bigram_familiarity

    got = {r["doc_id"]: (r["n_bigrams"], r["sum_freq"]) for r in bigram_familiarity(df).collect()}

    from collections import Counter

    grams = {}
    for i, t in docs:
        ws = t.lower().split()
        grams[i] = [" ".join(ws[j:j + 2]) for j in range(len(ws) - 1)]
    lm = Counter(g for gs in grams.values() for g in gs)
    expect = {
        i: (len(gs), sum(lm[g] for g in gs)) for i, gs in grams.items() if gs
    }
    assert got == expect
    assert 3 not in got


def test_heavy_hitters_exactness(spark):
    """Skewed synthetic stream: the candidate pass must not lose any
    true heavy hitter across partition layouts, and the verified output
    must equal the exact answer."""
    rng = random.Random(11)
    items = (
        ["alpha"] * 400 + ["beta"] * 150 + ["gamma"] * 60
        + [f"tail{i}" for i in range(2000) for _ in (0,)]
    )
    rng.shuffle(items)
    from collections import Counter

    exact = Counter(items)
    n = len(items)
    phi = 0.02
    want = {(k, v) for k, v in exact.items() if v > phi * n}
    for parts in (1, 7, 32):
        df = spark.createDataFrame([(x,) for x in items], "token string").repartition(parts)
        from transe_pyspark_spark.operators.relational import heavy_hitters

        got = {(r["item"], r["n"]) for r in heavy_hitters(df, "token", phi=phi).collect()}
        assert got == want, f"parts={parts}"


def test_heavy_hitters_all_unique_adversarial(spark):
    """The r05 local pass accumulated an exact value_counts over the
    whole partition — O(distinct) memory. The Misra-Gries pass must
    stay exact on the adversarial shape that broke that claim: a
    high-cardinality all-unique tail (40k distinct across few
    partitions, multiple small Arrow batches each) hiding a handful of
    true heavy hitters, with nulls sprinkled in (excluded by
    contract)."""
    from transe_pyspark_spark.operators.relational import heavy_hitters

    items = ["hot"] * 3000 + ["warm"] * 1500 + [f"u{i}" for i in range(40_000)]
    items += [None] * 100  # NULLs excluded by contract
    n = len(items) - 100
    phi = 0.02
    want = {("hot", 3000), ("warm", 1500)}
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
    try:
        df = spark.createDataFrame([(x,) for x in items], "token string").repartition(4)
        got = {(r["item"], r["n"]) for r in heavy_hitters(df, "token", phi=phi).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == want
    assert all(v > phi * n for _, v in got)


def test_mg_summary_bounded_and_superset():
    """Direct unit test of the Misra-Gries fold: the summary never
    exceeds k counters after any batch, and every item with true
    partition count > n_p/(k+1) survives with a positive estimate no
    more than n_p/(k+1) below its true count."""
    import pandas as pd

    from transe_pyspark_spark.operators.relational import _mg_shrink, _mg_summary

    rng = random.Random(3)
    stream = ["a"] * 900 + ["b"] * 400 + [f"t{i}" for i in range(5000)]
    rng.shuffle(stream)
    k = 50
    n_p = len(stream)
    batches = [
        pd.DataFrame({"item": stream[i:i + 500]}) for i in range(0, n_p, 500)
    ]
    # bound holds after every prefix of batches
    for end in range(1, len(batches) + 1):
        assert len(_mg_summary(batches[:end], k)) <= k
    summary = _mg_summary(batches, k)
    exact = {"a": 900, "b": 400}
    for item, true_n in exact.items():
        assert true_n > n_p / (k + 1)
        est = summary.get(item, 0)
        assert 0 < est <= true_n
        assert true_n - est <= n_p / (k + 1)
    # shrink is a no-op at or under the cap
    s = pd.Series({"x": 5, "y": 3})
    assert _mg_shrink(s, 2).to_dict() == {"x": 5, "y": 3}


def test_token_budget_sample_stable_under_repartition(spark):
    rows = [(i, ["en", "de"][i % 2], f"doc {i} " + "w " * (i % 17)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    from transe_pyspark_spark.functions.text import word_count
    from transe_pyspark_spark.operators.relational import token_budget_sample

    budgets = {"en": 250, "de": 120}

    def run(d):
        out = token_budget_sample(d, "lang", word_count("text"), budgets)
        return {(r["doc_id"], r["lang"], r["n_tokens"], r["cum_tokens"]) for r in out.collect()}

    a = run(df)
    b = run(df.repartition(13))
    assert a == b and len(a) > 0
    # budgets respected per stratum
    for lang, cap in budgets.items():
        tot = sum(t for (_, l, t, _) in a if l == lang)
        assert tot <= cap


def test_equi_depth_histogram_edges(spark):
    from transe_pyspark_spark.operators.relational import equi_depth_histogram

    # all-equal column: every boundary equals the value, all rows land
    # in the top bucket (>= sends ties up) — one bucket, full count
    same = spark.createDataFrame([(5,)] * 100, "v long")
    rows = equi_depth_histogram(same, "v", n_buckets=4).collect()
    assert len(rows) == 1 and rows[0]["n"] == 100 and rows[0]["bucket"] == 3

    # uniform ints: buckets within ±1 of equal depth
    uni = spark.createDataFrame([(i,) for i in range(1000)], "v long")
    out = {r["bucket"]: r["n"] for r in equi_depth_histogram(uni, "v", n_buckets=8).collect()}
    assert len(out) == 8
    assert all(abs(n - 125) <= 1 for n in out.values()), out
    # approx variant returns the same bucket count on uniform data
    out2 = equi_depth_histogram(uni, "v", n_buckets=8, exact=False).collect()
    assert len(out2) == 8


def test_decode_image_bytes_stdlib_formats():
    """Pure-stdlib decode: PPM/PGM headers + pixel stats parsed from
    bytes (including multi-digit dims and newline bytes inside the
    pixel array), a hand-crafted BMP with row padding, truncated-PPM
    rejection, and the documented NotImplementedError for compressed
    formats when Pillow is absent."""
    import struct

    from transe_pyspark_spark.operators.multimodal import decode_image_bytes

    # PPM 12x10, pixels all 0x0A (the newline byte — must not confuse the split)
    ppm = b"P6\n12 10\n255\n" + bytes([10]) * (12 * 10 * 3)
    d = decode_image_bytes(ppm)
    assert (d["fmt"], d["width"], d["height"], d["channels"]) == ("ppm", 12, 10, 3)
    assert d["n_pixel_bytes"] == 360 and d["mean_pixel"] == 10

    # PGM single-channel
    pgm = b"P5\n3 2\n255\n" + bytes([7, 7, 7, 9, 9, 9])
    d = decode_image_bytes(pgm)
    assert (d["fmt"], d["width"], d["height"], d["channels"]) == ("pgm", 3, 2, 1)
    assert d["mean_pixel"] == 8

    # BMP 3x2 24bpp: rows pad to 4 bytes (3*3=9 -> 12)
    row = bytes([5] * 9) + bytes([0] * 3)
    pixel_data = row * 2
    off = 54
    header = (
        b"BM" + struct.pack("<IHHI", off + len(pixel_data), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    )
    d = decode_image_bytes(header + pixel_data)
    assert (d["fmt"], d["width"], d["height"], d["channels"]) == ("bmp", 3, 2, 3)
    assert d["n_pixel_bytes"] == 24

    # truncated PPM pixel array
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_image_bytes(b"P6\n4 4\n255\n" + b"\x00" * 10)

    # compressed format without Pillow -> documented NotImplementedError
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with _pytest.raises(NotImplementedError):
            decode_image_bytes(b"\xff\xd8\xff\xe0JFIF-not-really")


def test_encode_decode_ppm_roundtrip(spark):
    """encode_ppm -> decode_media recovers the generator formula for
    every row — the end-to-end contract the multimodal_decode oracle
    hash-checks at fixture scale."""
    from transe_pyspark_spark.operators.multimodal import decode_media, encode_ppm

    ids = [0, 1, 15, 16, 255, 256, 1000]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: r.asDict() for r in decode_media(encode_ppm(df)).collect()}
    for i in ids:
        w, h, v = 8 + i % 16, 8 + i % 13, i % 256
        r = got[i]
        assert (r["fmt"], r["width"], r["height"], r["channels"]) == ("ppm", w, h, 3)
        assert r["n_pixel_bytes"] == w * h * 3
        assert r["mean_pixel"] == v


def test_sample_exact_k_deterministic(spark):
    from transe_pyspark_spark.operators.relational import sample_exact_k

    rows = [(i, f"d{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, name string")

    def run(d, k):
        return [
            (r["doc_id"], r["name"])
            for r in sample_exact_k(d, "doc_id", k=k).collect()
        ]

    a = run(df, 40)
    b = run(df.repartition(17), 40)
    assert len(a) == 40 and sorted(a) == sorted(b)
    # prefix property: the k=10 sample is a subset of the k=40 sample
    assert set(run(df, 10)) <= set(a)
    # exact-k even when k > n
    assert len(run(df, 1000)) == 500


def test_cross_doc_ngram_dup_matches_python(spark):
    docs = [
        (0, "a b c d e f g"),        # shares 5-gram "a b c d e" with doc 1
        (1, "a b c d e x y"),
        (2, "p q r s t u"),          # unique grams
        (3, "too short"),            # < 5 words: dropped
        (4, "A B C D E f g"),        # case-folds onto docs 0/1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    from transe_pyspark_spark.functions.text import cross_doc_ngram_dup

    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"])
        for r in cross_doc_ngram_dup(df, n=5).collect()
    }

    grams = {}
    for i, t in docs:
        ws = t.lower().split()
        grams[i] = [" ".join(ws[j:j + 5]) for j in range(len(ws) - 4)]
    from collections import defaultdict

    docs_per_gram = defaultdict(set)
    for i, gs in grams.items():
        for g in gs:
            docs_per_gram[g].add(i)
    expect = {
        i: (len(gs), sum(1 for g in gs if len(docs_per_gram[g]) > 1))
        for i, gs in grams.items()
        if gs
    }
    assert got == expect
    assert 3 not in got
    assert got[2][1] == 0 and got[0][1] > 0
