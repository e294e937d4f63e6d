"""Round-12 regression tests — the five r11 ADVICE fixes.

1. ``_two_sample_value_prefix`` (ks/wasserstein/mannwhitney) excludes
   NULL values up front (Spark's NULLS FIRST vs the oracle's NULLS
   LAST would silently diverge inside the cumsum machinery).
2. ``runs_test`` returns z NULL when the variance is zero
   (n_plus = n_minus = 1), not NaN.
3. ``mutual_information`` / ``chi2_independence`` exclude NULL-keyed
   rows from BOTH the cells and N (before the fix the NULL cell's term
   vanished from the sum while n_rows still counted its rows).
4. ``multires_rollup`` validates that adjacent levels nest — ISO weeks
   straddle month boundaries, so week→month/quarter/year chains raise
   instead of silently mis-bucketing.
5. ``hybrid_rrf_fuse`` passes doc_id through untouched (no silent
   long cast that nulls non-numeric ids onto a collapsed join key) and
   fuses with exact BIGINT ``div``.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------- two-sample NULL discipline


def test_two_sample_suite_ignores_null_values(spark):
    """NULL values must not enter the rank machinery: each statistic
    over data-with-NULLs equals the same statistic over the NULL-free
    subset (ADVICE r11)."""
    from transe_pyspark_spark.operators.relational import (
        ks_statistic,
        mannwhitney_u,
        wasserstein_1d,
    )

    clean = [("a", v) for v in (1, 3, 5, 7)] + [("b", v) for v in (2, 4, 6)]
    noisy = clean + [("a", None), ("b", None), ("a", None)]
    df_c = spark.createDataFrame(clean, "g string, v long")
    df_n = spark.createDataFrame(noisy, "g string, v long")
    for fn in (ks_statistic, wasserstein_1d, mannwhitney_u):
        rc = fn(df_c, "g", "v", "a", "b").collect()[0]
        rn = fn(df_n, "g", "v", "a", "b").collect()[0]
        assert rn == rc, f"{fn.__name__} changed under NULL values"
        assert rn["n_a"] == 4 and rn["n_b"] == 3  # NULLs not counted


# ------------------------------------------------ runs_test variance guard


def test_runs_test_z_null_when_variance_zero(spark):
    """n_plus = n_minus = 1 gives sigma^2 = 0: z must be NULL (the
    docstring contract), never NaN from 0/0 (ADVICE r11)."""
    from transe_pyspark_spark.operators.relational import runs_test

    # median element 5 drops; 1 -> '-', 9 -> '+': one run each side
    df = spark.createDataFrame([(1, 1), (2, 5), (3, 9)], "t long, x long")
    r = runs_test(df, "t", "x").collect()[0]
    assert (r["n_plus"], r["n_minus"], r["n_runs"]) == (1, 1, 2)
    assert r["z"] is None


def test_runs_test_z_defined_when_variance_positive(spark):
    """The guard must not over-fire: a 2-vs-1 split has sigma^2 > 0 and
    z must come back non-NULL and finite."""
    from transe_pyspark_spark.operators.relational import runs_test

    # median 4 drops; signs ordered by t: -, +, + -> a=2, b=1, R=2
    df = spark.createDataFrame(
        [(1, 1), (2, 4), (3, 9), (4, 8)], "t long, x long"
    )
    r = runs_test(df, "t", "x").collect()[0]
    assert (r["n_plus"], r["n_minus"], r["n_runs"]) == (2, 1, 2)
    a, b, rr = 2.0, 1.0, 2.0
    mu = 1 + 2 * a * b / (a + b)
    sig2 = (2 * a * b * (2 * a * b - a - b)) / ((a + b) ** 2 * (a + b - 1))
    assert r["z"] == pytest.approx(round((rr - mu) / math.sqrt(sig2), 6))


# --------------------------------------- MI / chi2 NULL-category contract


def test_mutual_information_excludes_null_categories(spark):
    """Rows with a NULL facet are excluded from cells AND from N —
    MI over data-with-NULLs equals MI over the non-NULL subset, and
    n_rows counts only included rows (ADVICE r11: before the fix the
    NULL cell's term vanished while N still counted it)."""
    from transe_pyspark_spark.operators.relational import mutual_information

    clean = [("a", 1), ("a", 2), ("b", 1), ("b", 2), ("a", 1), ("b", 2)]
    noisy = clean + [(None, 1), ("a", None), (None, None)]
    df_c = spark.createDataFrame(clean, "x string, y long")
    df_n = spark.createDataFrame(noisy, "x string, y long")
    rc = mutual_information(df_c, F.col("x"), F.col("y")).collect()[0]
    rn = mutual_information(df_n, F.col("x"), F.col("y")).collect()[0]
    assert rn == rc
    assert rn["n_rows"] == len(clean)


def test_chi2_excludes_null_categories(spark):
    """Same contract for the chi2 grid: NULL-keyed rows neither
    zero-fill as observed cells nor inflate N (ADVICE r11)."""
    from transe_pyspark_spark.operators.relational import chi2_independence

    clean = [("a", "u"), ("a", "v"), ("b", "u"), ("b", "v"), ("a", "u")]
    noisy = clean + [(None, "u"), ("b", None)]
    df_c = spark.createDataFrame(clean, "x string, y string")
    df_n = spark.createDataFrame(noisy, "x string, y string")
    rc = chi2_independence(df_c, F.col("x"), F.col("y")).collect()[0]
    rn = chi2_independence(df_n, F.col("x"), F.col("y")).collect()[0]
    assert rn == rc
    assert rn["n_rows"] == len(clean)


# ------------------------------------------- rollup nesting validation


def test_multires_rollup_rejects_non_nesting_chains(spark):
    """ISO weeks straddle month boundaries: any week→coarser chain must
    raise instead of folding a cross-boundary week's events into the
    wrong month (ADVICE r11)."""
    from transe_pyspark_spark.operators.relational import multires_rollup

    ev = spark.createDataFrame(
        [("2024-01-31 10:00:00", 100)], "ts string, c long"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "c")
    for bad in (("day", "week", "month"), ("week", "month"), ("hour", "week", "year")):
        with pytest.raises(ValueError, match="does not nest"):
            multires_rollup(ev, "ts", F.col("c"), bad)
    with pytest.raises(ValueError, match="unknown level"):
        multires_rollup(ev, "ts", F.col("c"), ("second", "minute"))


def test_multires_rollup_accepts_nesting_chains(spark):
    """The validator must not over-fire: the calendar chains that DO
    nest (day⊂week as coarsest, day⊂month⊂quarter⊂year) still run, and
    the week level sums to the raw total."""
    from transe_pyspark_spark.operators.relational import multires_rollup

    ev = spark.createDataFrame(
        [("2024-01-31 10:00:00", 100), ("2024-02-01 09:00:00", 50)],
        "ts string, c long",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "c")
    for good in (("hour", "day", "week"), ("day", "month", "quarter", "year")):
        out = multires_rollup(ev, "ts", F.col("c"), good)
        rows = out.collect()
        lv = {r["level"] for r in rows}
        assert lv == set(good)
        coarsest = [r for r in rows if r["level"] == good[-1]]
        assert sum(r["value_cents"] for r in coarsest) == 150


# ------------------------------------------------ RRF doc_id passthrough


def test_hybrid_rrf_preserves_nonnumeric_doc_ids(spark):
    """doc_id passes through untouched: string ids fuse correctly
    instead of casting to NULL and collapsing onto one join key
    (ADVICE r11)."""
    from transe_pyspark_spark.operators.similarity import hybrid_rrf_fuse

    text = spark.createDataFrame(
        [("q0", "doc-a", 1), ("q0", "doc-b", 2)],
        "query_id string, doc_id string, rank long",
    )
    vec = spark.createDataFrame(
        [("q0", "doc-b", 1), ("q0", "doc-c", 2)],
        "query_id string, doc_id string, rank long",
    )
    got = {
        r["doc_id"]: (r["rank"], r["rrf_nano"], r["in_text"], r["in_vector"])
        for r in hybrid_rrf_fuse(text, vec, k=10).collect()
    }
    r61, r62 = 10**9 // 61, 10**9 // 62
    assert got == {
        "doc-b": (1, r61 + r62, True, True),
        "doc-a": (2, r61, True, False),
        "doc-c": (3, r62, False, True),
    }


# --------------------------------------- multimodal oracle upgrades (ask #8)


def test_extract_features_exact_matches_python_replay(spark):
    """Hash-exact features replay bit-for-bit in pure Python over the
    closed-form PPM payloads: BIGINT bin counts, half-away-from-zero
    per-term nano entropy summed in bin order (the oracle's exact
    expression), n_bytes = header + w*h*3."""
    import math

    from transe_pyspark_spark.operators.multimodal import (
        encode_ppm,
        extract_features_exact,
    )

    ids = [0, 1, 7, 255, 256, 1013]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: (r["n_bytes"], r["bin_counts"], r["entropy_nano"])
        for r in extract_features_exact(encode_ppm(df)).collect()
    }
    for i in ids:
        w, h, v = 8 + i % 16, 8 + i % 13, i % 256
        payload = b"P6\n%d %d\n255\n" % (w, h) + bytes([v]) * (w * h * 3)
        counts = [0] * 16
        for b in payload:
            counts[b >> 4] += 1
        n = len(payload)
        ent = sum(
            int(math.floor(-(c / n) * math.log2(c / n) * 1e9 + 0.5))
            for c in counts
            if c
        )
        assert got[i] == (n, counts, ent), f"doc {i}"


def test_frame_checksums_match_python_replay(spark):
    """Frame explode + checksum reduction replay against a pure-Python
    slicing model: every doc yields >=2 frames at the face's
    (every=8, frame_size=16) stride, frame 0 carries the header, the
    last frame is partial."""
    from transe_pyspark_spark.operators.multimodal import (
        encode_ppm,
        frame_checksums,
        sample_frames,
    )

    ids = [0, 3, 12, 999]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = frame_checksums(sample_frames(encode_ppm(df), every=8, frame_size=16))
    got = {
        (r["doc_id"], r["frame_no"]): (r["frame_len"], r["frame_byte_sum"])
        for r in out.collect()
    }
    n_frames = {}
    for i in ids:
        w, h, v = 8 + i % 16, 8 + i % 13, i % 256
        payload = b"P6\n%d %d\n255\n" % (w, h) + bytes([v]) * (w * h * 3)
        frames = [payload[s : s + 16] for s in range(0, len(payload), 128)]
        n_frames[i] = len(frames)
        assert len(frames) >= 2
        for k, fr in enumerate(frames):
            assert got[(i, k)] == (len(fr), sum(fr)), f"doc {i} frame {k}"
    assert len(got) == sum(n_frames.values())


# ----------------------------------------------- PassJoin d>=3 (ask #7)


# shared with the symmetric-delete suite -- one brute-force model, no
# drift between the two edit-join test families
from test_r11_ops import _py_levenshtein as _levenshtein  # noqa: E402


def test_passjoin_matches_bruteforce_d3(spark):
    """PassJoin at d=3 returns EXACTLY the brute-force pair set on a
    fixture exercising substitutions, indels, length skew, equal-length
    pairs (both orientations generated, deduped), and short strings
    (< d+1 chars, the length-bucket path)."""
    from transe_pyspark_spark.operators.linkage import passjoin_pairs

    names = [
        "johnathan smith", "jonathan smith", "jonathan smyth", "johnathan smithe",
        "maria garcia", "mario garcia", "marla garcias", "m garcia",
        "ab", "abc", "a", "abcd", "xyz", "", "",
        "chartreuse lace", "chartreuse lime", "chocolate lace",
        "pufy", "puffy", "fluffy", "spiffy",
    ]
    rows = [(i, nm) for i, nm in enumerate(names)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in passjoin_pairs(df, "id", "name", max_distance=3).collect()
    }
    want = set()
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            dd = _levenshtein(names[i], names[j])
            if dd <= 3:
                want.add((i, j, dd))
    assert got == want


def test_passjoin_matches_symmetric_delete_at_d2(spark):
    """Family cross-check: at d=2 PassJoin and the SymSpell deletion
    join must return the identical exact pair set."""
    from transe_pyspark_spark.operators.linkage import (
        passjoin_pairs,
        symmetric_delete_pairs,
    )

    names = ["widget", "wldget", "wadgets", "gadget", "gizmo", "gismo", "bolt", "bolts"]
    df = spark.createDataFrame(
        [(i, nm) for i, nm in enumerate(names)], "id long, name string"
    )
    a = {tuple(r) for r in passjoin_pairs(df, "id", "name", max_distance=2).collect()}
    b = {tuple(r) for r in symmetric_delete_pairs(df, "id", "name", max_distance=2).collect()}
    assert a == b and a  # non-empty fixture


def test_passjoin_even_partition_is_complete(spark):
    """Property sweep: random mutated pairs at radius exactly d are
    always found (segments + position window cover every alignment),
    across d in {1, 3, 4} and string lengths straddling the partition
    boundaries (len % (d+1) hitting every residue)."""
    import random

    from transe_pyspark_spark.operators.linkage import passjoin_pairs

    rng = random.Random(12)
    alpha = "abcdefg"
    rows, expect = [], set()
    rid = 0
    for d in (1, 3, 4):
        for base_len in range(d + 1, d + 10):
            s = "".join(rng.choice(alpha) for _ in range(base_len))
            t = list(s)
            for _ in range(d):
                op = rng.choice("sid")
                if op == "s" and t:
                    k = rng.randrange(len(t))
                    t[k] = rng.choice(alpha)
                elif op == "i":
                    t.insert(rng.randrange(len(t) + 1), rng.choice(alpha))
                elif t:
                    del t[rng.randrange(len(t))]
            rows.append((rid, s, d))
            rows.append((rid + 1, "".join(t), d))
            rid += 2
    for d in (1, 3, 4):
        sub = [(i, nm) for i, nm, dd in rows if dd == d]
        df = spark.createDataFrame(sub, "id long, name string")
        got = {
            (r["id_a"], r["id_b"])
            for r in passjoin_pairs(df, "id", "name", max_distance=d).collect()
        }
        # every mutated twin is within d by construction
        want_pairs = {
            (sub[k][0], sub[k + 1][0])
            for k in range(0, len(sub), 2)
            if _levenshtein(sub[k][1], sub[k + 1][1]) <= d  # deletions may cancel
        }
        missing = want_pairs - got
        assert not missing, f"d={d}: PassJoin missed true pairs {missing}"
        # and nothing spurious: every reported pair verifies
        byid = dict(sub)
        for ia, ib in got:
            assert _levenshtein(byid[ia], byid[ib]) <= d


# ----------------------------------- r12 self-review hardening fixes


def test_top_event_paths_excludes_null_types(spark):
    """concat_ws silently skips NULLs, so NULL-typed events must be
    excluded: [A,B,NULL] and [A,NULL,B] windows no longer conflate,
    and path counts match the same data with NULL-typed rows removed
    (r12 review)."""
    from transe_pyspark_spark.operators.sequences import top_event_paths

    rows = [
        (1, "u1", "A", "2024-01-01 00:00:01"),
        (2, "u1", "B", "2024-01-01 00:00:02"),
        (3, "u1", None, "2024-01-01 00:00:03"),
        (4, "u1", "C", "2024-01-01 00:00:04"),
        (5, "u2", "A", "2024-01-01 00:00:01"),
        (6, "u2", None, "2024-01-01 00:00:02"),
        (7, "u2", "B", "2024-01-01 00:00:03"),
        (8, "u2", "C", "2024-01-01 00:00:04"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts string"
    ).select("event_id", "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))
    got = {(r["path"], r["n"]) for r in top_event_paths(df, path_len=3, top_k=10).collect()}
    # over non-null sequences: u1 -> A,B,C ; u2 -> A,B,C: one window each
    assert got == {("A>B>C", 2)}


def test_eventually_follows_excludes_null_basket_keys(spark):
    """A NULL-keyed basket must not inflate n_from while being
    unjoinable: results equal the same data with NULL-keyed rows
    removed (r12 review)."""
    from transe_pyspark_spark.operators.sequences import eventually_follows

    clean = [
        ("u1", "A", "2024-01-01 00:00:01"),
        ("u1", "B", "2024-01-01 00:00:02"),
        ("u2", "A", "2024-01-01 00:00:01"),
        ("u2", "B", "2024-01-01 00:00:02"),
    ]
    noisy = clean + [(None, "A", "2024-01-01 00:00:01"), ("u3", None, "2024-01-01 00:00:02")]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "user_id string, event_type string, ts string"
    ).select("user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))
    fc = eventually_follows(mk(clean), ["user_id"], "event_type", "ts").collect()
    fn = eventually_follows(mk(noisy), ["user_id"], "event_type", "ts").collect()
    key = lambda r: (r["t_from"], r["t_to"])  # noqa: E731
    assert sorted(map(tuple, fc)) == sorted(map(tuple, fn))
    ab = [r for r in fn if key(r) == ("A", "B")][0]
    assert ab["n_from"] == 2 and ab["n_baskets"] == 2  # NULL basket not counted


def test_embedding_covariance_skips_null_vectors_and_guards_overflow(spark):
    """NULL embedding rows are excluded (n counts only non-null rows)
    instead of crashing the Arrow kernel; a batch violating the int64
    partial bound raises loudly instead of wrapping (r12 review)."""
    import pytest as _pytest

    from transe_pyspark_spark.functions.vector import embedding_covariance

    rows = [(1, [1.0, 2.0]), (2, None), (3, [3.0, 4.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {(r["i"], r["j"]): r for r in embedding_covariance(df).collect()}
    assert out[(1, 1)]["n"] == 2  # the NULL row is gone
    # exact moments over the two live rows at scale=1e6
    assert out[(1, 2)]["s_ij"] == (10**6 * 2 * 10**6) + (3 * 10**6 * 4 * 10**6)
    # overflow guard: |v| big enough that rows*(scale*|v|)^2 > 2^62
    big = spark.createDataFrame(
        [(1, [4000.0, 0.0]), (2, [4000.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(Exception, match="partial bound exceeded"):
        embedding_covariance(big).collect()
