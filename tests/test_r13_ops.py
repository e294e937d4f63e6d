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
