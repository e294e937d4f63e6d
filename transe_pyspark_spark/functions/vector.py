"""Vector scalar functions over ``array<float>`` columns (SURVEY §2B R15).

Re-expresses the reference's NumPy kernels — L1 distance
(``TransE.py:298-303``), squared-L2 distance (``TransE.py:304-309``,
note: NO sqrt), L2 row-normalize (``Embedding.py:21-27``) — as Catalyst
higher-order functions. These run JVM-side inside whole-stage codegen:
no Python boundary, no Arrow transfer, usable in any relational plan
(and therefore DuckDB-oracle-checkable).

All accumulation is in DOUBLE regardless of the array element type, so
results match an oracle that also sums in double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(x: Column) -> Column:
    return x.cast("double")


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _as_double(x) * _as_double(y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_sq(a: Column | str, b: Column | str) -> Column:
    """Squared L2 distance Σ(aᵢ−bᵢ)² — the reference's ``norm_l2``
    (``TransE.py:304-309``) deliberately omits the sqrt; preserved."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (_as_double(x) - _as_double(y)) * (_as_double(x) - _as_double(y))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l1(a: Column | str, b: Column | str) -> Column:
    """L1 distance Σ|aᵢ−bᵢ| (``TransE.py:298-303``)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(_as_double(x) - _as_double(y))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_l2(a: Column | str) -> Column:
    """‖a‖₂ = sqrt(Σ aᵢ²)."""
    return F.sqrt(dot(a, a))


def norm_l1(a: Column | str) -> Column:
    """‖a‖₁ = Σ|aᵢ|."""
    return F.aggregate(
        F.transform(a, lambda x: F.abs(_as_double(x))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def normalize(a: Column | str) -> Column:
    """v / ‖v‖₂ elementwise (``Embedding.py:21-27``); zero vectors pass
    through unchanged (reference would divide by zero)."""
    n = norm_l2(a)
    return F.when(n == 0.0, F.col(a) if isinstance(a, str) else a).otherwise(
        F.transform(a, lambda x: _as_double(x) / n)
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in double precision; 0 when either norm is 0."""
    denom = norm_l2(a) * norm_l2(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def add(a: Column | str, b: Column | str) -> Column:
    """Elementwise a + b (double)."""
    return F.zip_with(a, b, lambda x, y: _as_double(x) + _as_double(y))


def sub(a: Column | str, b: Column | str) -> Column:
    """Elementwise a − b (double)."""
    return F.zip_with(a, b, lambda x, y: _as_double(x) - _as_double(y))


def embedding_covariance(
    df,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
):
    """EXACT covariance matrix of an embedding column — the
    second-moment statistic behind PCA/whitening/feature-correlation
    audits (is a dimension dead? are two dimensions redundant?), as a
    DataFrame of upper-triangle entries.

    Exactness contract: embeddings quantize ONCE to micro-unit BIGINTs
    (``round(v·scale)``), so every sum of products is exact integer
    arithmetic — float covariance is summation-order-dependent and
    engines disagree in the last ulp, which breaks hash-checkable
    oracles (the ``stddev_exact`` argument, applied to d² moments at
    once). The final covariance is ONE float division per entry:
    ``cov_ij = (n·s_ij − s_i·s_j) / (n² · scale²)``, 9 dp.

    Scale path: a ``mapInPandas`` kernel computes each Arrow batch's
    d×d outer-product partial ``QᵀQ`` as one int64 matmul (d=64 ⇒
    2,080 triangle rows per ~10k-row batch — per-BATCH partials keep
    every int64 bounded by ``batch_rows·scale²·max|v|²``, no
    cross-batch accumulation to overflow) plus the per-dimension sums
    and count; Spark's partial hash aggregation then collapses each
    partition to ≤ d(d+1)/2 + d + 1 rows BEFORE the shuffle, and the
    final decimal-128 sums are exact. The corpus is touched once; the
    assembly joins are over the 2k-row aggregate.

    Returns (i, j, n, s_ij, s_i, s_j, cov) for 1-based i ≤ j — raw
    exact sums alongside the derived covariance so any downstream
    recentering/rescaling can stay exact.

    Input contract (r12 review): NULL vectors are EXCLUDED up front
    (n counts only non-null rows); vectors must be fixed-width with no
    NULL elements. The per-batch int64 bound the partials rely on is
    GUARDED, not assumed — a batch where ``rows · (scale·max|v|)² >
    2⁶²`` raises with guidance (shrink ``scale`` or the Arrow batch)
    instead of silently wrapping the "exact" sums. The ``s_ij``/``s_i``
    BIGINT casts are exact while the decimal totals fit int64 —
    ``n·(scale·max|v|)² < 2⁶³``, i.e. billions of unit-magnitude rows
    at the default scale; beyond that, pass a smaller ``scale``.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as FF

    sc = int(scale)

    def _partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            y = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) * sc
            # half-AWAY-from-zero, matching SQL round() on BOTH
            # engines: compare the exact fractional part against 0.5
            # (np.rint is half-even; adding 0.5 before floor would
            # round up doubles whose fraction is the representable
            # value just BELOW 0.5 — the float-addition artifact).
            # Exact for |y| < 2^52, far above any sane scale·|v|.
            a = np.abs(y)
            fl = np.floor(a)
            Q = np.copysign(fl + (a - fl >= 0.5), y).astype(np.int64)
            # loud overflow guard: every partial entry is bounded by
            # rows·max|q|²; past 2^62 the int64 matmul would WRAP
            # silently and the exactness contract would be a lie
            mq = float(np.abs(Q).max()) if Q.size else 0.0
            if len(Q) * mq * mq > float(2**62):
                raise ValueError(
                    f"embedding_covariance int64 partial bound exceeded: "
                    f"{len(Q)} rows x (max|q|={mq:.3g})^2 > 2^62 — reduce "
                    "`scale` or spark.sql.execution.arrow.maxRecordsPerBatch"
                )
            m = Q.T @ Q
            iu, ju = np.triu_indices(Q.shape[1])
            out = pd.DataFrame(
                {"i": iu + 1, "j": ju + 1, "s": m[iu, ju]}
            )
            marg = pd.DataFrame(
                {
                    "i": np.arange(1, Q.shape[1] + 1),
                    "j": 0,
                    "s": Q.sum(axis=0),
                }
            )
            cnt = pd.DataFrame({"i": [0], "j": [0], "s": [len(Q)]})
            yield pd.concat([out, marg, cnt], ignore_index=True)

    parts = (
        df.select(vec_col)
        .filter(FF.col(vec_col).isNotNull())
        .mapInPandas(_partials, "i long, j long, s long")
    )
    agg = (
        parts.groupBy("i", "j")
        .agg(FF.sum(FF.col("s").cast("decimal(38,0)")).alias("__s"))
        .localCheckpoint(eager=True)  # ≤ d(d+1)/2 + d + 1 rows, 3 consumers
    )
    n = FF.broadcast(
        agg.filter((FF.col("i") == 0) & (FF.col("j") == 0)).select(
            FF.col("__s").cast("long").alias("__n")
        )
    )
    marg = agg.filter((FF.col("j") == 0) & (FF.col("i") > 0)).select(
        FF.col("i").alias("__mi"), FF.col("__s").cast("long").alias("__msum")
    )
    tri = agg.filter(FF.col("j") > 0)

    def d38(c):
        return c.cast("decimal(38,0)")

    return (
        tri.join(
            FF.broadcast(marg.select(FF.col("__mi").alias("i"), FF.col("__msum").alias("__si"))),
            "i",
        )
        .join(
            FF.broadcast(marg.select(FF.col("__mi").alias("j"), FF.col("__msum").alias("__sj"))),
            "j",
        )
        .crossJoin(n)
        .select(
            "i",
            "j",
            FF.col("__n").alias("n"),
            FF.col("__s").cast("long").alias("s_ij"),
            FF.col("__si").alias("s_i"),
            FF.col("__sj").alias("s_j"),
            FF.round(
                (d38(FF.col("__n")) * FF.col("__s") - d38(FF.col("__si")) * d38(FF.col("__sj")))
                .cast("double")
                / (d38(FF.col("__n")) * d38(FF.col("__n"))).cast("double")
                / float(sc) ** 2,
                9,
            ).alias("cov"),
        )
    )
