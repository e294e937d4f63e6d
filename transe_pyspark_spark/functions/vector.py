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
