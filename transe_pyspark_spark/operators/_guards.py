"""Guard rails for operators whose cost is quadratic in the input.

The exact pairwise operators (``jaccard_pairs``, ``cosine_pairs``) exist
as oracle-checkable ground truth for the LSH/ANN scale paths — an O(n²)
self-join is fine on a bounded fixture and catastrophic on a 100 TB
corpus. The guard makes the scale path the only *unflagged* door: a call
on an input above the row bound raises unless the caller explicitly
acknowledges the cost with ``allow_quadratic=True``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# 10k rows ⇒ ≤ 50M scored pairs — seconds on a cluster, the upper end of
# what "ground truth fixture" plausibly means. Everything larger should
# go through MinHash-LSH / SimHash / ANN.
QUADRATIC_ROW_LIMIT = 10_000


def require_bounded_input(df: DataFrame, allow_quadratic: bool, op_name: str) -> None:
    """Raise if ``df`` is too large for an O(n²) pairwise operator.

    The check costs one count job (cheap: column-pruned scan). Skipped
    entirely when the caller passed ``allow_quadratic=True``.
    """
    if allow_quadratic:
        return
    n = df.count()
    if n > QUADRATIC_ROW_LIMIT:
        raise ValueError(
            f"{op_name} scores all O(n²) pairs and the input has {n} rows "
            f"(> {QUADRATIC_ROW_LIMIT}). Use the bucketed scale path "
            "(minhash_lsh_pairs / simhash_pairs / ann_lsh / ann_ivf), or "
            "pass allow_quadratic=True if the input really is a bounded "
            "ground-truth fixture."
        )
