"""Iterative graph analytics on edge DataFrames (beyond-reference
north-star ops; the dedup suite's connected components —
``operators/dedup.py:connected_components`` — is the other member of
this family).

PageRank here is EXACT-INTEGER: ranks live in micro-units (1.0 =
1,000,000) and every step uses integer division, so the result is a
pure function of the edge set — reproducible on any engine, any
partitioning, any summation order. Floating-point PageRank is not:
``sum(double)`` over a node's in-edges is order-dependent, and engines
disagree in the last ulp, which breaks hash-checkable oracles. The
integer formulation trades ≤1 micro-unit of per-step rounding for
bit-exact determinism — the same trade the repo's money aggregates
make with integer cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rank scale: 1.0 == 1_000_000 micro-units
SCALE = 1_000_000


def pagerank_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Exact-integer PageRank over a directed edge list:
    ``r'(v) = (100−d)·SCALE/100 + d · Σ_{(u,v)∈E} (r(u) div outdeg(u)) / 100``
    with every operation on BIGINTs (``div`` = integer division), run
    for a fixed ``iterations``. All ranks start at ``SCALE``.

    Contract: every node must have at least one OUT-edge (no dangling
    nodes) — callers with dangling nodes add self-loops or reverse
    edges first (the bipartite trading-graph face materializes both
    directions, which guarantees this). Nodes with no IN-edges would
    converge to the teleport term; with bidirectional edges every node
    has both.

    Scale posture per iteration: one equi-join of the rank table
    against the edge list on the source key (both hash-partition on
    the node id — the rank table is REBUILT keyed on dst each step, so
    successive iterations reuse the same key domain), one hash
    aggregate on the destination. Nothing is ever quadratic; the rank
    state is one row per node. Lineage grows linearly with
    iterations, so every ``checkpoint_every`` steps the rank frame is
    localCheckpoint'ed (eager) — the same truncation
    ``connected_components`` uses for its propagation loop; without it
    a 50-iteration plan re-analyzes the whole chain each action.

    Returns (node, rank_micro): BIGINT micro-unit ranks.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    # materialize the edge list and degree table ONCE (eager
    # localCheckpoint, the _frozen_range_partition trade-off): every
    # iteration joins both, and without a leaf the whole upstream edge
    # pipeline re-executes per iteration per reference — probed at 28
    # re-scans for 3 iterations on the trading-graph face
    ed = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d")).localCheckpoint(
        eager=True
    )
    dg = ed.groupBy("__s").agg(
        F.count(F.lit(1)).cast("long").alias("__outdeg")
    ).localCheckpoint(eager=True)
    ranks = dg.select(F.col("__s").alias("node"), F.lit(SCALE).cast("long").alias("r"))
    base = (100 - damping_pct) * SCALE // 100
    for i in range(iterations):
        contrib = (
            ed.join(ranks, ed["__s"] == ranks["node"])
            .join(dg, "__s")
            .select("__d", F.expr("r div __outdeg").alias("__c"))
        )
        ranks = contrib.groupBy(F.col("__d").alias("node")).agg(
            (F.lit(base) + F.expr(f"({damping_pct} * sum(__c)) div 100"))
            .cast("long")
            .alias("r")
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("r").alias("rank_micro"))


def copurchase_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    top_k: int = 50,
) -> DataFrame:
    """Market-basket co-occurrence: the ``top_k`` item pairs appearing
    together in the most baskets — the support count of 2-itemsets,
    the first rung of frequent-pattern mining (and, on a corpus, of
    co-citation / co-click graphs).

    Plan: distinct (basket, item) pairs, self-equi-join ON THE BASKET
    key with ``item_a < item_b`` — candidates are Σ_b |basket_b|²,
    bounded by basket size, never corpus² — then a pair-keyed count
    and a total-ordered top-k that merges per-task heaps
    (TakeOrderedAndProject; no global sort). Ties break on the item
    pair so the cut is deterministic.

    Returns (item_a, item_b, n_baskets).
    """
    items = baskets.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    a = items.select("__b", F.col("__i").alias("item_a"))
    b = items.select("__b", F.col("__i").alias("item_b"))
    return (
        a.join(b, "__b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
        .orderBy(F.col("n_baskets").desc(), "item_a", "item_b")
        .limit(top_k)
    )
