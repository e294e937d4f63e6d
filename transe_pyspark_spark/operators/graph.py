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

#: truncate the iterative-state lineage (localCheckpoint + re-pin)
#: every this many rounds in the unbounded-depth loops (bfs_hops,
#: sssp_rounds) — the cache makes physical re-reads cheap, but the
#: LOGICAL plan grows EXPONENTIALLY with rounds (each round's state
#: references the previous round's subtree 2-3×: union + anti-join +
#: frontier), and past ~7 un-truncated rounds the plan STRING Spark
#: renders for AQE events alone OOMs the driver (measured: heap
#: exhaustion inside QueryExecution.explainString on a 7-round BFS).
#: 4 keeps ≤3³ leaf-rooted subtrees between truncations (with
#: `spark.sql.maxPlanStringLength` as the categorical backstop) and
#: stays off the bfs face's 3-hop walk; the sssp face's 4th round
#: picks up one extra checkpoint+repartition on a tiny frame, with
#: its gates on the round stage and its oracle values unchanged
#: (r10 advisory)
_LINEAGE_CHECKPOINT_EVERY = 4


def _persistent_rdd_ids(spark) -> set[int]:
    """Ids of every RDD the context currently keeps blocks for.
    Snapshot-diff pairs with `_unpersist_rdd_ids` to release EAGER
    localCheckpoint frames (ADVICE r14): ``Dataset.unpersist`` only
    clears cache-manager entries — a localCheckpoint's persisted RDD
    is untouched by it (probed: the block survives df.unpersist), so
    loops that checkpoint per iteration must free by RDD id."""
    m = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = m.iterator()
    ids: set[int] = set()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def _unpersist_rdd_ids(spark, ids: set[int]) -> None:
    """Release the blocks of the given persistent RDD ids (non-blocking;
    ids already released are skipped)."""
    m = spark.sparkContext._jsc.sc().getPersistentRDDs()
    for rid in ids:
        if m.contains(rid):
            m.apply(rid).unpersist(False)


def pagerank_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
    checkpoint_every: int = 5,
    eager_cleanup: bool = True,
) -> DataFrame:
    """Exact-integer PageRank over a directed edge list:
    ``r'(v) = (100−d)·SCALE/100 + d · Σ_{(u,v)∈E} (r(u) div outdeg(u)) / 100``
    with every operation on BIGINTs (``div`` = integer division), run
    for a fixed ``iterations``. All ranks start at ``SCALE``.

    Contract: every node must have at least one OUT-edge (no dangling
    nodes) — callers with dangling nodes add self-loops or reverse
    edges first (the bipartite trading-graph face materializes both
    directions, which guarantees this). The contract is ENFORCED: a
    cheap anti-join over the checkpointed leaves (destination nodes
    with no out-edge) raises instead of silently losing the rank mass
    a dangling node would swallow. Nodes with no IN-edges are fine —
    the rank table is rebuilt each step as degree-table ⟕ incoming-
    contributions, so a source-only node holds the teleport term and
    keeps contributing every iteration (a dst-keyed rebuild would drop
    its row after step 1 and leak its outgoing mass).

    Scale posture per iteration: the edge and degree leaves are
    hash-REPARTITIONED on the source key once before their eager
    localCheckpoint (LogicalRDD preserves outputPartitioning), and the
    rank table always comes out of a join/agg keyed on the same node
    id — so the per-iteration equi-joins ed ⨝ ranks ⨝ dg and the
    rank rebuild dg ⟕ contributions all reuse that one partitioning;
    the single new Exchange per iteration is the contribution
    hash-aggregate on the destination key. Nothing is ever quadratic;
    the rank state is one row per node. Lineage grows linearly with
    iterations, so every ``checkpoint_every`` steps the rank frame is
    localCheckpoint'ed (eager) — the same truncation
    ``connected_components`` uses for its propagation loop; without it
    a 50-iteration plan re-analyzes the whole chain each action.

    Returns (node, rank_micro): BIGINT micro-unit ranks.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    # materialize the edge list and degree table ONCE — cache(), not
    # localCheckpoint: under AQE a checkpoint's LogicalRDD reports
    # UnknownPartitioning, so every iteration re-Exchanged the edge
    # table (probed: 13 Exchanges for 3 iterations); InMemoryRelation
    # PRESERVES the repartition-on-__s, so the per-iteration joins
    # ed ⨝ ranks ⨝ dg and the dg ⟕ contributions rebuild all reuse one
    # partitioning and the loop's only new Exchange is the contribution
    # hash-agg on the destination key. Cache also stops the upstream
    # edge pipeline re-executing per iteration (probed at 28 re-scans
    # pre-r06). The cached leaves stay pinned as long as the returned
    # frame is live (MEMORY_AND_DISK — spills, never recomputes).
    n_part = edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    ed = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .repartition(int(n_part), "__s")
        .cache()
    )
    dg = ed.groupBy("__s").agg(
        F.count(F.lit(1)).cast("long").alias("__outdeg")
    ).cache()
    dg.count()  # eager: materializes ed + dg once, before the contract check
    # dangling-node contract check: one anti-join count over the two
    # checkpointed leaves — turns silent rank-mass loss into a raise
    # (the interval_overlap_join assert-don't-miss precedent)
    n_dangling = (
        ed.select(F.col("__d").alias("__s"))
        .distinct()
        .join(dg.select("__s"), "__s", "left_anti")
        .count()
    )
    if n_dangling:
        raise ValueError(
            f"{n_dangling} dangling node(s) (in-edges but no out-edges) — "
            "pagerank_integer requires every node to have an out-edge; "
            "add self-loops or reverse edges first"
        )
    nodes = dg.select(F.col("__s").alias("node"))
    ranks = nodes.select("node", F.lit(SCALE).cast("long").alias("r"))
    base = (100 - damping_pct) * SCALE // 100
    for i in range(iterations):
        contrib = (
            ed.join(ranks, ed["__s"] == ranks["node"])
            .join(dg, "__s")
            .select("__d", F.expr("r div __outdeg").alias("__c"))
        )
        incoming = contrib.groupBy(F.col("__d").alias("node")).agg(
            F.sum("__c").alias("__in")
        )
        # LEFT join back to the full node set: source-only nodes get
        # the teleport term instead of vanishing from the rank table
        ranks = nodes.join(incoming, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(__in, 0L)) div 100")
            ).cast("long").alias("r"),
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    out = ranks.select("node", F.col("r").alias("rank_micro"))
    if not eager_cleanup:
        # lazy mode (plan inspection / repeat-run benches): the cached
        # ed/dg leaves stay PINNED in the cache manager for the life of
        # the session — identical re-calls reuse the same entry, but
        # calls over different edge inputs accumulate one entry each
        # (r08 advisory); use the default for leak-free library calls.
        return out
    # eager cleanup (default): materialize the final per-node rank
    # table (small — one row per node) as a leaf, then release both
    # cached leaves; nothing the caller holds references them anymore.
    out = out.localCheckpoint(eager=True)
    ed.unpersist()
    dg.unpersist()
    return out


def personalized_pagerank_integer(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    iterations: int = 3,
    damping_pct: int = 85,
    checkpoint_every: int = 5,
    eager_cleanup: bool = True,
) -> DataFrame:
    """Personalized PageRank (r11 — the restart-vector variant of
    ``pagerank_integer``, and the recommendation primitive: rank every
    node by its proximity to a SEED set — "customers like these",
    "parts bought with this one"). The restart mass teleports to the
    seeds instead of uniformly:
    ``r'(v) = seed(v)·(100−d)·SCALE/100 + d·Σ (r(u) div outdeg(u))/100``
    with ranks starting at ``SCALE`` on seeds and 0 elsewhere — every
    operation exact-BIGINT (the ``pagerank_integer`` determinism
    contract), so a fixed-iteration run unrolls into the same
    hash-checkable SQL oracle pattern.

    Same no-dangling contract as ``pagerank_integer`` (enforced);
    seeds not in the graph's node set hold no mass (they have no
    out-edges to push it through) and are dropped by the node join.

    Scale posture: identical per-iteration shape to
    ``pagerank_integer`` (node-keyed joins over the once-pinned edge /
    degree / seed-flag leaves + one destination-keyed hash-agg) with
    one sparse-regime addition: only nodes with NONZERO rank join the
    edge table (a zero rank contributes ``0 div outdeg = 0``), so
    before the rank mass spreads graph-wide the per-iteration join is
    seed-ball-sized — the ``bfs_hops`` shrinking-frontier posture
    applied to rank propagation.

    Returns (node, rank_micro) for every node with an out-edge.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    n_part = edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    ed = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .repartition(int(n_part), "__s")
        .cache()
    )
    dg = ed.groupBy("__s").agg(
        F.count(F.lit(1)).cast("long").alias("__outdeg")
    ).cache()
    dg.count()
    n_dangling = (
        ed.select(F.col("__d").alias("__s"))
        .distinct()
        .join(dg.select("__s"), "__s", "left_anti")
        .count()
    )
    if n_dangling:
        raise ValueError(
            f"{n_dangling} dangling node(s) (in-edges but no out-edges) — "
            "personalized_pagerank_integer requires every node to have an "
            "out-edge; add self-loops or reverse edges first"
        )
    sd = seeds.select(F.col(seed_col).cast("long").alias("node")).distinct()
    # the per-node restart flag is read every iteration (the rank
    # rebuild's left side) — pin it node-partitioned like the leaves
    flagged = (
        dg.select(F.col("__s").alias("node"))
        .join(sd.withColumn("__seed", F.lit(1)), "node", "left")
        .select("node", F.coalesce("__seed", F.lit(0)).cast("long").alias("__seed"))
        .repartition(int(n_part), "node")
        .cache()
    )
    flagged.count()
    ranks = flagged.select(
        "node", (F.col("__seed") * F.lit(SCALE)).cast("long").alias("r")
    )
    base = (100 - damping_pct) * SCALE // 100
    for i in range(iterations):
        active = ranks.filter(F.col("r") != 0)
        contrib = (
            ed.join(active, ed["__s"] == active["node"])
            .join(dg, "__s")
            .select("__d", F.expr("r div __outdeg").alias("__c"))
        )
        incoming = contrib.groupBy(F.col("__d").alias("node")).agg(
            F.sum("__c").alias("__in")
        )
        ranks = flagged.join(incoming, "node", "left").select(
            "node",
            (
                F.col("__seed") * F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(__in, 0L)) div 100")
            ).cast("long").alias("r"),
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    out = ranks.select("node", F.col("r").alias("rank_micro"))
    if not eager_cleanup:
        # lazy mode (plan gate); library callers use the default
        return out
    out = out.localCheckpoint(eager=True)
    for df in (ed, dg, flagged):
        df.unpersist()
    return out


def triangle_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    eager_cleanup: bool = True,
) -> DataFrame:
    """Global triangle census of the UNDIRECTED simple graph induced by
    the edge list (orientation and duplicate edges are collapsed;
    self-loops dropped): node/edge counts, wedge count (length-2
    paths), triangle count, and the global clustering coefficient
    ``3·triangles / wedges`` — the one-row graph-shape report
    (community structure, spam/bot subgraph detection) beside
    ``pagerank_integer``'s per-node ranks.

    Plan: canonicalize each edge to ``(a < b)`` + one distinct, then
    RE-ORIENT every edge from its lower-(degree, id) endpoint to its
    higher one — the classic degree-orientation mitigation: the wedge
    join pairs the SUCCESSORS of each source (``e1(u,y) ⨝ e2(u,z)`` on
    u), generating ``Σ_u outdeg⁺(u)²`` candidates with
    ``outdeg⁺ = O(√E)`` even on a hub-heavy graph (an id-orientation
    leaves a hub's ~deg²/4 wedges in one key), and the ``(y,z)``
    equi-join closes each triangle at its (degree, id)-minimal vertex
    — found exactly once, because only the successor pair ordered by
    the orientation has a closing edge.
    Wedges come from the degree table as ``Σ deg·(deg−1)/2`` (exact
    BIGINT) — no second join. The clustering coefficient is the single
    IEEE division of two exact BIGINTs (NULL when the graph has no
    wedges).

    Returns one row: (n_nodes, n_edges, n_wedges, n_triangles,
    clustering).
    """
    a = F.least(F.col(src), F.col(dst))
    b = F.greatest(F.col(src), F.col(dst))
    # cache both leaves (the pagerank precedent): the canonical edge
    # set feeds the degree table + the orientation build; the ORIENTED
    # set feeds three wedge-join consumers — uncached, the upstream
    # edge pipeline re-executed per consumer (probed: 21 Exchange
    # nodes on the co-occurrence face before caching)
    und = (
        edges.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .cache()
    )
    deg = (
        und.select(F.col("a").alias("n")).unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    # three consumers (the one-row census agg + both orientation
    # sides): unpinned, the degree agg over the cached edge set would
    # execute per consumer (r14 guard class). persist() keeps the
    # gate-visible lineage; released in the eager-cleanup branch.
    deg = deg.persist()
    base = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        (F.sum("d") / 2).cast("long").alias("n_edges"),
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges"),
    )
    # degree orientation: u = the (degree, id)-smaller endpoint. und
    # already has a < b, so a degree tie orients a → b.
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("__da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("__db"))
    a_first = F.col("__da") <= F.col("__db")
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    # repartition the ORIENTED set on its source key before caching
    # (r08): u is a DERIVED column, so the cached join output carries
    # no useful partitioning — without this the wedge self-join
    # e1(u,y) ⨝ e2(u,z) re-Exchanged ornt on u TWICE (once per side);
    # with it, both sides read the one u-partitioned cache and the
    # wedge join plans no Exchange at all (the InMemoryRelation
    # partitioning-preservation pattern from pagerank_integer)
    ornt = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("w"),
        )
        .repartition(n_part, "u")
        .cache()
    )
    e1 = ornt.select("u", F.col("w").alias("y"))
    e2 = ornt.select("u", F.col("w").alias("z"))
    close = ornt.select(F.col("u").alias("__cu"), F.col("w").alias("__cw"))
    tri = (
        e1.join(e2, "u")
        .filter(F.col("y") != F.col("z"))
        .join(
            close,
            (F.col("y") == F.col("__cu")) & (F.col("z") == F.col("__cw")),
            "inner",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    res = base.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(
            F.col("n_wedges") > 0,
            (F.col("n_triangles") * 3).cast("double") / F.col("n_wedges").cast("double"),
        ).alias("clustering"),
    )
    if not eager_cleanup:
        # lazy mode (plan inspection): the cached und/ornt leaves stay
        # pinned for the life of the session — calls over different
        # edge inputs accumulate one cache-manager entry each (r08
        # advisory); the default forces the one-row aggregate and
        # releases both.
        return res
    res = res.localCheckpoint(eager=True)
    und.unpersist()
    ornt.unpersist()
    deg.unpersist()
    return res


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


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int | str,
    src: str = "src",
    dst: str = "dst",
    eager_cleanup: bool = True,
) -> DataFrame:
    """k-core peeling of the UNDIRECTED simple graph: each round drops
    every node whose current degree is below ``k`` (and the edges
    touching it) — the standard spam-subgraph / cohesive-community
    screen. ``rounds`` is either a fixed int (a pure function of the
    edge set, so a round-unrolled SQL oracle replays it exactly — the
    registered face's form) or ``"converge"`` (r09): loop until the
    surviving EDGE COUNT is stable — no count change means no node
    was dropped, so degrees are at the true k-core fixpoint. Fixed
    rounds under-peel adversarial chains (a long path cascades one
    layer per round); converge runs exactly as many rounds as the
    cascade needs, at zero extra cost per round because each
    generation's count is already materialized by the cache pin. The
    returned DataFrame carries ``kcore_rounds_taken`` (int attribute)
    in converge mode.

    Plan per round: one degree hash-agg over the surviving edge set +
    two semi joins (src side, dst side) against the ≥k-degree node
    set — all keyed on node ids; nothing quadratic, state is one row
    per surviving edge. The surviving edge set is re-pinned
    (repartition-on-src + cache, the pagerank partitioning pattern)
    each round so the next round's degree agg and semi joins reuse one
    partitioning, and the previous generation is unpersisted as soon
    as its successor materializes.

    Returns (node, degree) for nodes surviving all rounds, with their
    degree inside the surviving subgraph.
    """
    converge = rounds == "converge"
    if k < 1 or (not converge and (not isinstance(rounds, int) or rounds < 1)):
        raise ValueError(
            f'k must be >= 1 and rounds an int >= 1 or "converge", '
            f"got k={k}, rounds={rounds!r}"
        )
    F_ = F
    a = F_.least(F_.col(src), F_.col(dst))
    b = F_.greatest(F_.col(src), F_.col(dst))
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))

    def pin(df: DataFrame) -> DataFrame:
        out = df.repartition(n_part, "a").cache()
        out.count()
        return out

    und = pin(
        edges.select(a.alias("a"), b.alias("b"))
        .filter(F_.col("a") != F_.col("b"))
        .distinct()
    )
    pinned = [und]

    def one_round(cur: DataFrame) -> DataFrame:
        deg = (
            cur.select(F_.col("a").alias("n"))
            .unionAll(cur.select(F_.col("b").alias("n")))
            .groupBy("n")
            .agg(F_.count(F_.lit(1)).cast("long").alias("d"))
        )
        keep = deg.filter(F_.col("d") >= k).select("n")
        return pin(
            cur.join(keep.select(F_.col("n").alias("a")), "a", "left_semi")
            .join(keep.select(F_.col("n").alias("b")), "b", "left_semi")
            .select("a", "b")
        )

    rounds_taken = 0
    if converge:
        # the pin's count() already materialized each generation, so
        # re-reading it off the cache is free — stable count ⇒ no node
        # dropped ⇒ fixpoint
        prev_edges = und.count()
        while True:
            nxt = one_round(und)
            pinned.append(nxt)
            rounds_taken += 1
            cur_edges = nxt.count()
            # geometric-lineage bound: generation r's plan references
            # generation r−1's FULL plan several times (degree union +
            # two semi joins), so unchecked converge runs blow the
            # driver heap printing the tree around round ~7. An eager
            # localCheckpoint resets the lineage to an RDD scan; it
            # reads off the cache just built, and the next round's pin
            # re-establishes the partitioning regardless.
            und = nxt.localCheckpoint(eager=True)
            if cur_edges == prev_edges or cur_edges == 0:
                break
            prev_edges = cur_edges
    else:
        for _ in range(rounds):
            nxt = one_round(und)
            pinned.append(nxt)
            und = nxt
            rounds_taken += 1
    out = (
        und.select(F_.col("a").alias("node"))
        .unionAll(und.select(F_.col("b").alias("node")))
        .groupBy("node")
        .agg(F_.count(F_.lit(1)).cast("long").alias("degree"))
    )
    if not eager_cleanup:
        # lazy mode (plan inspection): every round's cached edge set
        # stays pinned for the life of the session
        out.kcore_rounds_taken = rounds_taken
        return out
    out = out.localCheckpoint(eager=True)
    for df in pinned:
        df.unpersist()
    out.kcore_rounds_taken = rounds_taken
    return out


def node_clustering(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    eager_cleanup: bool = True,
) -> DataFrame:
    """Per-NODE triangle counts and local clustering coefficients over
    the undirected simple graph — the node-level companion to
    ``triangle_stats``' global census (ego-network density: spam rings
    and tight communities score high, bridges score low).

    Same degree-orientation plan as ``triangle_stats`` (each triangle
    is found EXACTLY once, at its orientation-minimal corner, with the
    wedge-candidate volume bounded by Σ outdeg⁺² and outdeg⁺ = O(√E));
    the one addition is a 3-way corner explode of the found triangles
    into one per-node count aggregate. clustering_i = 2·tri_i /
    (d_i·(d_i−1)) is one IEEE division of exact BIGINTs (NULL for
    degree-1 nodes).

    Returns (node, degree, n_tri, clustering) — one row per node.
    """
    a = F.least(F.col(src), F.col(dst))
    b = F.greatest(F.col(src), F.col(dst))
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    und = (
        edges.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .cache()
    )
    deg = (
        und.select(F.col("a").alias("n")).unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .cache()
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("__da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("__db"))
    a_first = F.col("__da") <= F.col("__db")
    ornt = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("w"),
        )
        .repartition(n_part, "u")
        .cache()
    )
    e1 = ornt.select("u", F.col("w").alias("y"))
    e2 = ornt.select("u", F.col("w").alias("z"))
    close = ornt.select(F.col("u").alias("__cu"), F.col("w").alias("__cw"))
    tri = (
        e1.join(e2, "u")
        .filter(F.col("y") != F.col("z"))
        .join(
            close,
            (F.col("y") == F.col("__cu")) & (F.col("z") == F.col("__cw")),
            "inner",
        )
        .select("u", "y", "z")
    )
    corners = tri.select(F.explode(F.array("u", "y", "z")).alias("node"))
    tn = corners.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    out = (
        deg.join(tn, deg["n"] == tn["node"], "left")
        .select(
            F.col("n").alias("node"),
            F.col("d").alias("degree"),
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
            F.when(
                F.col("d") >= 2,
                (F.coalesce(F.col("n_tri"), F.lit(0)) * 2).cast("double")
                / (F.col("d") * (F.col("d") - 1)).cast("double"),
            ).alias("clustering"),
        )
    )
    if not eager_cleanup:
        # lazy mode (plan inspection): cached leaves stay pinned
        return out
    out = out.localCheckpoint(eager=True)
    und.unpersist()
    deg.unpersist()
    ornt.unpersist()
    return out



def _lpa_round(adj: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous LPA round, un-pinned — exposed so the plan gate
    can explain the per-round shape (the pinned generations are opaque
    InMemoryTableScans by design): one neighbor-keyed equi-join + two
    hash aggregates, with the deterministic tie-break riding
    ``max_by(label, (count, -label))`` instead of a window."""
    nbr_labels = adj.join(
        labels.select(F.col("node").alias("nbr"), "community"), "nbr"
    ).select("node", "community")
    counted = nbr_labels.groupBy("node", "community").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return counted.groupBy("node").agg(
        F.expr("max_by(community, struct(c, -community))").alias("community")
    )


def lpa_communities(
    edges: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    eager_cleanup: bool = True,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) over the undirected simple graph, made DETERMINISTIC the
    way this module's PageRank is: every node starts labeled with its
    own id, and each round every node adopts the MODE of its
    neighbors' labels with ties broken by the smallest label — no
    randomized visit order, so the result after a fixed number of
    rounds is a pure function of the edge set and a round-unrolled SQL
    oracle replays it exactly. (Classic async LPA randomizes node
    order precisely because the synchronous update can oscillate on
    bipartite structures; fixed synchronous rounds keep the answer
    well-defined and hash-checkable, which is the contract every
    iterative face in this repo holds. Community detection differs
    from ``dedup.connected_components``' min-label propagation: mode
    adoption splits a connected component into densely-linked regions
    instead of flooding it with one label.)

    Plan per round: ONE node-keyed equi-join (adjacency ⨝ labels on
    the neighbor id) + TWO hash aggregates — count per (node,
    neighbor-label), then ``max_by(label, (count, -label))`` per node,
    so the tie-break rides the aggregate instead of a second window
    Exchange. The directed adjacency (each undirected edge listed both
    ways) is built ONCE, pinned repartitioned on the neighbor column
    (the per-round join key), and reused every round; labels are
    |V|-sized and re-pinned per round partitioned on the node id
    (repartition + cache, the repo's iterative-leaf pattern), with the
    previous generation unpersisted as soon as its successor
    materializes. Nothing in any round is quadratic; state is one row
    per node plus the pinned adjacency.

    Returns (node, community) — one row per node appearing in any
    edge.
    """
    if not isinstance(rounds, int) or rounds < 1:
        raise ValueError(f"rounds must be an int >= 1, got {rounds!r}")
    a = F.least(F.col(src), F.col(dst))
    b = F.greatest(F.col(src), F.col(dst))
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    und = (
        edges.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # directed adjacency: (node, nbr) both ways, partitioned on nbr —
    # the side every round's label join keys on. Exploded in-plan from
    # ONE pass over the canonical edge set: a union of two projections
    # would re-execute the un-pinned distinct subtree (base scans +
    # dedup shuffle) once per branch at materialization.
    adj = (
        und.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("node"), F.col("b").alias("nbr")),
                    F.struct(F.col("b").alias("node"), F.col("a").alias("nbr")),
                )
            ).alias("__e")
        )
        .select("__e.*")
        .repartition(n_part, "nbr")
        .cache()
    )
    adj.count()
    labels = (
        adj.select(F.col("node"))
        .distinct()
        .select("node", F.col("node").alias("community"))
        .repartition(n_part, "node")
        .cache()
    )
    labels.count()
    pinned = [adj, labels]
    for _ in range(rounds):
        labels = _lpa_round(adj, labels).repartition(n_part, "node").cache()
        labels.count()
        pinned.append(labels)
        if eager_cleanup and len(pinned) > 2:
            # keep adj + the freshly-built generation; drop its parent
            # (never the initial-labels frame before round 1 consumed it)
            prev = pinned.pop(-2)
            if prev is not adj:
                prev.unpersist()
    out = labels.select("node", "community")
    if not eager_cleanup:
        return out
    out = out.localCheckpoint(eager=True)
    for df in pinned:
        df.unpersist()
    return out


def _bfs_frontier(adj: DataFrame, frontier: DataFrame, visited: DataFrame, h: int) -> DataFrame:
    """One BFS expansion, un-pinned — the body of ``bfs_hops``' loop,
    exposed so the plan gate can explain the per-hop shape (the
    converged result is an opaque localCheckpoint by design): one
    frontier-sized equi-join against the PINNED adjacency, a distinct
    on the candidate neighbors, and one anti-join against the visited
    set — never a whole-graph pass, never a window."""
    return (
        adj.join(frontier.select("node"), "node")
        .select(F.col("nbr").alias("node"))
        .distinct()
        .join(visited.select("node"), "node", "left_anti")
        .withColumn("hops", F.lit(h).cast("long"))
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """Multi-source BFS over the undirected simple graph: minimum hop
    distance from ANY seed, bounded at ``max_hops`` (beyond-reference
    north-star op; the reachability primitive under influence radii,
    blast-radius audits, and k-hop feature neighborhoods).

    Frontier expansion, not label flooding: round ``h`` joins ONLY the
    newly-discovered frontier (shrinking, typically ≪ |V|) against the
    pinned adjacency and anti-joins the visited set — each round is
    one frontier-sized equi-join plus one anti-join, never a whole-
    graph pass, which is what makes 100 TB feasible when the h-hop
    ball is small. Early exit when a frontier comes back empty (the
    ``kcore_peel`` converge guard: one aggregate on a frame already
    needed — "model-sized by contract"). The adjacency is exploded
    in-plan from ONE pass over the canonical edge set and pinned
    repartitioned on ``node`` (every round's join key); the visited
    set is re-pinned per round with its predecessor unpersisted (the
    repo's iterative-leaf pattern — under AQE a localCheckpoint would
    report UnknownPartitioning and re-shuffle both sides every round).
    Frontier h−1 is dead once round h's visited set materializes (its
    content is folded into ``visited``), so it is unpersisted IN-LOOP
    — at most the adjacency + current visited + current frontier stay
    pinned mid-loop, bounding executor storage on deep walks (r10
    advisory). Every ``_LINEAGE_CHECKPOINT_EVERY`` rounds the visited
    frame is localCheckpoint-truncated and re-pinned (one extra
    shuffle to restore the node partitioning) so analyzer time and
    plan depth stay bounded at high hop counts.

    Fixpoint-equivalent to a recursive-CTE ``min(depth)`` walk, which
    is exactly how the registered face's DuckDB oracle replays it —
    the repo's first run-to-frontier-exhaustion iterative oracle (the
    unrolled-SQL pattern of pagerank/kcore/lpa can't express early
    exit; ``WITH RECURSIVE`` can).

    Returns (node, hops) — one row per reachable node, hops ∈ [0,
    max_hops], seeds at 0 (seeds not in any edge still appear).
    """
    if not isinstance(max_hops, int) or max_hops < 0:
        raise ValueError(f"max_hops must be an int >= 0, got {max_hops!r}")
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    a = F.least(F.col(src), F.col(dst))
    b = F.greatest(F.col(src), F.col(dst))
    und = (
        edges.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    adj = (
        und.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("node"), F.col("b").alias("nbr")),
                    F.struct(F.col("b").alias("node"), F.col("a").alias("nbr")),
                )
            ).alias("__e")
        )
        .select("__e.*")
        .repartition(n_part, "node")
        .cache()
    )
    visited = (
        seeds.select(F.col(seed_col).cast("long").alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("long"))
        .repartition(n_part, "node")
        .cache()
    )
    visited.count()
    frontier = visited
    pinned = [adj, visited]
    for h in range(1, max_hops + 1):
        nxt = (
            _bfs_frontier(adj, frontier, visited, h)
            .repartition(n_part, "node")
            .cache()
        )
        if nxt.count() == 0:
            nxt.unpersist()
            break
        new_visited = visited.unionByName(nxt).repartition(n_part, "node").cache()
        if h % _LINEAGE_CHECKPOINT_EVERY == 0:
            # truncate lineage so plan size stays bounded on deep
            # walks; re-pin to restore the node partitioning the
            # checkpoint drops (UnknownPartitioning under AQE)
            trunc = (
                new_visited.localCheckpoint(eager=True)
                .repartition(n_part, "node")
                .cache()
            )
            new_visited.unpersist()
            new_visited = trunc
            new_visited.count()
            # the frontier IS the hop-h slice of visited — re-derive
            # it from the truncated leaf (a filter over the new cache)
            # so the frontier's lineage is truncated too; the old
            # cached frontier is folded in and dead
            nxt.unpersist(blocking=True)
            nxt = new_visited.filter(F.col("hops") == h)
        else:
            new_visited.count()
            pinned.append(nxt)
        pinned.append(new_visited)
        prev_visited, prev_frontier = visited, frontier
        visited, frontier = new_visited, nxt
        # prev_visited's rows now live in new_visited's cache; the
        # h−1 frontier is a subset of prev_visited — both are dead
        for dead in (prev_visited, prev_frontier):
            if dead is not adj and dead in pinned:
                dead.unpersist(blocking=True)
                pinned.remove(dead)
    out = visited.select("node", "hops").localCheckpoint(eager=True)
    for df in pinned:
        df.unpersist()
    return out


def _sssp_relax(adj: DataFrame, frontier: DataFrame, dist: DataFrame) -> DataFrame:
    """One Bellman-Ford relaxation, un-pinned — the body of
    ``sssp_rounds``' loop, exposed for the plan gate: one
    FRONTIER-sized equi-join against the pinned weighted adjacency,
    one min hash-aggregate over the candidates, and one node-keyed
    full-outer fold into the running distances — never a whole-graph
    pass once the frontier shrinks, never a window."""
    cand = (
        adj.join(frontier, "node")
        .select(F.col("nbr").alias("node"), (F.col("cost") + F.col("w")).alias("cost"))
        .groupBy("node")
        .agg(F.min("cost").alias("cost"))
    )
    return (
        dist.withColumnRenamed("cost", "__old")
        .join(cand, "node", "full_outer")
        .select(
            "node",
            F.least(
                F.coalesce(F.col("__old"), F.col("cost")),
                F.coalesce(F.col("cost"), F.col("__old")),
            ).alias("cost"),
            (
                F.col("__old").isNull()
                | (F.col("cost").isNotNull() & (F.col("cost") < F.col("__old")))
            ).alias("__improved"),
        )
    )


def sssp_rounds(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    seed_col: str = "node",
) -> DataFrame:
    """Multi-source shortest-path costs over the undirected
    positively-weighted simple graph, bounded at ``rounds`` edges per
    path — distributed Bellman-Ford with delta relaxation (the
    weighted generalization of ``bfs_hops``; parallel edges collapse
    to their MIN weight so the input is a simple graph either way).

    Per round only the FRONTIER — nodes whose cost improved last
    round — joins the pinned doubled adjacency; candidate costs
    min-aggregate and fold into the running distance table with one
    node-keyed full-outer join. The frontier shrinks as distances
    settle, and an empty frontier early-exits: after round k the table
    holds the exact min cost over paths of ≤ k edges (positive
    weights, so min-over-walks == min-over-paths), which is precisely
    what the registered face's recursive-CTE ``min(total_cost)`` walk
    with ``hops < rounds`` recomputes — the fixpoint-oracle pattern
    with a cost column. Costs stay exact BIGINTs end to end.

    Round r−1's relaxed frame is dead once round r's materializes (its
    rows are folded in) and is unpersisted IN-LOOP, so mid-loop
    storage is bounded at the adjacency + one live round regardless of
    the round count; every ``_LINEAGE_CHECKPOINT_EVERY`` rounds the
    state is localCheckpoint-truncated and re-pinned to keep the
    logical plan depth bounded too (r10 advisory).

    Returns (node, cost) — seeds at 0, plus every node reachable
    within ``rounds`` edges.
    """
    if not isinstance(rounds, int) or rounds < 0:
        raise ValueError(f"rounds must be an int >= 0, got {rounds!r}")
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    a = F.least(F.col(src), F.col(dst))
    b = F.greatest(F.col(src), F.col(dst))
    und = (
        edges.select(a.alias("a"), b.alias("b"), F.col(weight).cast("long").alias("w"))
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )
    adj = (
        und.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("node"), F.col("b").alias("nbr"), F.col("w")),
                    F.struct(F.col("b").alias("node"), F.col("a").alias("nbr"), F.col("w")),
                )
            ).alias("__e")
        )
        .select("__e.*")
        .repartition(n_part, "node")
        .cache()
    )
    dist = (
        seeds.select(F.col(seed_col).cast("long").alias("node"))
        .distinct()
        .withColumn("cost", F.lit(0).cast("long"))
        .repartition(n_part, "node")
        .cache()
    )
    dist.count()
    frontier = dist
    pinned = [adj, dist]
    prev_relaxed = None
    for r in range(1, rounds + 1):
        relaxed = _sssp_relax(adj, frontier, dist).repartition(n_part, "node").cache()
        if r % _LINEAGE_CHECKPOINT_EVERY == 0:
            # bound logical-plan depth on high round counts; re-pin to
            # restore the node partitioning the checkpoint drops
            trunc = (
                relaxed.localCheckpoint(eager=True)
                .repartition(n_part, "node")
                .cache()
            )
            relaxed.unpersist()
            relaxed = trunc
        # materialize the WHOLE round (next round's fold reads every
        # row anyway) so the superseded round's frame can be released
        # now instead of accumulating until exit (r10 advisory)
        relaxed.count()
        nxt_frontier = relaxed.filter(F.col("__improved")).select("node", "cost")
        nxt_dist = relaxed.select("node", "cost")
        if nxt_frontier.limit(1).count() == 0:
            # converged: nothing improved, so relaxed holds the same
            # costs dist already has — discard it and keep dist (whose
            # backing frame, prev_relaxed or the seed pin, is still
            # pinned for the final checkpoint)
            relaxed.unpersist()
            break
        pinned.append(relaxed)
        prev = dist
        dist, frontier = nxt_dist, nxt_frontier
        if prev is not adj and prev in pinned:
            prev.unpersist(blocking=True)
            pinned.remove(prev)
        if prev_relaxed is not None and prev_relaxed in pinned:
            # round r−1's frame: its rows are folded into this round's
            # relaxed cache, so it is dead the moment relaxed.count()
            # returns
            prev_relaxed.unpersist(blocking=True)
            pinned.remove(prev_relaxed)
        prev_relaxed = relaxed
    out = dist.select("node", "cost").localCheckpoint(eager=True)
    for df in pinned:
        df.unpersist()
    return out


def degree_assortativity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    eager_cleanup: bool = True,
) -> DataFrame:
    """Degree assortativity of the undirected simple graph — the
    Pearson correlation of endpoint degrees over the DOUBLED edge
    list (Newman 2002's r; positive = hubs link hubs, negative =
    hubs link leaves; bipartite customer↔supplier graphs skew
    strongly negative). The one-row graph-shape report beside
    ``triangle_stats``' clustering census.

    With both edge orientations listed, the x- and y-marginals are
    identical, so ``r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²)`` needs NO
    square root: every moment is an exact BIGINT sum, the two
    products ride decimal(38,0) (the ``daily_count_correlation``
    idiom — DuckDB's HUGEINT takes the same exact-128-bit road), and
    the result is ONE IEEE division — hash-checkable cross-engine.

    Plan: canonical-distinct the edges (one shuffle), degree
    hash-agg, join degrees to both endpoints (two key equi-joins over
    the pinned canonical edge set), one global aggregate. Nothing
    quadratic; the degree table is |V|-sized.

    Returns ONE row: (m_directed, sum_deg, r) — r NULL on a
    degree-regular graph (zero variance).
    """
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    a = F.least(F.col(src), F.col(dst))
    b = F.greatest(F.col(src), F.col(dst))
    und = (
        edges.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .repartition(n_part, "a")
        .cache()
    )
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("__deg"))
    )
    # three consumers (the moments agg + both Σxy join sides):
    # unpinned, the |V|-sized degree agg over the cached edge set
    # executes per consumer (r14 guard class). persist() keeps the
    # gate-visible lineage; released in the eager-cleanup branch.
    deg = deg.persist()
    # Three of the four moments never touch the edges: over the
    # DOUBLED edge list each node v appears deg(v) times as the
    # u-endpoint, so M = Σ_v deg(v), Σx = Σ_v deg(v)², Σx² = Σ_v
    # deg(v)³ — pure |V|-sized degree-table aggregates. Only Σxy
    # needs edges, and the symmetric doubling makes it 2·Σ over the
    # CANONICAL (half-sized) edge set — one a-keyed + one b-keyed
    # equi-join, never the doubled explode through two joins (the
    # first cut shipped the 2|E| frame through two SortMergeJoins;
    # this form halves the join traffic and drops the explode).
    powers = deg.agg(
        F.sum("__deg").cast("long").alias("m_directed"),
        F.sum(F.col("__deg") * F.col("__deg")).cast("long").alias("sum_deg"),
        F.sum(F.col("__deg") * F.col("__deg") * F.col("__deg")).cast("long").alias("__sxx"),
    )
    sxy_und = (
        und.join(deg.select(F.col("node").alias("a"), F.col("__deg").alias("__x")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("__deg").alias("__y")), "b")
        .agg((F.lit(2) * F.sum(F.col("__x") * F.col("__y"))).cast("long").alias("__sxy"))
    )
    m = powers.crossJoin(F.broadcast(sxy_und))

    def d38(c):
        return F.col(c).cast("decimal(38,0)")

    num = (d38("m_directed") * d38("__sxy") - d38("sum_deg") * d38("sum_deg")).cast("double")
    den = (d38("m_directed") * d38("__sxx") - d38("sum_deg") * d38("sum_deg")).cast("double")
    out = m.select(
        "m_directed",
        "sum_deg",
        F.when(den != 0, num / den).alias("r"),
    )
    if not eager_cleanup:
        # lazy mode (plan gate): leaves the edge pin in the cache
        # manager — library callers use the default
        return out
    out = out.localCheckpoint(eager=True)  # 1-row leaf — THEN release the pin
    und.unpersist()
    deg.unpersist()
    return out


def hits_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Exact-integer HITS (hubs and authorities) over a directed edge
    list — Kleinberg's mutual-reinforcement ranking, the natural fit
    for BIPARTITE curation graphs (buyer→product, user→document,
    query→click): a good HUB points at good authorities, a good
    AUTHORITY is pointed at by good hubs; PageRank's single score
    can't separate the two roles.

    Same determinism trade as ``pagerank_integer``: scores live in
    nano-units and every round L1-NORMALIZES with integer division —
    ``a(v) = (Σ_{u→v} h(u)) · scale DIV Σa_raw`` then symmetrically
    for hubs — decimal-128 products, BIGINT sums, no float anywhere,
    so fixed-round results are a pure function of the edge set and a
    DuckDB unrolled-SQL oracle replays them in HUGEINT bit-for-bit.
    (Float HITS normalizes by an L2 norm — order-dependent sums AND a
    sqrt; the L1 integer form keeps the same fixed point structure
    with hash-exact arithmetic.) Parallel edges contribute multiply —
    multigraph semantics; pass a distinct edge list for simple-graph
    scores.

    Scale posture per round: the edge leaf pins ONCE (repartitioned on
    the source key); each round is two edge⨝score equi-joins + two
    destination/source hash aggregates + two 1-row broadcast totals —
    node-sized state, nothing quadratic. Per-round eager
    localCheckpoints truncate the lineage (the ``pagerank_integer``
    discipline) and keep each round's score frame one hop deep.

    Returns (node, hub_nano, auth_nano) — full outer over both roles,
    0 where a node never plays one (e.g. a pure source has no
    authority score).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # ADVICE r14: the per-round eager checkpoints (a_raw/a/h_raw/h)
    # otherwise pin blocks for the session — snapshot the persistent
    # RDD ids here and release every id this loop adds once the final
    # result frame has materialized (only `out`'s own checkpoint,
    # taken after the snapshot diff below, survives the call)
    rdd_ids_before = _persistent_rdd_ids(spark)
    ed = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .repartition(n_part, "__s")
        .cache()
    )
    h = (
        ed.select("__s")
        .distinct()
        .withColumn("__h", F.lit(int(scale)).cast("long"))
        .localCheckpoint(eager=True)
    )
    a = None
    for _ in range(int(iterations)):
        # two consumers (the L1 total + the normalize pass): pinned so
        # the edge⨝score join + agg runs once per round (r14 guard)
        a_raw = (
            ed.join(h, "__s")
            .groupBy("__d")
            .agg(F.sum("__h").cast("decimal(38,0)").alias("__r"))
            .localCheckpoint(eager=True)
        )
        sa = F.broadcast(a_raw.agg(F.sum("__r").alias("__t")))
        a = (
            a_raw.crossJoin(sa)
            .select(
                "__d",
                F.expr(
                    f"CAST((__r * CAST({int(scale)} AS DECIMAL(38,0))) DIV __t AS LONG)"
                ).alias("__a"),
            )
            .localCheckpoint(eager=True)
        )
        h_raw = (
            ed.join(a, "__d")
            .groupBy("__s")
            .agg(F.sum("__a").cast("decimal(38,0)").alias("__r"))
            .localCheckpoint(eager=True)
        )
        sh = F.broadcast(h_raw.agg(F.sum("__r").alias("__t")))
        h = (
            h_raw.crossJoin(sh)
            .select(
                "__s",
                F.expr(
                    f"CAST((__r * CAST({int(scale)} AS DECIMAL(38,0))) DIV __t AS LONG)"
                ).alias("__h"),
            )
            .localCheckpoint(eager=True)
        )
    loop_rdd_ids = _persistent_rdd_ids(spark) - rdd_ids_before
    out = (
        h.withColumnRenamed("__s", "node")
        .join(a.withColumnRenamed("__d", "node"), "node", "full_outer")
        .select(
            "node",
            F.coalesce(F.col("__h"), F.lit(0)).cast("long").alias("hub_nano"),
            F.coalesce(F.col("__a"), F.lit(0)).cast("long").alias("auth_nano"),
        )
        .localCheckpoint(eager=True)
    )
    ed.unpersist()
    _unpersist_rdd_ids(spark, loop_rdd_ids)
    return out
