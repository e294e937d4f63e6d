"""Relational operator library (SURVEY §2B R3-R6, R9-R12).

Everything here is a thin, *declarative* composition of DataFrame ops —
Catalyst owns the physical plan (broadcast vs sort-merge, partial aggs,
AQE skew handling). The value added is the contract: deterministic,
oracle-checkable semantics for the patterns the reference hand-rolls.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _frozen_range_partition(
    df: DataFrame, order_col: str | list[str], n_part: int
) -> DataFrame:
    """Range-repartition by ``order_col`` (a column name or a composite
    key as a list of names), stamp ``__pid`` =
    ``spark_partition_id()``, and FREEZE partition membership by
    eagerly materializing the frame with ``localCheckpoint``.

    Why freezing matters: RangePartitioner samples its boundaries with a
    seed derived from the RDD id, so two separate evaluations of the
    same uncached lineage can route a row to DIFFERENT partitions once
    boundary sampling is partial at scale. Any operator that reads the
    partitioned frame twice (once for per-partition totals, once for the
    final row-level pass) would then attribute offsets to the wrong
    rows — silently. Catalyst's ReuseExchange dedupes the two reads only
    when the canonicalized plans match (measured: it does NOT fire when
    the input plan carries a nondeterministic expression such as
    ``monotonically_increasing_id``), so correctness must not depend on
    it.

    localCheckpoint rather than persist: both materialize eagerly and
    freeze partition identity (the checkpoint truncates lineage, so
    re-evaluation is impossible by construction), but a persisted frame
    is pinned by the cache manager until an explicit ``unpersist()``
    that no caller can issue (the frame is internal to this helper) —
    one leaked cached dataset per dict_encode/pack call. Checkpoint
    blocks are GC-managed: they free when the result's references die.
    Trade-off: a lost block fails the job loudly instead of
    recomputing (acceptable — silent recomputation is exactly the bug
    this helper exists to prevent).
    """
    cols = [order_col] if isinstance(order_col, str) else list(order_col)
    return (
        df.repartitionByRange(int(n_part), *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )


def _exclusive_offsets(
    sizes: DataFrame, size_col: str, partition_cols: list[str] | None = None
) -> DataFrame:
    """Exclusive running sum over the K-row per-partition sizes table
    (K = #partitions, times #groups when ``partition_cols`` restart the
    sum per group): the window touches only this tiny table, never the
    data. Stays in-plan — no driver round-trip."""
    w_off = (
        Window.partitionBy(*partition_cols) if partition_cols else Window
    ).orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    return F.broadcast(
        sizes.select(
            *(partition_cols or []),
            "__pid",
            F.coalesce(F.sum(size_col).over(w_off), F.lit(0)).alias("__off"),
        )
    )


def _offsets_with_total(
    sizes: DataFrame,
    size_col: str,
    partition_cols: list[str] | None = None,
    total_col: str = "__n",
) -> DataFrame:
    """`_exclusive_offsets` plus the grand total in the SAME pass —
    the single-consumer variant for operators that need both the
    per-partition exclusive offset and the overall count. An unpinned
    sizes frame consumed once for offsets and once for a separate
    total aggregate re-executes its aggregate subtree per consumer
    (the r08/r13 multi-consumer class, gated by
    ``test_no_unpinned_multi_consumer_aggregates``); carrying the
    total as a second window function over the same K-row ordering
    keeps ONE consumer and drops a broadcast exchange. Both windows
    touch only the K-row sizes table, never the data."""
    pb = Window.partitionBy(*partition_cols) if partition_cols else Window
    w_off = pb.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = pb.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return F.broadcast(
        sizes.select(
            *(partition_cols or []),
            "__pid",
            F.coalesce(F.sum(size_col).over(w_off), F.lit(0))
            .cast("long")
            .alias("__off"),
            F.sum(size_col).over(w_all).cast("long").alias(total_col),
        )
    )


def dict_encode(
    df: DataFrame,
    col: str,
    token_col: str = "token",
    id_col: str = "id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense dictionary encoding: distinct values of ``col`` → contiguous
    ids 0..V−1, ordered by token (SURVEY §2B R5).

    Replaces the reference's ``distinct().zipWithIndex().collectAsMap()``
    (``utils.py:13-23``), whose ids depend on partition order. Ordering
    by token makes the assignment deterministic and oracle-checkable.

    Scale path: a global ``row_number`` window would funnel the whole
    vocabulary through ONE partition. Instead: range-repartition by
    token (partition i's tokens all sort before partition i+1's) with
    partition identity FROZEN by an eager localCheckpoint (see
    ``_frozen_range_partition`` — an uncached lineage read twice can
    land rows in different partitions between reads), number rows
    *within* each partition, and add the in-plan exclusive running sum
    of prior partitions' counts. Ids are identical to the global-window
    formulation regardless of where sampled range boundaries land.
    """
    toks = df.select(F.col(col).alias(token_col)).distinct()
    n_part = num_partitions or toks.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    part = _frozen_range_partition(toks, token_col, int(n_part))
    off_df = _exclusive_offsets(
        part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt")), "__cnt"
    )
    w_in = Window.partitionBy("__pid").orderBy(token_col)
    return (
        part.join(off_df, "__pid")
        .select(
            F.col(token_col),
            (F.row_number().over(w_in) - 1 + F.col("__off")).cast("long").alias(id_col),
        )
    )


def encode_with_vocab(
    df: DataFrame,
    vocab: DataFrame,
    col: str,
    out_col: str,
    token_col: str = "token",
    id_col: str = "id",
    broadcast: bool = True,
) -> DataFrame:
    """Replace string ``col`` with its vocab id via a **broadcast hash
    join** — the declarative form of the reference's closure-captured
    driver dict (``utils.py:26``), which *is* a hand-rolled map-side
    join. Vocab stays distributed; nothing crosses the driver.

    ``broadcast=False`` drops the hint for vocabularies too large to
    broadcast (beyond-GB token tables): Catalyst then plans a shuffled
    hash/sort-merge join, which is the correct shape at that size.
    """
    v = vocab.select(F.col(token_col), F.col(id_col).alias(out_col))
    if broadcast:
        v = F.broadcast(v)
    return df.join(v, df[col] == v[token_col], "inner").drop(token_col, col)


def top_k_per_group(df: DataFrame, group_cols: list[str], order_col: str, k: int, desc: bool = True, tiebreak: str | None = None) -> DataFrame:
    """Top-k rows per group via window ``row_number`` (R11).

    ``tiebreak`` column makes the result total-ordered hence
    deterministic — required for oracle checks and for reproducible
    pipelines. Spark pushes a per-partition partial top-k
    (WindowGroupLimit) below the shuffle, so this stays O(k) memory per
    group at scale.
    """
    ordering = [F.col(order_col).desc() if desc else F.col(order_col).asc()]
    if tiebreak:
        ordering.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*group_cols).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .withColumn("rank_in_group", F.col("__rn").cast("long"))
        .drop("__rn")
    )


def dedup_exact(df: DataFrame, key_cols: list[str], keep_by: str) -> DataFrame:
    """Exact dedup keeping the row with the minimum ``keep_by`` per key
    group (R18 exact path). A hash aggregate — one shuffle on the key,
    map-side partial aggregation for free."""
    return df.groupBy(*key_cols).agg(
        F.min(keep_by).alias(keep_by),
        F.count(F.lit(1)).alias("dup_count"),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for skewed keys (SURVEY scale posture).

    The left (large, skewed) side gets a salt in [0, salt) derived from
    a row-content hash (xxhash64 over ALL left columns — deterministic,
    so a retried task routes every row to the SAME salt bucket, unlike
    positional ``F.rand`` whose values shift when a partition is
    recomputed); the right side is replicated ``salt`` times with every
    salt value, and the join key becomes (key, salt) — a single hot key
    now spreads over ``salt`` reducers instead of one straggler task.
    Semantically identical to ``left.join(right, on, how)``
    (oracle-checked by the ``salted_join_revenue`` query). AQE's
    skew-join split handles moderate skew automatically; explicit
    salting is for the extreme case where one key exceeds what a
    single split can hold.

    Limitation: rows that are FULL duplicates (every left column equal)
    hash to the same salt bucket, so duplicate-heavy hot keys still
    collapse onto one reducer. When the skewed payloads repeat, mix in a
    partition-local counter (``monotonically_increasing_id`` modulo
    ``salt``) instead — that spreads duplicates but is only
    retry-stable per task attempt, which is why content hashing is the
    default here.
    """
    salted_l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*left.columns), F.lit(salt)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt")
    salted_r = right.select("*", salts)
    out = salted_l.join(salted_r, [on, "__salt"], how)
    return out.drop("__salt")


def semi_join(left: DataFrame, right: DataFrame, on: Column | str) -> DataFrame:
    """EXISTS filter (R6) — the declarative form of the reference's
    vocabulary-membership check (``test.py:7-11``)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Column | str) -> DataFrame:
    """NOT EXISTS filter (R6) — the declarative form of the reference's
    negative-sample rejection (``TransE.py:237-244``)."""
    return left.join(right, on, "left_anti")


def stratified_mod_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict[str, float],
    denom: int = 100,
    default: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row of stratum *s*
    iff ``key % denom < round(fractions[s]·denom)`` — the data-mixing
    step of a pretraining pipeline (per-source/per-language rates),
    with systematic-sampling determinism instead of RNG so the result
    is reproducible on any engine and any partitioning (same
    reasoning as ``mod_sample_orders``; a seeded ``df.sampleBy`` is
    the Bernoulli alternative when statistical randomness matters
    more than replayability).

    Pure narrow filter — no shuffle, pushes to the scan when ``key``
    and ``strata`` are plain columns."""
    thresholds = {s: int(round(f * denom)) for s, f in fractions.items()}
    expr = F.lit(int(round(default * denom)))
    for s, t in thresholds.items():
        expr = F.when(F.col(strata_col) == s, F.lit(t)).otherwise(expr)
    return df.filter(F.pmod(F.col(key_col), F.lit(denom)) < expr)


def pack_by_running_total(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    budget: int,
    pack_col: str = "pack_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Sequence packing: assign each row (a tokenized training sequence)
    to the pack holding the first ``budget`` units of running
    ``weight_col`` after it, in ``order_col`` order —
    ``pack = floor(exclusive_prefix_sum(weight) / budget)``. The
    greedy fill every LLM batch-builder runs; packs can overflow by at
    most one row's weight (rows are not split), which is the standard
    contract when sequences already fit the context window.

    Scale path is the ``dict_encode`` prefix pattern generalized from
    counts to sums: range-repartition by ``order_col`` with partition
    identity FROZEN by an eager localCheckpoint (``_frozen_range_partition`` —
    re-evaluating the uncached lineage for the totals pass and the
    row-level pass can disagree on partition membership), per-partition
    running sums under a partition-local window, plus the in-plan
    exclusive running sum of prior partitions' total weight — a global
    running total with no single-partition window over the data, exact
    at any row count (integer weights)."""
    n_part = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    part = _frozen_range_partition(df, order_col, int(n_part))
    off_df = _exclusive_offsets(
        part.groupBy("__pid").agg(F.sum(weight_col).alias("__w")), "__w"
    )
    w_in = Window.partitionBy("__pid").orderBy(order_col)
    excl = F.sum(weight_col).over(w_in) - F.col(weight_col) + F.col("__off")
    return (
        part.join(off_df, "__pid")
        .withColumn(pack_col, F.floor(excl / F.lit(budget)).cast("long"))
        .drop("__pid", "__off")
    )


def profile_columns(df: DataFrame, numeric_cols: list[str], string_cols: list[str]) -> DataFrame:
    """Column profile — the data-quality sweep a warehouse runs before
    trusting a new table: per column, row count, null count, EXACT
    distinct count, min/max (as strings, so mixed types share one
    schema), and for numerics an exact integer-cents mean.

    One aggregate job computes every statistic as parallel expressions
    over a single scan (count/count_distinct get map-side partial
    aggregation), then the single result row melts to one row per
    column with ``stack`` — no per-column passes, no driver loop. The
    exact ``count_distinct`` per column is the honest profile cost; the
    cheap variant at 100 TB swaps in ``approx_count_distinct`` (the
    ``approx_distinct`` query face) without changing this shape.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in numeric_cols + string_cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    for c in numeric_cols:
        aggs.append(
            F.sum(F.round(F.col(c) * 100).cast("long")).alias(f"__cents_{c}")
        )
    row = df.agg(*aggs)
    stacked = []
    for c in numeric_cols + string_cols:
        mean_cents = (
            (F.col(f"__cents_{c}") / (F.col("__n") - F.col(f"__null_{c}")))
            if c in numeric_cols
            else F.lit(None).cast("double")
        )
        stacked.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__null_{c}").cast("long").alias("n_null"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
                F.round(mean_cents, 6).alias("mean_cents"),
            )
        )
    return row.select(F.explode(F.array(*stacked)).alias("p")).select("p.*")


def fixed_width_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Fixed-width histogram over ``[lo, hi)``: bucket =
    ``floor((x − lo) / width)`` clamped into [0, n_bins), under-range
    rows clamp to bin 0 and over-range to the last bin (SQL
    ``width_bucket`` overflow semantics folded inward). One hash-agg
    shuffle of at most ``n_bins`` groups — map-side partials reduce
    each task to its touched bins, so the histogram of a 100 TB column
    ships kilobytes. Empty bins are absent (a grid join adds them if a
    dense vector is wanted)."""
    if n_bins <= 0 or not hi > lo:
        raise ValueError(
            f"fixed_width_histogram requires lo < hi and n_bins > 0, "
            f"got lo={lo}, hi={hi}, n_bins={n_bins}"
        )
    width = (hi - lo) / n_bins
    b = F.floor((F.col(col) - F.lit(lo)) / F.lit(width))
    bucket = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1)).cast("long")
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 6).alias("bucket_lo"),
            "n",
        )
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | None = None,
    salt: int = 1,
) -> DataFrame:
    """Deterministic train/val/test assignment by key hash — the split
    every ML dataset needs to be REPRODUCIBLE and STABLE under
    re-partitioning, retries, and appends (a random split is none of
    those; a row's split must be a pure function of its key).

    Two MINSTD rounds over the Mersenne prime M31 mix the key into a
    percentile bucket: h = ((id mod M)·48271 + salt) mod M, twice.
    All intermediates stay < 2^48 — exact BIGINT arithmetic on any
    engine (the reason for MINSTD's small multiplier rather than a
    64-bit avalanche: the SQL oracle must reproduce it without
    overflow). Narrow projection; nothing shuffles.
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    assert abs(sum(fractions.values()) - 1.0) < 1e-9
    m = 2147483647
    h = F.pmod(F.pmod(F.col(id_col), m) * 48271 + salt, m)
    h = F.pmod(h * 48271, m)
    bucket = F.pmod(h, 100)
    expr = None
    edge = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        edge += frac * 100
        cond = bucket < F.lit(int(round(edge)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (expr.otherwise(items[-1][0]) if expr is not None else F.lit(items[-1][0]))
    return df.withColumn("split", expr)


def scd2_merge(
    dim: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    effective: "Column",
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type-2 merge — the warehouse
    dimension-maintenance operator: apply a change snapshot to a
    versioned dimension, closing superseded rows and opening new ones,
    without ever rewriting history.

    ``dim`` carries one row per (key, version) with ``valid_from`` and
    ``valid_to`` (NULL = current). ``changes`` carries the new snapshot
    attributes per key, effective at ``effective``. Semantics:

    * closed history rows pass through untouched;
    * an open row whose key is absent from ``changes``, or whose
      ``compare_cols`` all match, passes through still open;
    * an open row superseded by a differing change row is CLOSED
      (``valid_to`` = effective) and the change row opens a new version
      (``valid_from`` = effective);
    * a change row with no open match (a brand-new key) opens its
      first version.

    Scale posture: ONE equi-join of the open slice against the change
    batch on the key (broadcast when the batch is small — the nightly-
    ingest case — else a hash join co-partitioned on key), plus unions
    that are plan-only. History (the bulk of an SCD2 table) is touched
    only by the ``valid_to IS NULL`` partition filter, which prunes at
    the scan on a table partitioned by open/closed status.

    NULL-safe comparison: attribute equality uses ``eqNullSafe`` per
    column, so NULL→value and value→NULL transitions count as changes.

    Column contract: ``dim`` must carry exactly
    ``key_cols + compare_cols + [valid_from, valid_to]`` — opened
    versions are rebuilt from the change batch, which has no values for
    extra dimension attributes (surrogate keys, audit columns); carry
    those in ``compare_cols`` or derive them after the merge.
    """
    expected = set(key_cols) | set(compare_cols) | {valid_from_col, valid_to_col}
    if set(dim.columns) != expected:
        raise ValueError(
            "scd2_merge requires dim columns to be exactly key_cols + "
            f"compare_cols + validity columns; got {sorted(dim.columns)}, "
            f"expected {sorted(expected)}"
        )
    open_rows = dim.filter(F.col(valid_to_col).isNull())
    closed_rows = dim.filter(F.col(valid_to_col).isNotNull())
    ch = changes.select(
        *[F.col(c).alias(f"__ch_{c}") for c in key_cols + compare_cols]
    )
    cond = None
    for c in key_cols:
        eq = F.col(c) == F.col(f"__ch_{c}")
        cond = eq if cond is None else cond & eq
    j = open_rows.join(ch, cond, "left")
    differs = None
    for c in compare_cols:
        ne = ~F.col(c).eqNullSafe(F.col(f"__ch_{c}"))
        differs = ne if differs is None else differs | ne
    matched = F.col(f"__ch_{key_cols[0]}").isNotNull()
    dim_cols = dim.columns
    # open rows: keep as-is when unmatched or unchanged; close when superseded
    kept_open = j.filter(~matched | ~differs).select(*dim_cols)
    closed_now = j.filter(matched & differs).select(
        *[F.col(c) for c in dim_cols if c != valid_to_col],
        effective.alias(valid_to_col),
    ).select(*dim_cols)
    # change rows that open a new version: differing match or brand-new key
    new_keys = j.filter(matched & differs).select(
        *[F.col(f"__ch_{c}").alias(c) for c in key_cols]
    )
    brand_new = changes.join(
        open_rows.select(*key_cols), key_cols, "left_anti"
    ).select(*key_cols, *compare_cols)
    opened = (
        changes.join(new_keys, key_cols, "left_semi")
        .select(*key_cols, *compare_cols)
        .unionByName(brand_new)
        .select(
            *key_cols, *compare_cols,
            effective.alias(valid_from_col),
            F.lit(None).cast(dim.schema[valid_to_col].dataType).alias(valid_to_col),
        )
        .select(*dim_cols)
    )
    return closed_rows.unionByName(kept_open).unionByName(closed_now).unionByName(opened)


def pit_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    ts_col: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    how: str = "inner",
    broadcast_dim: bool = False,
) -> DataFrame:
    """Point-in-time (AS OF) enrichment against an SCD2 dimension: each
    fact row joins the dimension VERSION that was valid at the fact's
    event time (``valid_from ≤ ts < valid_to``, open versions have NULL
    ``valid_to``) — the temporal-correctness join every versioned
    warehouse needs (training-data labeling reads features AS OF the
    example's timestamp; joining today's dimension row onto last
    year's facts is silent leakage).

    Scale posture: the version predicate is a RESIDUAL on a key
    equi-join — Spark plans hash/broadcast/sort-merge on the key and
    evaluates the range condition as a post-join filter, so the plan is
    never a nested loop at any fact size (validity windows per key are
    few and disjoint, so the key join's fan-out is the version count,
    not a range explosion). ``broadcast_dim=True`` for dimension tables
    that fit (the common case); leave False and Spark/AQE pick sides.

    Because SCD2 validity windows partition each key's timeline, a
    fact matches AT MOST one version; ``how='left'`` keeps facts that
    predate their key's first version (NULL attributes),
    ``how='inner'`` drops them."""
    d = F.broadcast(dim) if broadcast_dim else dim
    cond = (
        (fact[fact_key] == d[dim_key])
        & (fact[ts_col] >= d[valid_from_col].cast("timestamp"))
        & (d[valid_to_col].isNull() | (fact[ts_col] < d[valid_to_col].cast("timestamp")))
    )
    return fact.join(d, cond, how)


def token_budget_sample(
    df: DataFrame,
    stratum_col: str,
    token_col: Column | str,
    budgets: dict[str, int],
    id_col: str = "doc_id",
    salt: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic token-budget mixture sampling — the pretraining
    mixture op: fill each stratum's TOKEN budget (not row count) in a
    stable pseudo-random order, so "200 B tokens of code, 50 B of
    wiki" is a declarative spec, reproducible across runs, retries,
    and repartitioning.

    Per stratum, rows order by an exact-BIGINT MINSTD double-step hash
    of ``id_col`` (the same engine-reproducible generator as
    ``hash_split``; id ties broken by id) and survive while the
    running token sum stays within the stratum's budget — so the
    selected set is a pure function of (ids, budgets), never of
    physical layout. Strata missing from ``budgets`` are dropped.

    Scale path — the ``pack_by_running_total`` distributed prefix-sum,
    applied per stratum. A ``Window.partitionBy(stratum)`` cumsum would
    funnel EVERY row of a stratum through one task (stratum cardinality
    is tiny by construction — languages, sources — so "200 B tokens of
    code" becomes a single-reducer sort). Instead: range-repartition by
    the composite (stratum, hash, id) key with partition identity FROZEN
    (``_frozen_range_partition``), so each stratum's rows spread over
    many partitions in global hash order; aggregate per-(stratum, __pid)
    token totals (tiny — #strata × #partitions rows); broadcast back the
    per-stratum EXCLUSIVE prefix of prior partitions' totals; and finish
    with a partition-local window keyed on (stratum, __pid). The running
    sum — hence the selected set and every ``cum_tokens`` value — is
    identical to the single-window formulation at any partition count.
    Returns the surviving rows with ``n_tokens`` and the running
    ``cum_tokens``.
    """
    m = 2147483647
    h = F.pmod(F.pmod(F.col(id_col), m) * 48271 + salt, m)
    h = F.pmod(h * 48271, m)
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    base = df.select("*", tok.cast("long").alias("n_tokens"), h.alias("__h"))
    n_part = num_partitions or base.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    part = _frozen_range_partition(base, [stratum_col, "__h", id_col], int(n_part))
    off_df = _exclusive_offsets(
        part.groupBy(stratum_col, "__pid").agg(F.sum("n_tokens").alias("__w")),
        "__w",
        partition_cols=[stratum_col],
    )
    w_in = (
        Window.partitionBy(stratum_col, "__pid")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = None
    for name, b in budgets.items():
        cond = F.col(stratum_col) == name
        budget = F.when(cond, b) if budget is None else budget.when(cond, b)
    return (
        part.join(off_df, [stratum_col, "__pid"])
        .withColumn(
            "cum_tokens", (F.sum("n_tokens").over(w_in) + F.col("__off")).cast("long")
        )
        .filter(F.col("cum_tokens") <= budget)
        .select(*df.columns, "n_tokens", "cum_tokens")
    )


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """Apply a change-data-capture batch to a snapshot (SCD type-1
    merge with deletes) — the MERGE INTO every warehouse runs on its
    latest-state tables: per key, the HIGHEST-``seq`` change wins;
    ``op`` = 'I'/'U' upserts the change row's attributes, 'D' removes
    the key; keys absent from the batch pass through untouched.
    Complements ``scd2_merge`` (which versions history; this keeps only
    current state).

    Column contract: ``changes`` carries ``key_cols`` + ``op_col`` +
    ``seq_col`` + exactly the snapshot's non-key columns (NULL-able for
    deletes). (key, seq) pairs must be unique — the op of a tied seq
    would be arbitrary, so ties break deterministically on ``op_col``
    but the contract is uniqueness.

    Scale posture: latest-change-per-key is a key-partitioned window
    (key cardinality is the table's, not a handful — no single-reducer
    funnel) over the CHANGE BATCH only, never the snapshot; the
    snapshot is touched by one co-partitioned anti-join on the key plus
    a plan-only union with the upserts. Nightly-batch case: Catalyst
    broadcasts the small batch side of the anti-join automatically.
    """
    snap_cols = snapshot.columns
    missing = set(snap_cols) - set(changes.columns)
    if missing:
        raise ValueError(
            f"cdc_apply requires changes to carry every snapshot column; missing {sorted(missing)}"
        )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), F.col(op_col).asc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    untouched = snapshot.join(latest.select(*key_cols), key_cols, "left_anti")
    upserts = latest.filter(F.col(op_col) != "D").select(*snap_cols)
    return untouched.unionByName(upserts)


def snapshot_changeset(
    old: "DataFrame",
    new: "DataFrame",
    key_cols: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> "DataFrame":
    """Derive the CDC change batch that turns ``old`` into ``new`` —
    the inverse of ``cdc_apply``, and the standard way to feed a
    MERGE-based downstream from two full snapshot drops when the
    source system emits no change log. Emits one row per differing
    key: 'I' rows carry the new attributes for keys only in ``new``,
    'U' rows the new attributes for keys in both with any NULL-safely
    distinct column, 'D' rows (all-NULL attributes) for keys only in
    ``old``. Identical keys emit nothing, so the batch is
    |changes|-sized, not |table|-sized. All rows get ``seq = 1`` —
    snapshots have no intra-batch ordering.

    Roundtrip law (pytest-pinned): ``cdc_apply(old,
    snapshot_changeset(old, new), keys)`` equals ``new`` exactly.

    Plan: ONE full-outer key equi-join (the ``table_diff`` shape) with
    a per-row op classification — no aggregate, no second pass; the
    emitted batch matches ``cdc_apply``'s column contract directly.
    Keys must be non-null on both sides (presence flags track join
    sides, the ``table_diff`` contract).
    """
    if not key_cols:
        raise ValueError("snapshot_changeset needs at least one key column")
    attr_cols = [c for c in new.columns if c not in key_cols]
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"snapshot_changeset requires identical schemas; old has "
            f"{sorted(set(old.columns) - set(new.columns))} extra, new has "
            f"{sorted(set(new.columns) - set(old.columns))} extra"
        )
    o = old.select(
        *key_cols,
        F.lit(1).alias("__in_old"),
        *[F.col(c).alias(f"__o_{c}") for c in attr_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(1).alias("__in_new"),
        *[F.col(c).alias(f"__n_{c}") for c in attr_cols],
    )
    j = o.join(n, list(key_cols), "full_outer")
    any_diff = F.lit(False)
    for c in attr_cols:
        any_diff = any_diff | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    op = (
        F.when(F.col("__in_old").isNull(), F.lit("I"))
        .when(F.col("__in_new").isNull(), F.lit("D"))
        .when(any_diff, F.lit("U"))
    )
    return (
        j.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(
            *key_cols,
            *[
                F.when(F.col(op_col) != "D", F.col(f"__n_{c}")).alias(c)
                for c in attr_cols
            ],
            op_col,
            F.lit(1).alias(seq_col),
        )
    )


def snapshot_changeset_images(
    old: "DataFrame",
    new: "DataFrame",
    key_cols: list[str],
    op_col: str = "op",
) -> "DataFrame":
    """Debezium-style change batch WITH BEFORE-IMAGES: one row per
    differing key carrying ``op`` ('I'/'U'/'D') plus
    ``before_<attr>`` / ``after_<attr>`` for every non-key column
    (NULL before-image on 'I', NULL after-image on 'D'). The plain
    ``snapshot_changeset`` feeds MERGE consumers that only need the
    new values; the before-image form is what DOWNSTREAM DELTA
    consumers need — incremental aggregate maintenance
    (``maintain_group_summary``) must retract the old contribution of
    a 'U'/'D' row, which the after-only format cannot express without
    rereading the old snapshot.

    Plan: ONE full-outer key equi-join + per-row op classification,
    |changes|-sized output — identical shape and cost to
    ``snapshot_changeset``. Keys must be non-null on both sides (the
    ``table_diff`` contract: presence is tracked by explicit flags).
    """
    if not key_cols:
        raise ValueError("snapshot_changeset_images needs at least one key column")
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"snapshot_changeset_images requires identical schemas; old has "
            f"{sorted(set(old.columns) - set(new.columns))} extra, new has "
            f"{sorted(set(new.columns) - set(old.columns))} extra"
        )
    attr_cols = [c for c in new.columns if c not in key_cols]
    o = old.select(
        *key_cols,
        F.lit(1).alias("__in_old"),
        *[F.col(c).alias(f"before_{c}") for c in attr_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(1).alias("__in_new"),
        *[F.col(c).alias(f"after_{c}") for c in attr_cols],
    )
    j = o.join(n, list(key_cols), "full_outer")
    any_diff = F.lit(False)
    for c in attr_cols:
        any_diff = any_diff | ~F.col(f"before_{c}").eqNullSafe(F.col(f"after_{c}"))
    op = (
        F.when(F.col("__in_old").isNull(), F.lit("I"))
        .when(F.col("__in_new").isNull(), F.lit("D"))
        .when(any_diff, F.lit("U"))
    )
    return (
        j.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(
            *key_cols,
            *[f"before_{c}" for c in attr_cols],
            *[f"after_{c}" for c in attr_cols],
            op_col,
        )
    )


def build_group_summary(
    df: "DataFrame",
    group_col: str,
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> "DataFrame":
    """The materialized per-group summary ``maintain_group_summary``
    keeps fresh: ``(group, n_rows, sum_<c>...)`` from one hash-agg
    pass. Self-maintainable aggregates only (count + sums — the IVM
    textbook set closed under insert/delete deltas); NULL measures
    contribute 0 so a maintained sum is never NULL and retraction is
    exact. min/max are deliberately absent: they are not incrementally
    maintainable under deletes without the full value multiset."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias(count_col),
        *[
            F.sum(F.coalesce(F.col(c), F.lit(0))).cast("long").alias(f"sum_{c}")
            for c in sum_cols
        ],
    )


def maintain_group_summary(
    summary: "DataFrame",
    changes: "DataFrame",
    group_col: str,
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> "DataFrame":
    """Incremental view maintenance for a grouped count/sum summary:
    apply a before-image change batch (``snapshot_changeset_images``
    format) to an existing ``build_group_summary`` result WITHOUT
    rescanning the base table — the maintained result is exactly
    ``build_group_summary(new_base)``, pytest-pinned as a law and
    oracle-checked by the registered face.

    Each change row contributes up to two signed deltas: a retraction
    ``(before_group, −1, −before_values)`` for 'U'/'D' and an
    assertion ``(after_group, +1, +after_values)`` for 'I'/'U' — so a
    'U' that MOVES a row between groups retracts from the old group
    and asserts into the new one. Groups whose maintained count
    reaches zero drop out of the summary, exactly as a recomputed
    GROUP BY would never emit them.

    At 100 TB this is the whole point: refreshing a day's dashboard
    rollup costs one |changes|-sized shuffle (the delta aggregate) and
    one |groups|-keyed join against the summary — the multi-TB base
    fact is never read. Plan: ONE pass over the change batch (each row
    explodes into its 1–2 signed contributions in-plan — a
    union-of-filters would scan the batch twice) feeding ONE hash-agg,
    then ONE null-safe full-outer equi-join with the summary (NULL
    groups are real groups — the r08 group-rank advisory's lesson —
    so the join key is ``eqNullSafe``, which Spark hash-partitions
    like any equi-key).
    """
    bg, ag = f"before_{group_col}", f"after_{group_col}"
    for need in (bg, ag, "op"):
        if need not in changes.columns:
            raise ValueError(f"changes is missing column {need!r} "
                             "(snapshot_changeset_images format)")
    retract = F.struct(
        F.col(bg).alias("__g"),
        F.lit(-1).cast("long").alias("__dn"),
        *[
            (-F.coalesce(F.col(f"before_{c}"), F.lit(0))).cast("long").alias(f"__ds_{c}")
            for c in sum_cols
        ],
    )
    assert_ = F.struct(
        F.col(ag).alias("__g"),
        F.lit(1).cast("long").alias("__dn"),
        *[
            F.coalesce(F.col(f"after_{c}"), F.lit(0)).cast("long").alias(f"__ds_{c}")
            for c in sum_cols
        ],
    )
    contribs = (
        F.when(F.col("op") == "U", F.array(retract, assert_))
        .when(F.col("op") == "D", F.array(retract))
        .when(F.col("op") == "I", F.array(assert_))
    )
    deltas = (
        changes.select(F.explode(contribs).alias("__x"))
        .select("__x.*")
        .groupBy("__g")
        .agg(
            F.sum("__dn").cast("long").alias("__dn"),
            *[F.sum(f"__ds_{c}").cast("long").alias(f"__ds_{c}") for c in sum_cols],
        )
    )
    s = summary.alias("s")
    d = deltas.alias("d")
    merged = s.join(d, F.col(f"s.{group_col}").eqNullSafe(F.col("d.__g")), "full_outer")
    new_n = F.coalesce(F.col(f"s.{count_col}"), F.lit(0)) + F.coalesce(
        F.col("d.__dn"), F.lit(0)
    )
    return (
        merged.select(
            F.coalesce(F.col(f"s.{group_col}"), F.col("d.__g")).alias(group_col),
            new_n.cast("long").alias(count_col),
            *[
                (
                    F.coalesce(F.col(f"s.sum_{c}"), F.lit(0))
                    + F.coalesce(F.col(f"d.__ds_{c}"), F.lit(0))
                ).cast("long").alias(f"sum_{c}")
                for c in sum_cols
            ],
        )
        .filter(F.col(count_col) > 0)
    )


def table_diff(
    old: "DataFrame",
    new: "DataFrame",
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> "DataFrame":
    """Snapshot diff report (dbt audit-helper style): compare two
    versions of a keyed table and return exact counts of added /
    removed / changed / identical rows plus a per-column changed count
    — the post-migration / post-backfill sanity check, and the inverse
    of ``cdc_apply`` (applying a changeset then diffing recovers the
    changeset's shape).

    NULL-safe semantics: a column counts as changed iff the two
    versions are DISTINCT (NULL = NULL is identical, NULL vs value is
    a change). Keys must be non-null on both sides (presence after the
    full-outer join is tracked by explicit flags, not key nullness, so
    a NULL key would silently match nothing — callers screen keys with
    ``check_not_null`` first).

    Plan: ONE full-outer equi-join on the key (each side shuffles
    once) feeding ONE conditional aggregate — every metric, including
    all per-column counts, is a ``sum(when(...))`` in the same agg, so
    N compare columns cost zero extra passes; the |metrics|-row output
    unpivots from the 1-row aggregate with ``stack``.

    Returns (metric, n) with metrics ``added``, ``removed``,
    ``changed``, ``identical``, and ``changed:<col>`` per compare
    column.
    """
    if not key_cols:
        raise ValueError("table_diff needs at least one key column")
    compare_cols = list(
        compare_cols
        or [c for c in old.columns if c not in key_cols and c in new.columns]
    )
    if not compare_cols:
        raise ValueError("table_diff needs at least one compare column")
    o = old.select(
        *key_cols,
        F.lit(1).alias("__in_old"),
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(1).alias("__in_new"),
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    j = o.join(n, list(key_cols), "full_outer")
    both = F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull()
    col_diff = {
        c: ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")) for c in compare_cols
    }
    any_diff = F.lit(False)
    for d in col_diff.values():
        any_diff = any_diff | d

    def cnt(cond) -> "Column":
        return F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)).cast("long")

    one = j.agg(
        cnt(F.col("__in_old").isNull()).alias("__added"),
        cnt(F.col("__in_new").isNull()).alias("__removed"),
        cnt(both & any_diff).alias("__changed"),
        cnt(both & ~any_diff).alias("__identical"),
        *[cnt(both & col_diff[c]).alias(f"__ch_{i}") for i, c in enumerate(compare_cols)],
    )
    pairs = ["'added'", "__added", "'removed'", "__removed", "'changed'", "__changed", "'identical'", "__identical"]
    for i, c in enumerate(compare_cols):
        pairs += [f"'changed:{c}'", f"__ch_{i}"]
    return one.selectExpr(
        f"stack({4 + len(compare_cols)}, {', '.join(pairs)}) AS (metric, n)"
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier screen via the median/MAD rule: a value
    is an outlier when ``|x − median| > k · 1.4826 · MAD`` (1.4826
    scales the median absolute deviation to a normal σ) — the
    data-quality sweep that survives the heavy tails that break
    z-scores (mean/stddev are themselves dragged by the outliers they
    should flag).

    Three aggregation passes over a narrow (group, value) projection —
    medians are order statistics, so MAD needs the median first and the
    flags need both; each intermediate is one row per group and
    broadcasts back, so no pass shuffles the data by anything but the
    final ≤|groups| rollup. ``exact`` percentile state holds the group's
    values (the oracle-comparable face); swap ``approx_percentile`` at
    100 TB for GK-sketch state, same plan shape.

    Float parity: medians interpolate identically on Spark
    ``percentile`` and DuckDB ``quantile_cont``; the threshold
    multiplies the same literals left-to-right; counts divide in one
    IEEE division. Returns
    (group, n, med, mad, n_outliers, outlier_frac).
    """
    g = F.col(group_col)
    v = F.col(value_col)
    # no broadcast hint on the stats joins: with a handful of groups
    # AQE's runtime stats broadcast the agg output anyway, and with a
    # HIGH-cardinality group column (per-user screens) a forced
    # broadcast of millions of stat rows would be the scale bug — the
    # co-partitioned join is the honest plan there
    med = df.groupBy(group_col).agg(F.percentile(v, F.lit(0.5)).alias("med"))
    dev = df.select(group_col, value_col).join(med, group_col)
    mad = dev.groupBy(group_col).agg(
        F.percentile(F.abs(v - F.col("med")), F.lit(0.5)).alias("mad"),
        F.first("med").alias("med"),
    )
    flagged = df.select(group_col, value_col).join(mad, group_col)
    thresh = F.lit(float(k)) * F.lit(1.4826) * F.col("mad")
    return (
        flagged.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.sum(F.when(F.abs(v - F.col("med")) > thresh, 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            g,
            "n",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n_outliers",
            (F.col("n_outliers").cast("double") / F.col("n").cast("double")).alias("outlier_frac"),
        )
    )


def z_order_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton (Z-order) curve value: interleave the low ``bits`` bits
    of each column — output bit ``i·ndim + d`` is bit ``i`` of column
    ``d``. Sorting or range-partitioning a table by this value
    clusters it along EVERY participating dimension at once, which is
    what makes multi-column min/max data skipping work: a parquet
    row group in a z-sorted layout has a tight range on ALL the
    z-columns, so a predicate on any one of them prunes — a linear
    sort gives that for its leading column only.

    Inputs must be non-negative and < 2^bits (clamp or dict-encode
    first — ``dict_encode`` produces exactly the dense non-negative
    ids this wants); ``bits·ndim`` must fit a signed 64-bit value.
    Pure bit arithmetic (shifts, masks, additions of disjoint bits) —
    deterministic on any engine, so the value itself is
    oracle-checkable. ``write_zordered_parquet`` is the write-side
    companion; the layout benefit is pytest-asserted as per-file span
    bounds on every dimension (``test_zorder_layout_locality``).
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    ndim = len(cs)
    if ndim < 1:
        raise ValueError("z_order_value needs at least one column")
    if bits * ndim > 63:
        raise ValueError(f"bits*ndim must fit a signed 64-bit value, got {bits}*{ndim}")
    z = F.lit(0).cast("long")
    for d, c in enumerate(cs):
        cl = c.cast("long")
        for i in range(bits):
            z = z + F.shiftleft(F.shiftright(cl, i).bitwiseAND(F.lit(1)), i * ndim + d)
    return z


def z_order_value_sql(cols: list[str], bits: int = 16) -> str:
    """The identical Morton computation as an ANSI-SQL expression
    string (DuckDB/engine-portable ``>> << &`` + addition of disjoint
    bits) — generated from the same loop so the oracle can't drift
    from the Spark expression."""
    ndim = len(cols)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {i}) & 1) << {i * ndim + d})"
        for d, c in enumerate(cols)
        for i in range(bits)
    ]
    return " + ".join(terms)


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered along the Z-order curve of
    ``zorder_cols``: range-partition by the Morton value into
    ``n_files`` output files, z-sorted within each. Every file then
    holds a tight min/max range on EVERY z-column, so engine-side
    row-group/file skipping prunes on any of them — the layout a
    100 TB fact table wants for multi-dimension point/range lookups
    (the single-dimension alternative: bucketed/sorted writes via
    ``write_bucketed``)."""
    z = z_order_value(zorder_cols, bits=bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(int(n_files), F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def weighted_systematic_sample(
    df: DataFrame,
    weight_col: str,
    n_target: int,
    id_col: str = "doc_id",
    salt: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic probability-proportional-to-size sampling
    (Madow's systematic PPS): order rows by the exact-BIGINT MINSTD
    hash of their id, lay their integer weights end-to-end, and select
    the row covering each of ``n_target`` evenly-spaced points of the
    total-weight line — row i is selected iff
    ``(cum_i·n) div total > ((cum_i − w_i)·n) div total``. Inclusion
    probability is proportional to weight (rows heavier than
    total/n_target can cover several points — still one output row),
    selection is a pure function of (ids, weights, n_target, salt),
    and every step is integer arithmetic, so any engine replays it —
    the weighted counterpart of ``sample_exact_k``, and the sampling
    mode a token-weighted corpus wants ("pick ~1000 docs by token
    mass") where uniform row sampling over-represents short docs.

    Scale path: the running weight is the ``pack_by_running_total``
    distributed prefix-sum (range-partition by hash with frozen
    partition identity, per-partition windows, broadcast exclusive
    offsets) — no single-partition window; the grand total rides along
    as a 1-row broadcast aggregate. Returns the selected rows plus
    ``cum_weight``.
    """
    if n_target < 1:
        raise ValueError(f"n_target must be >= 1, got {n_target}")
    m = 2147483647
    h = F.pmod(F.pmod(F.col(id_col), m) * 48271 + salt, m)
    h = F.pmod(h * 48271, m)
    base = df.select("*", F.col(weight_col).cast("long").alias("__w"), h.alias("__h"))
    n_part = num_partitions or base.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    part = _frozen_range_partition(base, ["__h", id_col], int(n_part))
    off_df = _exclusive_offsets(
        part.groupBy("__pid").agg(F.sum("__w").alias("__pw")), "__pw"
    )
    tot = F.broadcast(base.agg(F.sum("__w").cast("long").alias("__tot")))
    w_in = (
        Window.partitionBy("__pid")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (F.sum("__w").over(w_in) + F.col("__off")).cast("long")
    return (
        part.join(off_df, "__pid")
        .crossJoin(tot)
        .withColumn("cum_weight", cum)
        .filter(
            F.expr(f"(cum_weight * {int(n_target)}) div __tot")
            > F.expr(f"((cum_weight - __w) * {int(n_target)}) div __tot")
        )
        .select(*df.columns, "cum_weight")
    )


def key_skew_report(
    df: DataFrame,
    key_col: str,
    label: str | None = None,
) -> DataFrame:
    """One-row skew diagnosis of a join/aggregation key — the report to
    run BEFORE sizing a shuffle: per-key row counts summarized as
    total rows, distinct keys, max/avg per key, interpolated p50/p99
    per-key counts, and the hot-key share (max/total). A top1_share
    near 1 says one key will funnel the shuffle through one reducer —
    the signal that picks between a plain join, AQE skew split, and
    ``salted_join``.

    Cost: one hash aggregate on the key (map-side partials), then one
    single-row rollup of the count table (grouped percentile state
    holds per-key counts — one row per DISTINCT key, not per row; the
    ``approx_percentile`` swap bounds even that at extreme key
    cardinality). Exact everywhere except the two interpolated
    percentiles; ratios are single IEEE divisions of BIGINTs.

    Returns (key_name, n_rows, n_keys, max_count, avg_count,
    p50_count, p99_count, top1_share).
    """
    counts = df.groupBy(F.col(key_col)).agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    return counts.agg(
        F.lit(label or key_col).alias("key_name"),
        F.sum("__cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("__cnt").cast("long").alias("max_count"),
        (F.sum("__cnt").cast("double") / F.count(F.lit(1)).cast("double")).alias("avg_count"),
        F.round(F.percentile(F.col("__cnt"), F.lit(0.5)), 6).alias("p50_count"),
        F.round(F.percentile(F.col("__cnt"), F.lit(0.99)), 6).alias("p99_count"),
        (F.max("__cnt").cast("double") / F.sum("__cnt").cast("double")).alias("top1_share"),
    )


def _mg_shrink(counts, cap: int):
    """One Misra-Gries decrement step on a pandas count Series: if more
    than ``cap`` counters are tracked, subtract the (cap+1)-th largest
    count from every counter and drop the non-positive — the batched
    form of MG's per-item decrement (Agarwal et al., "Mergeable
    Summaries"). Each step removes ≥ (cap+1)·t total mass for a
    per-item decrement of t, so across a partition of n_p items the
    cumulative decrement of ANY item is ≤ n_p/(cap+1)."""
    if len(counts) > cap:
        t = counts.nlargest(cap + 1).iloc[-1]
        counts = counts - t
        counts = counts[counts > 0]
    return counts


def _mg_summary(batches, cap: int):
    """Fold Arrow batches of an ``item`` column into a Misra-Gries
    summary of at most ``cap`` counters: exact vectorized
    ``value_counts`` per batch (one C pass, no per-item Python loop),
    merged by addition, shrunk after every batch — peak memory is
    O(cap + batch_distinct) regardless of the partition's total
    distinct count. Returns a pandas Series (possibly empty)."""
    import pandas as pd

    counts = pd.Series(dtype="int64")
    for pdf in batches:
        c = pdf["item"].value_counts()
        counts = c if counts.empty else counts.add(c, fill_value=0)
        counts = _mg_shrink(counts, cap)
    return counts


def sample_exact_k(
    df: DataFrame,
    id_col: str,
    k: int,
    salt: int = 1,
) -> DataFrame:
    """Exactly-k deterministic uniform sample — the distributed
    reservoir. A fraction-based ``df.sample`` cannot promise an exact
    row count, and a true streaming reservoir is order-dependent
    (irreproducible under repartitioning); instead, rank every row by
    the exact-BIGINT MINSTD double-step hash of its id (the
    ``hash_split`` generator; ties broken by id) and keep the first k.
    The selected set is a pure function of (ids, k, salt) — stable
    under retries, repartitioning, and appends-to-the-tail — and any
    SQL engine replays it.

    Scale: ``orderBy(...).limit(k)`` plans as TakeOrderedAndProject —
    each task keeps an O(k) heap of its local winners and the driver
    merges P partial lists; no global sort, no single-partition window,
    no shuffle of the data."""
    m = 2147483647
    h = F.pmod(F.pmod(F.col(id_col), m) * 48271 + salt, m)
    h = F.pmod(h * 48271, m)
    return (
        df.withColumn("__h", h)
        .orderBy("__h", id_col)
        .limit(k)
        .drop("__h")
    )


def winsorize_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
) -> DataFrame:
    """Per-group winsorization report — the feature-prep clip ("cap
    value at its group's p01/p99") summarized per group: clip bounds,
    how many rows each tail clipped, and the exact integer-cents sum
    before and after clipping (the "how much did outliers distort this
    metric" answer).

    Two passes: one bounded-group percentile aggregate (interpolated —
    the engines agree bit-for-bit, the `percentile_prices` precedent),
    joined back (AQE broadcasts when the group domain is small), then
    one rollup with the clip applied inline — clipped values are
    ``round(bound·100)`` cents, so both sums stay exact BIGINTs.
    Returns (group, n, lo_bound, hi_bound, n_clipped_lo, n_clipped_hi,
    sum_cents_raw, sum_cents_winsorized).
    """
    v = F.col(value_col)
    q = df.groupBy(group_col).agg(
        F.percentile(v, F.lit(float(lo_q))).alias("__lo"),
        F.percentile(v, F.lit(float(hi_q))).alias("__hi"),
    )
    j = df.select(group_col, value_col).join(q, group_col)
    cents = F.round(v * 100).cast("long")
    clipped = F.when(v < F.col("__lo"), F.round(F.col("__lo") * 100).cast("long")).when(
        v > F.col("__hi"), F.round(F.col("__hi") * 100).cast("long")
    ).otherwise(cents)
    return j.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.first("__lo"), 6).alias("lo_bound"),
        F.round(F.first("__hi"), 6).alias("hi_bound"),
        F.sum(F.when(v < F.col("__lo"), 1).otherwise(0)).cast("long").alias("n_clipped_lo"),
        F.sum(F.when(v > F.col("__hi"), 1).otherwise(0)).cast("long").alias("n_clipped_hi"),
        F.sum(cents).cast("long").alias("sum_cents_raw"),
        F.sum(clipped).cast("long").alias("sum_cents_winsorized"),
    )


def distribution_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    bucket: Column,
    bucket_name: str = "bucket",
) -> DataFrame:
    """Distribution-drift report between two samples of the same
    metric (this week vs last, train vs serve) over a shared bucketing
    — the data-quality monitor that catches silent upstream shifts.

    Per bucket: both counts and both rates (single IEEE divisions),
    plus the EXACT total-variation contribution
    ``|n_a·N_b − n_b·N_a| / (2·N_a·N_b)`` — numerator and denominator
    are exact decimal(38,0) integers (counts × totals overflow int64
    at warehouse scale), so the per-bucket drift values and their sum
    (TV distance = Σ contributions) are order-free and hash-check.
    PSI originally stayed out of this report because logs are
    libm-dependent and blow up on empty buckets; once the nano-unit
    quantization idiom matured (source_divergence / unigram_nll),
    ``psi_drift`` below landed it with Laplace smoothing — TV remains
    the bounded, log-free alternative this report carries per bucket.

    Cost: one hash-agg per side on the bucket key (map-side partials),
    a full-outer bucket join (≤ bucket-cardinality rows), totals as
    1-row broadcast aggregates. Returns
    (bucket, n_a, n_b, rate_a, rate_b, tv_contrib).
    """
    a = df_a.select(bucket.alias(bucket_name)).groupBy(bucket_name).agg(
        F.count(F.lit(1)).cast("long").alias("n_a")
    )
    b = df_b.select(bucket.alias(bucket_name)).groupBy(bucket_name).agg(
        F.count(F.lit(1)).cast("long").alias("n_b")
    )
    tot_a = F.broadcast(df_a.agg(F.count(F.lit(1)).cast("long").alias("__na")))
    tot_b = F.broadcast(df_b.agg(F.count(F.lit(1)).cast("long").alias("__nb")))
    j = (
        a.join(b, bucket_name, "full_outer")
        .select(
            bucket_name,
            F.coalesce(F.col("n_a"), F.lit(0)).cast("long").alias("n_a"),
            F.coalesce(F.col("n_b"), F.lit(0)).cast("long").alias("n_b"),
        )
        .crossJoin(tot_a)
        .crossJoin(tot_b)
    )
    dec = "decimal(38,0)"
    num = F.abs(
        F.col("n_a").cast(dec) * F.col("__nb").cast(dec)
        - F.col("n_b").cast(dec) * F.col("__na").cast(dec)
    )
    den = F.lit(2).cast(dec) * F.col("__na").cast(dec) * F.col("__nb").cast(dec)
    return j.select(
        bucket_name,
        "n_a",
        "n_b",
        F.round(F.col("n_a").cast("double") / F.col("__na").cast("double"), 6).alias("rate_a"),
        F.round(F.col("n_b").cast("double") / F.col("__nb").cast("double"), 6).alias("rate_b"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("tv_contrib"),
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    bucket: Column,
) -> DataFrame:
    """Population Stability Index between two samples over a shared
    bucketing — THE model-monitoring drift score (credit-risk lineage;
    the common operating bands: <0.1 stable, 0.1-0.25 shifting, >0.25
    action): ``PSI = Σ_b (p_b − q_b)·ln(p_b / q_b)``.

    The two classic failure modes are handled the house way:

    * **empty buckets** (ln blows up): Laplace smoothing —
      ``p_b = (n_a+1)/(N_a+B)``, ``q_b = (n_b+1)/(N_b+B)`` with B the
      OBSERVED bucket count — the standard add-one estimator, exact in
      both engines because B and the totals are BIGINTs broadcast from
      1-row aggregates;
    * **order-dependent transcendental sums** (libm ln + float
      addition): each bucket's term is quantized to integer NANO-UNITS
      (``round(c·1e9) AS BIGINT``) and summed exactly — the
      ``source_divergence`` determinism idiom — so the DuckDB oracle
      replays the sum term-for-term.

    Cost: one hash-agg per side on the bucket key, a full-outer bucket
    join (≤ bucket-cardinality rows), three 1-row broadcast aggregates.
    Returns ONE row: (n_a, n_b, n_buckets, psi), psi rounded to 4
    decimals (the quantization sits 5 orders below the round)."""
    bname = "__bk"
    a = df_a.select(bucket.alias(bname)).groupBy(bname).agg(
        F.count(F.lit(1)).cast("long").alias("__ca")
    )
    b = df_b.select(bucket.alias(bname)).groupBy(bname).agg(
        F.count(F.lit(1)).cast("long").alias("__cb")
    )
    tot_a = F.broadcast(df_a.agg(F.count(F.lit(1)).cast("long").alias("__na")))
    tot_b = F.broadcast(df_b.agg(F.count(F.lit(1)).cast("long").alias("__nb")))
    j = a.join(b, bname, "full_outer").select(
        bname,
        F.coalesce(F.col("__ca"), F.lit(0)).cast("long").alias("__ca"),
        F.coalesce(F.col("__cb"), F.lit(0)).cast("long").alias("__cb"),
    )
    nb = F.broadcast(j.agg(F.count(F.lit(1)).cast("long").alias("__B")))
    terms = j.crossJoin(tot_a).crossJoin(tot_b).crossJoin(nb)
    p = (F.col("__ca") + F.lit(1)).cast("double") / (F.col("__na") + F.col("__B")).cast("double")
    q = (F.col("__cb") + F.lit(1)).cast("double") / (F.col("__nb") + F.col("__B")).cast("double")
    scored = terms.select(
        "__na",
        "__nb",
        "__B",
        F.round((p - q) * F.log(p / q) * F.lit(1e9)).cast("long").alias("__psi_nano"),
    )
    return scored.groupBy("__na", "__nb", "__B").agg(
        F.round(F.sum("__psi_nano").cast("double") / F.lit(1e9), 4).alias("psi")
    ).select(
        F.col("__na").alias("n_a"),
        F.col("__nb").alias("n_b"),
        F.col("__B").alias("n_buckets"),
        "psi",
    )


def trend_per_key(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key least-squares trend line — "is this metric drifting?"
    as an aggregate: OLS slope and intercept of ``value`` (in cents)
    over time (in seconds since each key's first observation),
    computed from EXACT integer moment sums
    ``slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`` with the division
    as the only float op — deterministic on any engine, where the
    built-in ``regr_slope`` accumulates floats in partition order and
    can't hash-check.

    Recentring x to each key's min timestamp keeps x small (seconds
    from the key's first observation); the moment sums still reach
    ~10²¹ at scale, so they accumulate in decimal(38,0) — the
    ``stddev_exact`` precedent (DuckDB auto-promotes to HUGEINT;
    Spark must be told) — and the exact integer numerator/denominator
    convert to double once for the division. Two passes, both cheap:
    a per-key min agg (broadcast back) and one moment agg — map-side
    partials on both.

    Returns (key, n, slope_cents_per_s, intercept_cents); single-point
    or zero-variance-x keys yield NULL slope (vertical/undefined).
    """
    k = F.col(key_col)
    # no broadcast hint: AQE broadcasts the per-key min table when the
    # key domain is small (event types) and keeps the co-partitioned
    # join when it isn't (per-user trends over 10⁹ users) — a forced
    # broadcast would be the high-cardinality scale bug
    mins = df.groupBy(key_col).agg(F.min(ts_col).alias("__t0"))
    xy = (
        df.select(key_col, ts_col, value_col)
        .join(mins, key_col)
        .select(
            k,
            ((F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("__t0"))) / 1_000_000)
            .cast("long").cast("decimal(38,0)").alias("__x"),
            F.round(F.col(value_col) * 100).cast("long").cast("decimal(38,0)").alias("__y"),
        )
    )
    n = F.count(F.lit(1))
    agg = xy.groupBy(key_col).agg(
        n.cast("long").alias("n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
    )
    nn = F.col("n").cast("decimal(38,0)")
    den = (nn * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    num = (nn * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    slope = F.when(den != 0, num / den)
    intercept = F.when(
        den != 0,
        (F.col("__sy").cast("double") - slope * F.col("__sx").cast("double"))
        / F.col("n").cast("double"),
    )
    return agg.select(
        k,
        "n",
        F.round(slope, 6).alias("slope_cents_per_s"),
        F.round(intercept, 6).alias("intercept_cents"),
    )


def sample_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    k: int,
    salt: int = 1,
) -> DataFrame:
    """Exactly-k deterministic uniform sample PER GROUP — the
    stratified counterpart of ``sample_exact_k`` (per-language eval
    slices, per-source QA samples): within each group, rank rows by
    the exact-BIGINT MINSTD double-step hash of ``id_col`` (ties by
    id) and keep the first k. Selection is a pure function of
    (ids, k, salt) — stable under retries, repartitioning, and
    appends — and any SQL engine replays it.

    Scale: the row_number window keys on the GROUP columns, and
    Spark pushes a per-partition partial top-k below the shuffle
    (WindowGroupLimit) — O(k) state per group per task, the same
    guarantee ``top_k_per_group`` carries. Returns the selected rows
    plus ``sample_rank`` (1-based within the group)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    m = 2147483647
    h = F.pmod(F.pmod(F.col(id_col), m) * 48271 + salt, m)
    h = F.pmod(h * 48271, m)
    w = Window.partitionBy(*group_cols).orderBy(F.col("__h"), F.col(id_col))
    return (
        df.withColumn("__h", h)
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
        .drop("__h")
    )


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    phi: float = 0.005,
) -> DataFrame:
    """EXACT φ-heavy hitters (all items with frequency > φ·n) at
    streaming-sketch cost: a per-partition Misra-Gries candidate pass,
    then exact verification of candidates only — the raw item stream
    is never shuffled.

    Soundness: if an item's global count exceeds φ·n, its count in at
    least one partition exceeds φ·n_p (otherwise the total would be
    ≤ φ·Σn_p = φ·n). Within that partition the MG summary with
    k = ⌈1/φ⌉ counters decrements any item by at most n_p/(k+1)
    < φ·n_p (see ``_mg_shrink``), so the item survives with a positive
    count — each partition's surviving counters are a superset of its
    heavy hitters, at most k = ⌈1/φ⌉ candidates per partition, ~KBs
    however large the data, and O(k + Arrow-batch-distinct) worker
    memory even on an all-unique partition. Candidates then broadcast
    back as a semi-join filter and only their occurrences aggregate
    (exact counts), so the final ``count > φ·n`` filter returns the
    exact answer — hash-checkable against a plain GROUP BY oracle,
    unlike an estimate.

    Items must be strings (the summary index round-trips through
    Arrow as ``string``); NULL items are excluded, matching SQL
    aggregation of an exploded token stream."""
    import math

    import pandas as pd

    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    item_type = df.schema[item_col].dataType.simpleString()
    if item_type != "string":
        raise TypeError(
            f"heavy_hitters requires a string item column, got {item_type}; "
            "cast the column first"
        )
    items = df.select(F.col(item_col).alias("item")).filter(
        F.col("item").isNotNull()
    )
    k = math.ceil(1.0 / phi)

    def local_candidates(batches):
        counts = _mg_summary(batches, k)
        if len(counts):
            yield pd.DataFrame({"item": counts.index})

    cand = items.mapInPandas(local_candidates, "item string").distinct()
    exact = (
        items.join(F.broadcast(cand), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    total = items.agg(F.count(F.lit(1)).cast("bigint").alias("__total"))
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("n") > F.lit(phi) * F.col("__total"))
        .select("item", "n")
    )


def equi_depth_histogram(
    df: DataFrame,
    col: Column | str,
    n_buckets: int = 8,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Equi-depth (quantile-bucketed) histogram — the complement of
    ``fixed_width_histogram`` for skewed columns, where fixed bins put
    99% of rows in one bar.

    NOT the naive global-``ntile`` plan (a single-partition window that
    dies at scale): bucket BOUNDARIES come from one interpolated-
    percentile aggregate (k−1 doubles — bytes), broadcast back, and
    rows assign themselves with a narrow k-comparison projection; the
    final rollup is a ≤k-group agg that ships kilobytes. Rows equal to
    a boundary go to the upper bucket.

    ``exact=True`` uses Spark's exact ``percentile`` (sorts the column
    in agg state — fine to ~10⁸ rows and the only oracle-comparable
    definition: DuckDB ``quantile_cont`` interpolates identically on
    integer inputs). ``exact=False`` swaps in ``approx_percentile``
    (GK sketch, bounded memory) — the 100 TB door, same plan shape.
    Returns (bucket, n, min_value, max_value)."""
    c = F.col(col) if isinstance(col, str) else col
    qs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    perc = F.percentile(c, qs) if exact else F.approx_percentile(c, qs, F.lit(accuracy)).cast("array<double>")
    bounds = df.agg(perc.alias("__bs"))
    return (
        df.select(c.alias("__v"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "__v",
            F.aggregate(
                "__bs", F.lit(0),
                lambda acc, b: acc + F.when(F.col("__v") >= b, 1).otherwise(0),
            ).cast("long").alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("__v").alias("min_value"),
            F.max("__v").alias("max_value"),
        )
    )


def seasonal_anomaly_report(
    events: "DataFrame",
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> "DataFrame":
    """Day-of-week seasonal baseline + per-day deviation — the metric
    monitor that knows Sundays differ from Mondays (a plain daily mean
    flags every weekend as an anomaly). Per (key, calendar day) the
    exact integer-cents total; per (key, day-of-week) the baseline
    over all observed days of that weekday; the deviation ratio
    ``day_cents / (dow_total / dow_days)`` computed as the SINGLE IEEE
    division of two exact BIGINT products (``day_cents·dow_days`` /
    ``dow_total``) so it hash-checks cross-engine — a chained double
    division would not.

    Plan: one (key, day) hash-agg over the raw events, then the
    weekday baselines as WINDOW aggregates over that day-level table
    partitioned by (key, dow) — `daily` has exactly ONE consumer, so
    the raw events scan runs once (the earlier groupBy + broadcast-
    join-back shape re-executed the events agg per consumer — the
    multi-consumer class the r13/r14 AST guard flags). The window
    shuffles only the day-level rows (≤ keys×days, kilobytes per
    group at any scale; never a global window). ``dow`` is
    0=Sunday..6 (DuckDB's ``dayofweek``; Spark's 1-based
    ``dayofweek`` is shifted to match).

    Returns (key, day, dow, day_cents, dow_days, dow_total_cents,
    ratio) — ratio NULL when the weekday total is zero.
    """
    from pyspark.sql import Window

    day = F.to_date(F.col(ts_col))
    daily = (
        events.select(
            F.col(key_col).alias("key"),
            day.alias("day"),
            F.round(F.col(value_col) * 100).cast("long").alias("__c"),
        )
        .groupBy("key", "day")
        .agg(F.sum("__c").alias("day_cents"))
        .select("key", "day", (F.dayofweek("day") - 1).cast("long").alias("dow"), "day_cents")
    )
    w = Window.partitionBy("key", "dow")
    return daily.select(
        "key",
        "day",
        "dow",
        "day_cents",
        F.count(F.lit(1)).over(w).cast("long").alias("dow_days"),
        F.sum("day_cents").over(w).alias("dow_total_cents"),
    ).select(
        "key",
        "day",
        "dow",
        "day_cents",
        "dow_days",
        F.col("dow_total_cents").cast("long").alias("dow_total_cents"),
        F.when(
            F.col("dow_total_cents") != 0,
            (F.col("day_cents") * F.col("dow_days")).cast("double")
            / F.col("dow_total_cents").cast("double"),
        ).alias("ratio"),
    )


def leakage_safe_split(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: int = 1,
) -> "DataFrame":
    """Train/val/test split that cannot leak a document across splits
    through its duplicates: rows whose normalized text is identical
    always co-assign, because the split hashes the duplicate GROUP's
    canonical (min) id rather than each row's own id — the
    decontamination failure mode ``hash_split`` alone permits (two
    byte-identical docs with different ids landing in train and test).

    Plan: the same one hash-aggregate exact dedup runs (map-side
    partial agg applies), an equi-join back to attach each row's
    canonical id, then ``hash_split``'s two exact-BIGINT MINSTD rounds
    on that canonical id — narrow, oracle-replayable. Both the
    aggregate and the join key on ``xxhash64`` of the normalized text,
    not the text itself (r08, VERDICT r07 ask #4): the two exchanges
    then carry an 8-byte key per row instead of shipping each document
    twice. The fingerprint is ONLY a key — no text-derived value is
    emitted — so results change only if two different normalized
    documents collide in the 64-bit space (~2⁻⁶⁴ per pair), which
    would co-assign the pair to one split: the safe direction for a
    leakage guard. Near-dup-safe splitting composes the same way with
    ``connected_components``' component id as the key.

    Returns df columns + (canonical_id, group_size, split).
    """
    from transe_pyspark_spark.operators.dedup import normalize_text

    fp = F.xxhash64(normalize_text(F.col(text_col)))
    groups = (
        df.select(F.col(id_col), fp.alias("__fp"))
        .groupBy("__fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).cast("long").alias("group_size"),
        )
    )
    joined = df.withColumn("__fp", fp).join(groups, "__fp").drop("__fp")
    return hash_split(joined, "canonical_id", fractions, salt)


def stratified_leakage_safe_split(
    df: "DataFrame",
    strata_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: int = 1,
    num_partitions: int | None = None,
) -> "DataFrame":
    """EXACT-QUOTA stratified train/val/test split with the leakage
    guarantee (r15, VERDICT r14 ask #5c) — the two split laws a
    training-data pipeline actually needs, in ONE operator:

    * **stratified, exact quotas**: within every stratum (language,
      source, ...), the duplicate GROUPS split exactly
      ``(n·80) div 100`` / next ``(n·90) div 100 − (n·80) div 100`` /
      rest — where ``hash_split``/``leakage_safe_split`` give only
      EXPECTED proportions (a small stratum can land 100% in train by
      hash luck; quota-exact per-stratum splits are how eval sets stay
      usable for rare languages);
    * **leakage-safe**: rows with identical normalized text always
      co-assign, because quotas apply to duplicate GROUPS keyed by
      the group's canonical (min) id — `leakage_safe_split`'s
      guarantee, kept under stratification by assigning each group
      the stratum of its CANONICAL row (``min_by``; a group spanning
      strata cannot be split without leaking, so the canonical's
      stratum wins deterministically).

    Order within a stratum is the MINSTD² mix of the canonical id
    (``hash_split``'s exact-BIGINT chain) tie-broken by the id itself —
    a total order, so the quota cut is a pure function of the data.

    Scale path: the in-stratum rank is NOT a
    ``Window.partitionBy(stratum)`` row_number — strata are
    tiny-cardinality (languages), so that window funnels each
    stratum's whole group table through one task. It is the
    ``gini_concentration`` distributed-prefix pattern
    (`_group_rank_rows`): range-repartition the GROUP table by
    (stratum, hash, id) with partition identity frozen, per-(stratum,
    partition) counts, broadcast exclusive offsets, partition-local
    row_number. Everything after the exact-dedup aggregate touches
    only group-sized rows (8-byte fingerprint keys — text never
    ships), and the doc-level join back is one fp-keyed equi-join.

    Returns df's (id, stratum) plus (canonical_id, group_size, split).
    """
    from transe_pyspark_spark.operators.dedup import normalize_text

    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    assert abs(sum(fractions.values()) - 1.0) < 1e-9
    n_part = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    m = 2147483647
    fp = F.xxhash64(normalize_text(F.col(text_col)))
    rows = df.select(F.col(id_col), F.col(strata_col), fp.alias("__fp"))
    h1 = F.pmod(F.pmod(F.col("__cid"), m) * 48271 + salt, m)
    # the dedup aggregate has exactly ONE consumer — the frozen
    # range-partition leaf below, which carries __fp and group_size
    # through the rank so the doc-level join back reads the CHECKPOINT,
    # never re-executing the corpus aggregate (the r08/r13
    # multi-consumer class, caught by the AST guard on this
    # function's first draft). The group key rides inside a
    # single-field struct so a NULL stratum survives the offset/size
    # equi-joins as its own group (the `_group_rank_rows` idiom).
    groups = (
        rows.groupBy("__fp")
        .agg(
            F.min(id_col).alias("__cid"),
            F.count(F.lit(1)).cast("long").alias("group_size"),
            F.min_by(strata_col, F.col(id_col)).alias("__stratum"),
        )
        .select(
            "__fp",
            "group_size",
            F.struct(F.col("__stratum").alias("g")).alias("__g"),
            F.pmod(h1 * 48271, m).cast("long").alias("__v"),
            F.col("__cid").alias("__id"),
        )
    )
    part = _frozen_range_partition(groups, ["__g", "__v", "__id"], int(n_part))
    off = _exclusive_offsets(
        part.groupBy("__g", "__pid").agg(F.count(F.lit(1)).alias("__w")),
        "__w",
        partition_cols=["__g"],
    )
    sizes = F.broadcast(
        part.groupBy("__g").agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    w_in = Window.partitionBy("__g", "__pid").orderBy("__v", "__id")
    ranked = (
        part.join(off, ["__g", "__pid"])
        .withColumn("__i", (F.row_number().over(w_in) + F.col("__off")).cast("long"))
        .join(sizes, "__g")
    )
    expr = None
    pct = 0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        pct += int(round(frac * 100))
        cond = F.col("__i") <= F.expr(f"(__n * {pct}) div 100")
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split_col = (
        expr.otherwise(items[-1][0]) if expr is not None else F.lit(items[-1][0])
    )
    gsplit = ranked.select(
        "__fp",
        F.col("__id").alias("canonical_id"),
        "group_size",
        split_col.alias("split"),
    )
    return rows.join(gsplit, "__fp").select(
        F.col(id_col),
        F.col(strata_col),
        "canonical_id",
        "group_size",
        "split",
    )


def time_decay_scores(
    events: "DataFrame",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_days: int = 7,
) -> "DataFrame":
    """Recency-weighted engagement score with EXACT integer half-life
    decay: each event contributes ``cents div 2^(age_days div
    half_life_days)``, age in whole days back from the corpus max day —
    the newsfeed/lead-scoring recency aggregate. The usual
    ``exp(−λ·age)`` float score is summation-order-dependent and
    libm-bound, so it can never hash-check; the halved-per-bucket
    integer form is order-free and exact while decaying the same way
    piecewise. The shift amount is capped at 62 (a BIGINT's width):
    anything older contributes 0 rather than overflowing the shift.
    Contract: cents are non-negative (integer division rounds toward
    zero on Spark and toward −∞ on DuckDB — identical only for
    non-negative operands, same as the repo's other ``div`` oracles).

    Plan: a 1-row max-day broadcast + ONE key hash-agg with map-side
    partials; the decay weight is a narrow projection.
    Returns (key, n_events, raw_cents, decayed_cents).
    """
    mx = events.agg(F.max(F.to_date(F.col(ts_col))).alias("__mx"))
    bucket = F.least(
        F.floor(
            F.datediff(F.col("__mx"), F.to_date(F.col(ts_col))) / half_life_days
        ).cast("int"),
        F.lit(62),
    )
    contrib = (
        events.crossJoin(F.broadcast(mx))
        .select(
            F.col(key_col).alias("key"),
            F.round(F.col(value_col) * 100).cast("long").alias("__c"),
            bucket.alias("__b"),
        )
        .select(
            "key",
            "__c",
            F.expr("__c div shiftleft(CAST(1 AS BIGINT), __b)").alias("__d"),
        )
    )
    return contrib.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("__c").cast("long").alias("raw_cents"),
        F.sum("__d").cast("long").alias("decayed_cents"),
    )


def gini_concentration(
    df: "DataFrame",
    group_col: str,
    value_cents_col: str,
    id_col: str,
    num_partitions: int | None = None,
) -> "DataFrame":
    """Per-group Gini coefficient of non-negative integer amounts —
    the revenue/holdings concentration index:
    ``G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)`` with ranks i ascending
    (ties broken by ``id_col``, so the statistic is deterministic).
    The numerator accumulates ``i·x`` in exact decimal(38,0) (rank ×
    cents exceeds BIGINT long before data gets big) and the result is
    ONE IEEE division — hash-checkable cross-engine, where a
    float-accumulated Lorenz sum is summation-order-dependent.

    Scale path: the in-group rank is NOT a
    ``Window.partitionBy(group)`` row_number — group cardinality is
    tiny by construction (nations, brands), so that window funnels
    every row of a group through one task. Instead the
    ``token_budget_sample`` per-stratum prefix pattern: range-
    repartition by the composite (group, value, id) key with partition
    identity FROZEN (``_frozen_range_partition``), aggregate tiny
    per-(group, partition) row counts, broadcast back each group's
    EXCLUSIVE prior-partition count, and add it to a partition-local
    row_number — the global in-group rank at any partition count.

    Contract: values are non-negative (Gini is undefined below zero).
    Returns (group, n, total_cents, gini) — gini NULL when n·Σx = 0.
    """
    n_part = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    # the group key rides inside a single-field struct: struct
    # comparison/equality treats NULL fields as equal, so a NULL group
    # survives the offset/size equi-joins below as its own group
    # (matching SQL PARTITION BY semantics) instead of silently
    # dropping its rows
    base = df.select(
        F.struct(F.col(group_col).alias("g")).alias("__g"),
        F.col(value_cents_col).cast("long").alias("__x"),
        F.col(id_col).alias("__id"),
    )
    part = _frozen_range_partition(base, ["__g", "__x", "__id"], int(n_part))
    off_df = _exclusive_offsets(
        part.groupBy("__g", "__pid").agg(F.count(F.lit(1)).alias("__w")),
        "__w",
        partition_cols=["__g"],
    )
    w_in = Window.partitionBy("__g", "__pid").orderBy("__x", "__id")
    ranked = part.join(off_df, ["__g", "__pid"]).withColumn(
        "__i", (F.row_number().over(w_in) + F.col("__off")).cast("long")
    )
    s_ix = F.sum(
        F.col("__i").cast("decimal(19,0)") * F.col("__x").cast("decimal(19,0)")
    )
    agg = ranked.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").cast("long").alias("total_cents"),
        s_ix.alias("__six"),
    )
    num = (
        F.lit(2).cast("decimal(38,0)") * F.col("__six")
        - (F.col("n") + 1).cast("decimal(38,0)") * F.col("total_cents").cast("decimal(38,0)")
    )
    den = F.col("n").cast("double") * F.col("total_cents").cast("double")
    return agg.select(
        F.col("__g").getField("g").alias(group_col),
        "n",
        "total_cents",
        F.when(den != 0, num.cast("double") / den).alias("gini"),
    )


def _group_rank_rows(
    df: "DataFrame",
    group_col: str,
    value_col: str,
    id_col: str,
    num_partitions: int | None = None,
) -> "DataFrame":
    """The distributed-prefix exact-rank core shared by
    ``group_percent_rank`` and ``rfm_segments``: each row's 1-based
    position ``__i`` under the deterministic (value, id) order within
    its group, plus the group size ``__n`` — computed WITHOUT a
    group-cardinality window (range-repartition by the composite key
    with partition identity frozen, per-(group, partition) counts,
    broadcast exclusive offsets, partition-local row_number).

    The group key rides inside a single-field struct (``__g.g``):
    struct equality treats NULL fields as equal, so NULL groups
    survive the offset/size equi-joins as a real group (SQL PARTITION
    BY semantics) rather than silently losing their rows.

    Returns (__g struct<g>, __id, __v, __i, __n).
    """
    n_part = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    base = df.select(
        F.struct(F.col(group_col).alias("g")).alias("__g"),
        F.col(value_col).cast("long").alias("__v"),
        F.col(id_col).alias("__id"),
    )
    part = _frozen_range_partition(base, ["__g", "__v", "__id"], int(n_part))
    off = _exclusive_offsets(
        part.groupBy("__g", "__pid").agg(F.count(F.lit(1)).alias("__w")),
        "__w",
        partition_cols=["__g"],
    )
    sizes = F.broadcast(
        part.groupBy("__g").agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    w_in = Window.partitionBy("__g", "__pid").orderBy("__v", "__id")
    return (
        part.join(off, ["__g", "__pid"])
        .withColumn("__i", (F.row_number().over(w_in) + F.col("__off")).cast("long"))
        .join(sizes, "__g")
    )


def group_percent_rank(
    df: "DataFrame",
    group_col: str,
    value_col: str,
    id_col: str,
    num_partitions: int | None = None,
) -> "DataFrame":
    """Normalized in-group rank — the rank-based feature transform
    (quantile normalization input): each row gets
    ``(i − 1) / (n − 1)`` where ``i`` is its 1-based position under the
    deterministic ``(value, id)`` order within its group and ``n`` the
    group size (0.0 for singleton groups). Row-number semantics (ties
    take distinct quantiles via the id tiebreak), so the output is a
    pure function of the data and hash-checks against a plain SQL
    ``row_number``/``count`` window pair.

    Scale path: the in-group position is NOT a
    ``Window.partitionBy(group)`` — tiny-cardinality groups (languages,
    nations) would funnel through one task. It is the
    ``token_budget_sample``/``gini_concentration`` distributed-prefix
    pattern: range-repartition by the composite (group, value, id) key
    with partition identity FROZEN, per-(group, partition) row counts,
    broadcast exclusive offsets, partition-local row_number. Group
    sizes come from one more tiny aggregate over the frozen leaf.

    Returns (group, id, value, pr).
    """
    ranked = _group_rank_rows(df, group_col, value_col, id_col, num_partitions)
    return ranked.select(
        F.col("__g").getField("g").alias(group_col),
        F.col("__id").alias(id_col),
        F.col("__v").alias(value_col),
        F.when(
            F.col("__n") > 1,
            (F.col("__i") - 1).cast("double") / (F.col("__n") - 1).cast("double"),
        ).otherwise(F.lit(0.0)).alias("pr"),
    )



def discrete_quantiles(
    df: "DataFrame",
    group_col: str,
    value_col: str,
    id_col: str,
    qs: list[tuple[int, int]],
    num_partitions: int | None = None,
) -> "DataFrame":
    """EXACT type-1 (discrete) quantiles per group: for each
    ``q = num/den`` the element at 1-based position
    ``max(1, ceil(q·n))`` of the group's value-ordered rows — DuckDB's
    ``quantile_disc`` semantics (probed across sizes incl. exact
    multiples, and pytest-pinned against quantile_disc itself), which
    closes the documented interpolated-vs-discrete oracle gap: Spark's
    ``percentile`` interpolates, so exact cross-engine quantiles need
    ELEMENT SELECTION, not arithmetic. Quantile points are integer
    rationals because the boundary must be computed exactly —
    ``ceil(0.9·10)`` in binary floating point is 10, not 9 (the
    off-by-one every float formulation hits at exact multiples);
    ``idx = (num·n + den − 1) div den`` never leaves BIGINT on either
    engine.

    Scale path: the in-group position is the ``_group_rank_rows``
    distributed prefix-rank (range-repartition, frozen partition ids,
    broadcast exclusive offsets — never a ``Window.partitionBy(group)``
    that funnels a tiny-cardinality group through one task). The |qs|
    target positions per group derive from the |groups|-sized size
    table and BROADCAST back onto the ranked rows as an equi-join on
    (group, position) — no per-row explode, no second pass over the
    data. Ties: the selected VALUE at a sorted position is unique as a
    value, so the (value, id) tiebreak cannot change the answer.

    NULL values are ignored (SQL aggregate semantics — DuckDB's
    quantile_disc skips them); a group whose values are all NULL emits
    nothing. Returns (group, q_num, q_den, value) — one row per
    (group, q).
    """
    for num, den in qs:
        if not (isinstance(num, int) and isinstance(den, int) and 0 <= num <= den and den > 0):
            raise ValueError(f"quantile must be an integer rational 0 <= num/den <= 1, got {num}/{den}")
    ranked = _group_rank_rows(
        df.filter(F.col(value_col).isNotNull()),
        group_col, value_col, id_col, num_partitions,
    )
    targets = (
        ranked.groupBy("__g")
        .agg(F.first("__n").alias("__n"))
        .select(
            "__g",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(num).cast("long").alias("q_num"),
                        F.lit(den).cast("long").alias("q_den"),
                        F.greatest(
                            F.lit(1).cast("long"),
                            # integer DIV, not `/`: double division can
                            # cross an integer boundary after rounding
                            F.expr(
                                f"CAST(({num} * __n + {den - 1}) DIV {den} AS LONG)"
                            ),
                        ).alias("__i"),
                    )
                    for num, den in qs
                ])
            ).alias("__q"),
        )
        .select("__g", "__q.q_num", "__q.q_den", "__q.__i")
    )
    return (
        ranked.join(F.broadcast(targets), ["__g", "__i"])
        .select(
            F.col("__g").getField("g").alias(group_col),
            "q_num",
            "q_den",
            F.col("__v").alias(value_col),
        )
    )


def rfm_segments(
    orders: "DataFrame",
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_tiles: int = 5,
    num_partitions: int | None = None,
    eager_cleanup: bool = True,
) -> "DataFrame":
    """RFM customer segmentation — the classic marketing rollup: per
    customer Recency (days from their last order to the table's max
    order date), Frequency (order count) and Monetary (exact
    per-row-rounded cents), each scored into ``n_tiles`` equal-height
    tiles, then the |tiles|³-bounded segment grid with customer counts
    and exact monetary mass.

    Scores are 1..n_tiles with n_tiles = best (most recent / most
    frequent / highest spend). Tiling is the deterministic
    ``floor(rank·k / n)`` rule over the (metric, custkey) total order —
    row-number semantics, so ties split by custkey and the whole output
    is a pure function of the data (SQL ntile has the same property
    under the same ORDER BY but a different remainder rule; the oracle
    replicates THIS rule). Integer ``div`` keeps the tile exact at any
    cardinality — no float rank arithmetic.

    Scale path: one hash-agg collapses orders to customer grain (the
    only pass over the big table; the global max date rides a 1-row
    broadcast); the customer-grain table is PINNED (repartition on
    custkey + cache — it has four consumers: three rank passes and the
    join spine, and without the pin each would re-run the orders
    aggregation). Each of the three tile assignments is the
    ``_group_rank_rows`` distributed prefix-rank over the pinned
    table — never a global ntile window (one task at any size). The
    three ranked sides join back on custkey, the final rollup is
    ≤ n_tiles³ groups, and that tiny result is checkpoint-truncated so
    the pin is released before returning (``eager_cleanup=False``
    keeps the lazy plan for inspection).

    Returns (r_score, f_score, m_score, n_customers,
    sum_monetary_cents).
    """
    max_d = F.broadcast(
        orders.agg(F.max(F.col(date_col)).alias("__maxd"))
    )
    per_cust = (
        orders.select(
            F.col(cust_col).alias("__ck"),
            F.col(date_col).alias("__d"),
            F.round(F.col(amount_col) * 100).cast("long").alias("__cents"),
        )
        .groupBy("__ck")
        .agg(
            F.max("__d").alias("__lastd"),
            F.count(F.lit(1)).cast("long").alias("__f"),
            F.sum("__cents").alias("__m"),
        )
        .crossJoin(max_d)
        .select(
            "__ck",
            F.datediff(F.col("__maxd"), F.col("__lastd")).cast("long").alias("__r"),
            "__f",
            "__m",
        )
    )
    n_part = int(
        num_partitions
        or orders.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    per_cust = per_cust.repartition(n_part, "__ck").cache()
    per_cust.count()
    k = F.lit(int(n_tiles))

    def tile(metric: str, score_name: str, invert: bool) -> "DataFrame":
        ranked = _group_rank_rows(
            per_cust.withColumn("__one", F.lit(1)),
            "__one",
            metric,
            "__ck",
            num_partitions,
        )
        scored = ranked.select(
            F.col("__id").alias("__ck"),
            ((F.col("__i") - 1) * k).cast("long").alias("__x"),
            F.col("__n").alias("__nn"),
        ).selectExpr("__ck", "__x div __nn AS __b")
        score = (k - F.col("__b")) if invert else (F.col("__b") + F.lit(1))
        return scored.select("__ck", score.cast("long").alias(score_name))
    r = tile("__r", "r_score", invert=True)
    f_ = tile("__f", "f_score", invert=False)
    m = tile("__m", "m_score", invert=False)
    out = (
        per_cust.select("__ck", "__m")
        .join(r, "__ck")
        .join(f_, "__ck")
        .join(m, "__ck")
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("__m").cast("long").alias("sum_monetary_cents"),
        )
    )
    if not eager_cleanup:
        return out
    out = out.localCheckpoint(eager=True)
    per_cust.unpersist()
    return out


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """2-D Pareto frontier (skyline), minimizing both dimensions: keep
    every row for which NO other row is <= on both axes and strictly <
    on at least one (beyond-reference north-star op — the classic
    "cheapest AND smallest" shortlist; SQL expresses it as a NOT
    EXISTS anti-self-join, which is how the registered face's oracle
    states the definition).

    NOT a quadratic self-join and NOT a global sort: with two
    dimensions the frontier is a staircase, so domination collapses to
    per-x-value minima plus a strict prefix-min scan over x. Plan: one
    hash aggregate ``min(y) GROUP BY x`` (the only corpus-sized
    shuffle); the strict prefix-min over that aggregate rides the
    ``_frozen_range_partition`` distributed prefix — range-partition
    by x with partition identity frozen, per-partition minima
    broadcast back as exclusive cross-partition offsets, the running
    min inside each tile — because for a CONTINUOUS x the aggregate
    is ~corpus-sized and a pid-less ``Window.orderBy(x)`` would
    funnel it through one task (the ``ks_statistic`` tiling;
    prefix-min is associative so the same two-pass shape applies).
    The surviving (x, min_y) staircase is FRONTIER-sized (output-
    sized by contract) and broadcast-semi-joins back to the full
    table. Ties co-survive: rows equal on BOTH axes don't dominate
    each other (no strict inequality), so every row matching a
    staircase step is kept — exactly the NOT EXISTS semantics.

    Returns the input rows (all columns) on the frontier.
    """
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    per_x = df.groupBy(x_col).agg(F.min(F.col(y_col)).alias("__min_y"))
    part = _frozen_range_partition(per_x, x_col, n_part)
    tile_mins = part.groupBy("__pid").agg(F.min("__min_y").alias("__tmin"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = F.broadcast(
        tile_mins.select("__pid", F.min("__tmin").over(w_off).alias("__off_min"))
    )
    w_in = Window.partitionBy("__pid").orderBy(x_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    steps = (
        part.join(offs, "__pid")
        .withColumn(
            "__prev_best", F.least(F.min("__min_y").over(w_in), F.col("__off_min"))
        )
        .filter(F.col("__prev_best").isNull() | (F.col("__min_y") < F.col("__prev_best")))
        .select(x_col, F.col("__min_y"))
    )
    # qualified aliases: steps descends from df, and Spark's ambiguous-
    # self-join detection flags dataset-indexed columns across that
    # shared lineage on file-sourced frames
    return df.alias("__sky_base").join(
        F.broadcast(steps.alias("__sky_steps")),
        (F.col(f"__sky_base.{x_col}") == F.col(f"__sky_steps.{x_col}"))
        & (F.col(f"__sky_base.{y_col}") == F.col("__sky_steps.__min_y")),
        "left_semi",
    )


def _two_sample_value_prefix(
    df: DataFrame,
    group_col: str,
    value_expr,
    group_a,
    group_b,
    n_part: int,
):
    """Shared scaffolding for the exact two-sample order statistics
    (``ks_statistic`` sup-norm, ``wasserstein_1d`` integral,
    ``mannwhitney_u`` rank-sum): the per-distinct-value count
    aggregate for the two samples — the ONLY corpus-sized shuffle any
    of them pays — with BOTH cumulative counts carried through the
    ``_frozen_range_partition`` distributed prefix (per-tile running
    sums + broadcast exclusive offsets), never a pid-less global
    window.

    Returns ``(cum, sizes, totals)``: ``cum`` has one row per distinct
    value — (__pid, __v, __ca, __cb, __cuma, __cumb), cumulative
    counts INCLUSIVE of the row's value; ``sizes`` is the tiny
    per-tile frame (__pid, __sa, __sb, __vmin — the minima give
    cross-tile successors to gap-based statistics); ``totals`` is the
    one-row (n_a, n_b) derived from ``sizes``, never from the
    uncached per-value aggregate (the multi-consumer trap; r10
    advisory). Unused columns prune away per consumer.

    NULL contract: NULL values are EXCLUDED up front — rank statistics
    over NULLs are meaningless, and a NULL ``__v`` group would enter
    the range-partition/cumsum machinery where Spark's NULLS FIRST
    ordering silently diverges from the oracle's NULLS LAST (r11
    advisory; the isNotNull discipline of the sibling faces).
    """
    val = F.col(value_expr) if isinstance(value_expr, str) else value_expr
    ga, gb = F.col(group_col) == F.lit(group_a), F.col(group_col) == F.lit(group_b)
    pv = (
        df.filter((ga | gb) & val.isNotNull())
        .groupBy(val.alias("__v"))
        .agg(
            F.sum(F.when(ga, 1).otherwise(0)).cast("long").alias("__ca"),
            F.sum(F.when(gb, 1).otherwise(0)).cast("long").alias("__cb"),
        )
    )
    part = _frozen_range_partition(pv, "__v", n_part)
    sizes = part.groupBy("__pid").agg(
        F.sum("__ca").cast("long").alias("__sa"),
        F.sum("__cb").cast("long").alias("__sb"),
        F.min("__v").alias("__vmin"),
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = F.broadcast(
        sizes.select(
            "__pid",
            F.coalesce(F.sum("__sa").over(w_off), F.lit(0)).cast("long").alias("__offa"),
            F.coalesce(F.sum("__sb").over(w_off), F.lit(0)).cast("long").alias("__offb"),
        )
    )
    w_in = Window.partitionBy("__pid").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = part.join(offs, "__pid").select(
        "__pid",
        "__v",
        "__ca",
        "__cb",
        (F.sum("__ca").over(w_in) + F.col("__offa")).cast("long").alias("__cuma"),
        (F.sum("__cb").over(w_in) + F.col("__offb")).cast("long").alias("__cumb"),
    )
    totals = sizes.agg(
        F.sum("__sa").cast("long").alias("n_a"), F.sum("__sb").cast("long").alias("n_b")
    )
    return cum, sizes, totals


def ks_statistic(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic over UNBUCKETED
    values — ``D = max_v |F_a(v) − F_b(v)|`` evaluated at every
    observed value (sufficient for the discrete empirical CDFs) — the
    order-statistic drift screen next to ``distribution_drift``'s
    bucketed total variation: KS catches location/shape shifts a
    coarse bucketing smears away, with no bucket-width knob to tune.

    Exactness: ``|F_a − F_b| = |cum_a·n_b − cum_b·n_a| / (n_a·n_b)``,
    so the argmax rides EXACT integer numerators (cumulative counts in
    BIGINT, cross products in decimal(38,0) — DuckDB HUGEINT takes
    the same road) and the result is ONE IEEE division.

    Scale path: the cumulative counts do NOT ride a global window —
    that funnels every distinct value through one task. The per-value
    count aggregate (the only corpus-sized shuffle) is range-
    partitioned by value with partition identity FROZEN
    (``_frozen_range_partition``), cumsums run within each partition,
    and each partition adds the broadcast exclusive offsets of its
    predecessors — the ``dict_encode`` / ``gini_concentration``
    distributed-prefix pattern, here carrying TWO running sums through
    one tiling.

    Returns ONE row: (n_a, n_b, d_num, ks_d) with
    ``ks_d = d_num / (n_a·n_b)``; d_num is returned as BIGINT (exact
    while n_a·max(cum) < 2⁶³ — at larger scales read ks_d, whose
    decimal-128 intermediates never overflow).
    """
    n_part = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    cum, sizes, totals = _two_sample_value_prefix(
        df, group_col, value_col, group_a, group_b, n_part
    )

    def d38(c):
        return c.cast("decimal(38,0)")

    dmax = cum.crossJoin(F.broadcast(totals)).agg(
        F.max(
            F.abs(d38(F.col("__cuma")) * d38(F.col("n_b")) - d38(F.col("__cumb")) * d38(F.col("n_a")))
        ).alias("__dnum")
    )
    return dmax.crossJoin(F.broadcast(totals)).select(
        "n_a",
        "n_b",
        F.col("__dnum").cast("long").alias("d_num"),
        (
            F.col("__dnum").cast("double")
            / (d38(F.col("n_a")) * d38(F.col("n_b"))).cast("double")
        ).alias("ks_d"),
    )


def wasserstein_1d(
    df: DataFrame,
    group_col: str,
    value_expr,
    group_a,
    group_b,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth-mover) distance between two
    samples — the INTEGRAL drift screen that completes the suite: TV
    (bucketed L1), KL/PSI (likelihood ratios), KS (sup-norm of the CDF
    gap), and now W1 = the AREA of the CDF gap, ``∫ |F_a − F_b| dv``.
    Unlike KS it weighs HOW FAR mass moved, not just the worst single
    gap — a uniform small shift and one relocated outlier that KS
    scores identically separate cleanly, and the result reads in VALUE
    UNITS (mean transport distance), the number a pipeline alert can
    threshold meaningfully.

    For empirical CDFs the integral is the exact finite sum
    ``Σ_i |F_a(v_i) − F_b(v_i)| · (v_{i+1} − v_i)`` over sorted
    distinct observed values. ``value_expr`` must be INTEGRAL (cents —
    the house exactness idiom): every term is then the exact integer
    ``|cuma·n_b − cumb·n_a| · Δv``, the sum rides decimal(38,0)
    (DuckDB HUGEINT takes the same road), and ONE IEEE division at the
    end gives ``w1 = w1_num / (n_a·n_b)``.

    Scale path: the ``_two_sample_value_prefix`` tiling — per-value
    counts on the frozen range partition, both cumsums as broadcast
    exclusive offsets + in-tile running sums. The next-value gap costs
    one extra move: ``lead(v)`` INSIDE each tile, with each tile's
    LAST row taking the NEXT tile's first value from the broadcast
    per-tile minima the sizes frame already carries — the cross-tile
    handoff stays aggregate-sized, never a pid-less window. The
    globally last value has no successor and contributes 0 (both CDFs
    are 1 there, so the gap beyond it is 0 anyway).

    Returns ONE row: (n_a, n_b, w1_num, w1) with w1_num BIGINT (exact
    while it fits 2⁶³ — at larger scales read w1, whose decimal-128
    intermediates never overflow).
    """
    n_part = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    cum, sizes, totals = _two_sample_value_prefix(
        df, group_col, value_expr, group_a, group_b, n_part
    )
    w_pid = Window.orderBy("__pid")
    nxt = F.broadcast(
        sizes.select("__pid", F.lead("__vmin").over(w_pid).alias("__tile_next"))
    )
    w_lead = Window.partitionBy("__pid").orderBy("__v")
    gaps = cum.join(nxt, "__pid").withColumn(
        "__nv", F.coalesce(F.lead("__v").over(w_lead), F.col("__tile_next"))
    )

    def d38(c):
        return c.cast("decimal(38,0)")

    num = gaps.crossJoin(F.broadcast(totals)).agg(
        F.sum(
            F.when(
                F.col("__nv").isNotNull(),
                F.abs(
                    d38(F.col("__cuma")) * d38(F.col("n_b"))
                    - d38(F.col("__cumb")) * d38(F.col("n_a"))
                )
                * d38(F.col("__nv").cast("long") - F.col("__v").cast("long")),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("__w1num")
    )
    return num.crossJoin(F.broadcast(totals)).select(
        "n_a",
        "n_b",
        F.col("__w1num").cast("long").alias("w1_num"),
        (
            F.col("__w1num").cast("double")
            / (d38(F.col("n_a")) * d38(F.col("n_b"))).cast("double")
        ).alias("w1"),
    )


def mannwhitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact two-sample Mann-Whitney U (Wilcoxon rank-sum) with
    midrank tie handling — the nonparametric LOCATION screen beside
    ``ks_statistic``'s shape test: its normalization
    ``auc_a = U_a / (n_a·n_b)`` is literally P(random A > random B,
    ties half) — the common-language effect size / ROC-AUC of the two
    samples, so drift reads as a probability (0.5 = no shift).

    Exactness — NO midrank floats ever materialize: counting pairs per
    distinct value, ``U_a = Σ_v ca·(cumb − cb) + ca·cb/2`` (strict
    wins over everything below v, half credit on ties at v), so the
    DOUBLED statistic ``2·U_a = Σ_v ca·(2·cumb − cb)`` is an exact
    integer; the DuckDB oracle replays it in HUGEINT, and the
    invariant ``u2_a + u2_b = 2·n_a·n_b`` holds term-for-term. ONE
    IEEE division at the end gives the AUC.

    Same scale path as the siblings: ``_two_sample_value_prefix`` —
    per-value counts, frozen-tile cumsums, broadcast offsets; the U
    fold is one scalar aggregate over the value-cardinality frame.
    Returns ONE row: (n_a, n_b, u2_a, u2_b, auc_a) with u2_a/u2_b
    exact BIGINT.
    """
    n_part = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    cum, sizes, totals = _two_sample_value_prefix(
        df, group_col, value_col, group_a, group_b, n_part
    )

    def d38(c):
        return c.cast("decimal(38,0)")

    u = cum.agg(
        F.sum(
            d38(F.col("__ca")) * d38(F.lit(2) * F.col("__cumb") - F.col("__cb"))
        ).alias("__u2a"),
        F.sum(
            d38(F.col("__cb")) * d38(F.lit(2) * F.col("__cuma") - F.col("__ca"))
        ).alias("__u2b"),
    )
    return u.crossJoin(F.broadcast(totals)).select(
        "n_a",
        "n_b",
        F.col("__u2a").cast("long").alias("u2_a"),
        F.col("__u2b").cast("long").alias("u2_b"),
        (
            F.col("__u2a").cast("double")
            / (d38(F.lit(2)) * d38(F.col("n_a")) * d38(F.col("n_b"))).cast("double")
        ).alias("auc_a"),
    )


def spearman_corr(
    df: DataFrame,
    x_expr,
    y_expr,
    num_partitions: int | None = None,
    eager_cleanup: bool = True,
) -> DataFrame:
    """Exact Spearman rank correlation between two columns — the
    MONOTONE-dependence screen next to ``daily_corr``'s Pearson:
    invariant under any monotone transform of either axis (log-scaled
    metrics, heavy tails, price-vs-quantity curves), it answers "do
    these move together" without assuming linearity, with ties
    handled by textbook midranks.

    Exactness — NO midrank floats, NO mean-centering floats: the
    CENTERED DOUBLED midrank of a value with inclusive cumulative
    count ``cum`` and tie count ``c`` is the exact integer
    ``d = 2·cum − c − n`` (= 2·(avg rank) − (n+1); doubling clears the
    ½s, and Σd = 0 by construction so no mean ever needs computing).
    Then ``ρ = Σ dx·dy / √(Σdx² · Σdy²)`` with all three sums exact
    decimal-128 (|d| ≤ n keeps Σd² ≤ n³ inside 38 digits up to
    n ≈ 10¹²) — one sqrt + one IEEE division at the end, rounded to
    the 6-dp output contract. DuckDB replays the ranks with
    ``2·rank() + count(*) OVER (PARTITION BY v) − 1`` in HUGEINT.

    Scale path: the not-null pair projection pins ONCE (three
    consumers: both per-value count aggregates and the scoring join);
    each axis pays one per-value aggregate carried through the
    ``_frozen_range_partition`` distributed prefix (the two-sample
    siblings' tiling — never a pid-less rank window), and the
    value→rank maps join back by hash equi-join (value-cardinality
    right sides — NOT broadcast, they can be corpus-sized for
    continuous axes). Total: one pin + two aggregate shuffles + two
    keyed joins + one scalar fold.

    Returns ONE row: (n_rows, spearman). Undefined (NULL) when either
    axis is constant (zero rank variance).
    """
    n_part = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    x = F.col(x_expr) if isinstance(x_expr, str) else x_expr
    y = F.col(y_expr) if isinstance(y_expr, str) else y_expr
    p = (
        df.select(x.alias("__x"), y.alias("__y"))
        .filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
        .cache()
    )

    def _centered_ranks(col: str, alias: str):
        """(col, d) — per distinct value, the centered doubled
        midrank as an exact BIGINT; and the 1-row total count."""
        pv = p.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("__c"))
        part = _frozen_range_partition(pv, col, n_part)
        sizes = part.groupBy("__pid").agg(F.sum("__c").cast("long").alias("__s"))
        # offsets AND total from ONE consumer of sizes (guard class)
        offs = _offsets_with_total(sizes, "__s")
        w_in = Window.partitionBy("__pid").orderBy(col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        cum = (
            part.join(offs, "__pid")
            .withColumn("__cum", (F.sum("__c").over(w_in) + F.col("__off")).cast("long"))
            .select(
                col,
                (F.lit(2) * F.col("__cum") - F.col("__c") - F.col("__n"))
                .cast("long")
                .alias(alias),
                "__n",
            )
        )
        return cum

    rx = _centered_ranks("__x", "__dx")
    ry = _centered_ranks("__y", "__dy").drop("__n")

    def d38(c):
        return c.cast("decimal(38,0)")

    s = (
        p.join(rx, "__x")
        .join(ry, "__y")
        .agg(
            F.first("__n").alias("n_rows"),
            F.sum(d38(F.col("__dx")) * d38(F.col("__dy"))).alias("__sxy"),
            F.sum(d38(F.col("__dx")) * d38(F.col("__dx"))).alias("__sxx"),
            F.sum(d38(F.col("__dy")) * d38(F.col("__dy"))).alias("__syy"),
        )
    )
    out = s.select(
        "n_rows",
        F.round(
            F.col("__sxy").cast("double")
            / F.sqrt(F.col("__sxx").cast("double") * F.col("__syy").cast("double")),
            6,
        ).alias("spearman"),
    )
    if not eager_cleanup:
        return out
    out = out.localCheckpoint(eager=True)
    p.unpersist()
    return out


def mann_kendall(
    series: DataFrame,
    t_col: str,
    x_col: str,
) -> DataFrame:
    """Mann-Kendall trend test over an integer-indexed series — the
    NONPARAMETRIC monotone-trend screen beside ``trend_per_key``'s
    OLS slope: S = Σ_{i<j} sign(x_j − x_i) counts concordant minus
    discordant time-ordered pairs, so one outlier shifts S by at most
    n−1 where it can move a least-squares slope arbitrarily.

    Exactness: S and the tie-corrected variance are exact integers —
    ``var18 = n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)`` (the ×18 form
    stays integral; decimal-128 for the cubics) — and the normal
    approximation ``z = (S − sign(S)) / √(var18/18)`` is the only
    float, 6 dp (standard continuity correction; z = 0 when S = 0).

    Plan contract: ``series`` is an already-aggregated CALENDAR-
    BOUNDED frame (the ``lag_autocorr`` contract), checkpointed once;
    the pair set is the |series|²/2 self-join on ``t_i < t_j`` — an
    explicit, documented quadratic over a bounded-by-contract input
    (≤ a few thousand rows for years of days), NOT a corpus join; tie
    groups come from one value aggregate. Returns ONE row:
    (n, s, var18, z).
    """
    s = (
        series.select(
            F.col(t_col).cast("long").alias("__t"), F.col(x_col).cast("long").alias("__x")
        )
        .filter(F.col("__x").isNotNull())
        .localCheckpoint(eager=True)
    )
    a = s.select(F.col("__t").alias("__ta"), F.col("__x").alias("__xa"))
    b = s.select(F.col("__t").alias("__tb"), F.col("__x").alias("__xb"))
    pairs = a.join(b, F.col("__ta") < F.col("__tb"))
    s_stat = pairs.agg(
        F.sum(F.signum(F.col("__xb") - F.col("__xa")).cast("long")).alias("s"),
    )
    n_row = s.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        s.groupBy("__x")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        .filter(F.col("__c") > 1)
    )

    def d38(c):
        return c.cast("decimal(38,0)")

    tie_sum = ties.agg(
        F.coalesce(
            F.sum(d38(F.col("__c")) * d38(F.col("__c") - 1) * d38(2 * F.col("__c") + 5)),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("__ts")
    )
    out = (
        s_stat.crossJoin(F.broadcast(n_row))
        .crossJoin(F.broadcast(tie_sum))
        .withColumn(
            "var18",
            (
                d38(F.col("n")) * d38(F.col("n") - 1) * d38(2 * F.col("n") + 5)
                - F.col("__ts")
            ).cast("long"),
        )
    )
    z = F.when(F.col("s") == 0, F.lit(0.0)).otherwise(
        F.round(
            (F.col("s") - F.signum(F.col("s"))).cast("double")
            / F.sqrt(F.col("var18").cast("double") / 18.0),
            6,
        )
    )
    return out.select("n", "s", "var18", z.alias("z"))


def runs_test(
    series: DataFrame,
    t_col: str,
    x_col: str,
) -> DataFrame:
    """Wald-Wolfowitz runs test around the exact discrete median —
    the RANDOMNESS screen for an ordered series (too FEW runs =
    clustering/trend, too MANY = oscillation): values above the median
    are '+', below are '−', exact-median values drop (the standard
    convention), and R counts the maximal same-sign runs.

    Exactness: the median is the type-1 discrete element (DuckDB
    ``quantile_disc`` parity — never an interpolated float), the
    signs, run count, and side counts are exact integers, and the
    normal approximation ``z = (R − μ)/σ`` with ``μ = 1 + 2ab/(a+b)``,
    ``σ² = 2ab(2ab − a − b)/((a+b)²(a+b−1))`` is the only float
    (identical expression shape on both engines), 6 dp.

    Plan contract: the ``lag_autocorr``/``mann_kendall`` bounded-
    series contract — runs count via one lag window over the
    |series|-row checkpointed frame (calendar-bounded by contract).
    Returns ONE row: (n_plus, n_minus, n_runs, z); z NULL whenever σ²
    is undefined or zero — either side empty, OR n_plus = n_minus = 1
    (the only positive-count case with 2ab = a+b, which zeroes the
    numerator 2ab(2ab−a−b); r11 advisory — without the guard z would
    read 0/0 = NaN there).
    """
    s0 = (
        series.select(
            F.col(t_col).cast("long").alias("__t"), F.col(x_col).cast("long").alias("__x")
        )
        .filter(F.col("__x").isNotNull())
        .localCheckpoint(eager=True)
    )
    med = F.broadcast(
        s0.agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __x)").alias("__m")
        )
    )
    signed = (
        s0.crossJoin(med)
        .filter(F.col("__x") != F.col("__m"))
        .select("__t", F.when(F.col("__x") > F.col("__m"), 1).otherwise(-1).alias("__s"))
    )
    w = Window.orderBy("__t")
    runs = signed.select(
        "__s",
        F.when(F.lag("__s").over(w).isNull() | (F.lag("__s").over(w) != F.col("__s")), 1)
        .otherwise(0)
        .alias("__new_run"),
    )
    agg = runs.agg(
        F.sum(F.when(F.col("__s") == 1, 1).otherwise(0)).cast("long").alias("n_plus"),
        F.sum(F.when(F.col("__s") == -1, 1).otherwise(0)).cast("long").alias("n_minus"),
        F.sum("__new_run").cast("long").alias("n_runs"),
    )
    a, b, r = (
        F.col("n_plus").cast("double"),
        F.col("n_minus").cast("double"),
        F.col("n_runs").cast("double"),
    )
    mu = F.lit(1.0) + 2.0 * a * b / (a + b)
    sig2 = (2.0 * a * b * (2.0 * a * b - a - b)) / ((a + b) * (a + b) * (a + b - 1.0))
    # σ² > 0 ⇔ 2ab > a+b for positive integer counts (fails only at
    # a=b=1, where σ²=0 and z would be NaN); the guard subsumes the
    # both-sides-nonempty check (a=0 or b=0 gives 2ab=0 ≤ a+b)
    z = F.when(
        (F.col("n_plus") > 0)
        & (F.col("n_minus") > 0)
        & (F.lit(2) * F.col("n_plus") * F.col("n_minus") > F.col("n_plus") + F.col("n_minus")),
        F.round((r - mu) / F.sqrt(sig2), 6),
    )
    return agg.select("n_plus", "n_minus", "n_runs", z.alias("z"))


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_expr,
    id_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Quantile normalization across groups — the batch-effect
    corrector (microarray-era classic, now the feature-alignment step
    when per-source measurement scales differ): each value maps to
    the POOLED distribution's element at its within-group fractional
    rank, ``x → Q_pooled(F_g(x))``, so every group ends up with the
    same marginal distribution while in-group ORDER is preserved.

    Exact type-1 discrete semantics, no interpolation floats: ranks
    use the deterministic total order (value, id) — every row gets a
    distinct integer rank, ties on value take consecutive ranks and
    map to equal pooled values — and the target position is
    ``p = ⌈r·N / n_g⌉`` by integer arithmetic (decimal-128 DIV; r=n_g
    hits p=N exactly). The normalized value is the pooled p-th order
    statistic — the ``discrete_quantiles`` element-selection
    primitive, here at row granularity.

    Scale path — ONE ``_frozen_range_partition`` tiling on
    (value, id) serves BOTH rank machines: the global rank (per-tile
    row_number + broadcast exclusive tile counts) and the per-group
    rank (per-(tile, group) row_number + per-group exclusive offsets
    from the tiny |tiles|×|groups| sizes frame — group cardinality is
    BOUNDED BY CONTRACT, batches/sources, never corpus-proportional).
    The target lookup is one hash equi-join of the row table against
    the global-rank map on ``p = rank`` — corpus-sized both sides,
    integer key, never a sort or a pid-less window.

    Returns (id, group, value, norm_value), one row per input row.
    """
    n_part = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    v = F.col(value_expr) if isinstance(value_expr, str) else value_expr
    base = df.select(
        F.col(group_col).alias("__g"),
        v.cast("long").alias("__v"),
        F.col(id_col).alias("__id"),
    ).filter(F.col("__v").isNotNull())
    part = _frozen_range_partition(base, ["__v", "__id"], n_part)
    # global rank: per-tile counts -> exclusive offsets + grand total
    # from ONE consumer of the sizes aggregate (guard class — the
    # earlier offs/tot pair re-executed the sizes agg per consumer)
    sizes = part.groupBy("__pid").agg(F.count(F.lit(1)).cast("long").alias("__s"))
    offs = _offsets_with_total(sizes, "__s")
    w_row = Window.partitionBy("__pid").orderBy("__v", "__id")
    pooled = (
        part.join(offs, "__pid")
        .select(
            "__v",
            (F.row_number().over(w_row) + F.col("__off")).cast("long").alias("__p"),
        )
    )
    # per-group rank: per-(tile, group) counts -> per-group offsets
    # and per-group totals, again one consumer of the gsizes agg
    gsizes = part.groupBy("__pid", "__g").agg(
        F.count(F.lit(1)).cast("long").alias("__gs")
    )
    goffs = _offsets_with_total(
        gsizes, "__gs", partition_cols=["__g"], total_col="__ng"
    ).withColumnRenamed("__off", "__goff")
    w_grow = Window.partitionBy("__pid", "__g").orderBy("__v", "__id")
    ranked = (
        part.join(goffs, ["__pid", "__g"])
        .join(offs.select("__pid", "__n"), "__pid")
        .withColumn(
            "row_r",
            (F.row_number().over(w_grow) + F.col("__goff")).cast("long"),
        )
        .select(
            "__g",
            "__v",
            "__id",
            F.expr(
                "CAST((CAST(row_r AS DECIMAL(38,0)) * __n + __ng - 1) DIV __ng AS LONG)"
            ).alias("__p"),
        )
    )
    return ranked.join(pooled.withColumnRenamed("__v", "__nv"), "__p").select(
        F.col("__id").alias(id_col),
        F.col("__g").alias(group_col),
        F.col("__v").alias("value"),
        F.col("__nv").alias("norm_value"),
    )


def lag_autocorr(
    series: DataFrame,
    t_col: str,
    x_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Lag-k autocorrelation function over an integer-indexed series —
    the periodicity screen (weekly rhythm in daily traffic, batch-job
    echoes) beside ``seasonal_anomaly_report``'s fixed weekly
    baseline: ACF peaks FIND the period instead of assuming it.

    Definition: for each lag k in 1..max_lag, the PEARSON correlation
    over the matched pairs ``(x_t, x_{t+k})`` — the pairs-Pearson
    variant (each lag uses its own pair means), not the
    global-mean/global-variance estimator, because it is exactly
    computable from integer moments: Σx, Σy, Σxy, Σx², Σy² in
    decimal-128 (the ``trend_per_key``/``stddev_exact`` precedent)
    with ONE IEEE sqrt+division per lag, 6-dp rounded. ``n_pairs`` is
    returned so sparse overlaps read honestly.

    Plan contract: ``series`` is an already-aggregated frame (daily
    sums — CALENDAR-BOUNDED, aggregate-sized by contract), pinned once
    via eager checkpoint; lags EXPLODE map-side onto one side
    (|series|·max_lag rows) and match by the equality
    ``t + k = t'`` — one hash equi-join, one ≤max_lag-group
    aggregate. Missing timestamps simply produce no pair (gaps
    shorten n_pairs rather than fabricating zeros).

    Returns (lag, n_pairs, acf), one row per lag; acf NULL when a
    lag's pairs have zero variance on either side.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    s = (
        series.select(
            F.col(t_col).cast("long").alias("__t"), F.col(x_col).cast("long").alias("__x")
        )
        .filter(F.col("__x").isNotNull())
        .localCheckpoint(eager=True)
    )
    a = s.select(
        "__t",
        F.col("__x").alias("__xa"),
        F.explode(F.array(*[F.lit(k) for k in range(1, int(max_lag) + 1)])).alias("lag"),
    )
    b = s.select(F.col("__t").alias("__t2"), F.col("__x").alias("__xb"))
    pairs = a.join(b, a["__t"] + a["lag"] == b["__t2"])

    def d38(c):
        return c.cast("decimal(38,0)")

    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(d38(F.col("__xa"))).alias("__sx"),
        F.sum(d38(F.col("__xb"))).alias("__sy"),
        F.sum(d38(F.col("__xa")) * d38(F.col("__xb"))).alias("__sxy"),
        F.sum(d38(F.col("__xa")) * d38(F.col("__xa"))).alias("__sxx"),
        F.sum(d38(F.col("__xb")) * d38(F.col("__xb"))).alias("__syy"),
    )
    n = d38(F.col("n_pairs"))
    num = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    den = F.sqrt(
        (n * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
        * (n * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast("double")
    )
    return m.select(
        F.col("lag").cast("long").alias("lag"),
        "n_pairs",
        F.round(num / den, 6).alias("acf"),
    )


def multires_rollup(
    df: DataFrame,
    ts_col: str,
    value_cents: Column,
    levels: tuple[str, ...] = ("hour", "day", "week"),
) -> DataFrame:
    """Multi-resolution time rollup — the hypertable "continuous
    aggregate" cascade: event counts and exact value sums at every
    granularity in ``levels``, where each COARSER level is folded from
    the next finer level's PARTIALS, never from raw rows.

    That cascade is the whole point at 100 TB: the raw table is
    scanned exactly once (for the finest level); every coarser level
    is a re-aggregation of an already aggregate-sized frame (≤ one row
    per finest bucket), so adding a granularity costs an
    |buckets|-sized shuffle, not another corpus pass. Counts and
    integer cent-sums are both associative, which is what makes the
    fold exact — the same partial-reuse contract Spark's own partial
    hash aggregation applies WITHIN one level, applied ACROSS levels.

    ``levels`` must be ordered finest → coarsest with each ADJACENT
    pair a genuine nesting (every finer bucket lies wholly inside one
    coarser bucket) — minute/hour/day each nest into everything
    coarser, month ⊂ quarter ⊂ year, and day ⊂ week. ISO weeks do NOT
    nest into months/quarters/years (a week can straddle the month
    boundary, and ``date_trunc('month', week_start)`` would fold that
    week's events into the wrong month), so ``week`` is only valid as
    the COARSEST level; the constructor validates the chain and
    rejects non-nesting pairs rather than silently mis-bucketing (r11
    advisory).

    The finest frame is materialized once via an eager localCheckpoint
    (the repo's eager-cleanup idiom — no cache-manager pin outlives
    the call) and consumed |levels| times; each coarser level re-reads
    that checkpoint, never the raw table. The level chain itself stays
    lazy BY DESIGN: level k's agg re-executes inside level k+1's plan,
    but every re-execution aggregates the CHECKPOINTED hourly partials
    (≤ one row per finest bucket) — aggregate-sized work, never a
    raw-table rescan (the r14 guard's corpus-rescan class does not
    apply; PLANS.md forbids `Scan parquet` in this plan to pin exactly
    that). Returns
    (level, bucket_start, n_events, value_cents) — BIGINT counts and
    cent sums, so the union hash-checks exactly.
    """
    if len(levels) < 2:
        raise ValueError(f"multires_rollup wants >= 2 levels, got {levels!r}")
    # adjacency nesting table: coarser units a finer unit folds into
    # EXACTLY (ISO week deliberately nests nothing coarser — weeks
    # straddle month/quarter/year boundaries)
    nests_into = {
        "minute": {"hour", "day", "week", "month", "quarter", "year"},
        "hour": {"day", "week", "month", "quarter", "year"},
        "day": {"week", "month", "quarter", "year"},
        "week": set(),
        "month": {"quarter", "year"},
        "quarter": {"year"},
        "year": set(),
    }
    for finer, coarser in zip(levels, levels[1:]):
        if finer not in nests_into:
            raise ValueError(f"multires_rollup: unknown level {finer!r}")
        if coarser not in nests_into.get(finer, set()):
            raise ValueError(
                f"multires_rollup: level {coarser!r} does not nest {finer!r} "
                f"buckets (valid coarser levels for {finer!r}: "
                f"{sorted(nests_into[finer])}) — folding partials across a "
                "non-nesting boundary would silently mis-bucket"
            )
    finest = (
        df.groupBy(F.date_trunc(levels[0], F.col(ts_col)).alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(value_cents).cast("long").alias("value_cents"),
        )
        .localCheckpoint(eager=True)
    )
    out = finest.select(
        F.lit(levels[0]).alias("level"), "bucket_start", "n_events", "value_cents"
    )
    cur = finest
    for lvl in levels[1:]:
        cur = cur.groupBy(
            F.date_trunc(lvl, F.col("bucket_start")).alias("bucket_start")
        ).agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("value_cents").cast("long").alias("value_cents"),
        )
        out = out.unionByName(
            cur.select(F.lit(lvl).alias("level"), "bucket_start", "n_events", "value_cents")
        )
    return out


def mutual_information(
    df: DataFrame,
    x_expr: Column,
    y_expr: Column,
) -> DataFrame:
    """EXACT empirical mutual information between two categorical
    expressions — the dependence screen between dataset facets (does
    event mix shift by hour? does language predict source?):
    ``MI = Σ_xy (n_xy/N)·ln(n_xy·N / (n_x·n_y))``, in nats.

    Determinism contract (the ``psi_drift`` / ``source_divergence``
    idiom): every per-cell term is quantized to nano-nats —
    ``round((n_xy/N)·ln((n_xy·N)/(n_x·n_y)) · 1e9)`` as BIGINT — and
    SUMMED EXACTLY, so summation order cannot matter and any engine
    replays the total term-for-term. The ln argument is built from
    BIGINT counts with one double division, the same expression shape
    on both engines. Empty cells contribute nothing (0·ln0 = 0 is the
    MI convention and they never appear in the joint group-by).

    Plan: one |X·Y|-cells joint hash aggregate over the corpus (the
    only corpus-sized shuffle — map-side partials reduce it to the
    cell cardinality), marginals re-aggregated FROM the joint cells
    (aggregate-sized, never a second corpus pass), broadcast back onto
    the cells, one scalar sum. The joint cells have FOUR consumers
    (both marginals, the totals, the cell join), so they materialize
    once via an eager localCheckpoint — cell-cardinality data, no
    cache-manager pin, and without it every consumer would re-pay the
    corpus aggregate (the multi-consumer trap). Output one row:
    (n_rows, n_x, n_y, n_cells, mi).

    NULL contract: rows where EITHER facet is NULL are excluded up
    front and n_rows counts only the included rows — without the
    filter a NULL-keyed cell's term would silently vanish from the MI
    sum (the marginal equi-joins never match null keys) while N still
    counted its rows (r11 advisory).
    """
    joint = (
        df.filter(x_expr.isNotNull() & y_expr.isNotNull())
        .groupBy(x_expr.alias("__x"), y_expr.alias("__y"))
        .agg(F.count(F.lit(1)).cast("long").alias("__nxy"))
        .localCheckpoint(eager=True)
    )
    mx = joint.groupBy("__x").agg(F.sum("__nxy").cast("long").alias("__nx"))
    my = joint.groupBy("__y").agg(F.sum("__nxy").cast("long").alias("__ny"))
    tot = F.broadcast(
        joint.agg(
            F.sum("__nxy").cast("long").alias("__n"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
        )
    )
    cells = (
        joint.join(F.broadcast(mx), "__x")
        .join(F.broadcast(my), "__y")
        .crossJoin(tot)
    )
    term = (
        F.col("__nxy").cast("double")
        / F.col("__n").cast("double")
        * F.log(
            (F.col("__nxy").cast("double") * F.col("__n").cast("double"))
            / (F.col("__nx").cast("double") * F.col("__ny").cast("double"))
        )
    )
    return (
        cells.withColumn("__t", F.round(term * 1e9, 0).cast("long"))
        .groupBy()
        .agg(
            F.first("__n").alias("n_rows"),
            F.count_distinct("__x").cast("long").alias("n_x"),
            F.count_distinct("__y").cast("long").alias("n_y"),
            F.first("n_cells").alias("n_cells"),
            F.round(F.sum("__t").cast("double") / 1e9, 4).alias("mi"),
        )
    )


def chi2_independence(
    df: DataFrame,
    x_expr: Column,
    y_expr: Column,
) -> DataFrame:
    """Pearson's chi-squared test of independence between two
    categorical expressions — the FREQUENTIST sibling of
    ``mutual_information`` (same joint-cell sufficient statistics,
    different functional): ``χ² = Σ_xy (n_xy − e_xy)²/e_xy`` with
    ``e_xy = n_x·n_y/N``, algebraically
    ``Σ_xy (N·n_xy − n_x·n_y)² / (N·n_x·n_y)`` — the deviation
    ``N·n_xy − n_x·n_y`` is an exact decimal-128 integer; its square
    and the division are the only float ops, and each per-cell term is
    quantized to nano-units and SUMMED EXACTLY (the
    ``mutual_information`` determinism contract: summation order
    cannot matter, any engine replays term-for-term).

    The one semantic fork from MI: chi² needs the EMPTY cells too
    (n_xy = 0 contributes e_xy = n_x·n_y/N, the full expected mass) —
    so the cell table is the marginal×marginal GRID (aggregate-sized:
    |X|·|Y| rows built from two broadcast-sized marginal frames) left-
    joined to the observed joint cells, zero-filled. MI skips them
    (0·ln 0 = 0); chi² cannot.

    Plan: one joint |X·Y|-cell hash aggregate over the corpus (the
    only corpus-sized shuffle), eagerly checkpointed for its four
    consumers; marginals re-aggregate the cells; the grid join and the
    term fold are all aggregate-sized. Output one row:
    (n_rows, n_x, n_y, dof, chi2, cramers_v) with
    dof = (n_x−1)·(n_y−1) and Cramér's V = √(χ²/(N·min(n_x−1, n_y−1)))
    — the [0, 1] effect size a threshold can act on, where raw χ²
    grows with N.

    NULL contract (shared with ``mutual_information``, r11 advisory):
    rows where EITHER facet is NULL are excluded up front and n_rows
    counts only the included rows — without the filter a NULL-keyed
    observed cell would zero-fill in the grid left join while N still
    counted its rows, biasing every expected count.
    """
    joint = (
        df.filter(x_expr.isNotNull() & y_expr.isNotNull())
        .groupBy(x_expr.alias("__x"), y_expr.alias("__y"))
        .agg(F.count(F.lit(1)).cast("long").alias("__nxy"))
        .localCheckpoint(eager=True)
    )
    mx = joint.groupBy("__x").agg(F.sum("__nxy").cast("long").alias("__nx"))
    my = joint.groupBy("__y").agg(F.sum("__nxy").cast("long").alias("__ny"))
    tot = F.broadcast(joint.agg(F.sum("__nxy").cast("long").alias("__n")))
    grid = (
        F.broadcast(mx)
        .crossJoin(F.broadcast(my))
        .join(joint, ["__x", "__y"], "left")
        .withColumn("__o", F.coalesce(F.col("__nxy"), F.lit(0)).cast("long"))
        .crossJoin(tot)
    )

    def d38(c):
        return c.cast("decimal(38,0)")

    # dev = N·n_xy − n_x·n_y is EXACT decimal-128 (both products are
    # ≤ N², inside 38 digits for any real N); its square would not be,
    # so the square happens in double — one rounding, same expression
    # shape on both engines
    dev = (
        d38(F.col("__n")) * d38(F.col("__o"))
        - d38(F.col("__nx")) * d38(F.col("__ny"))
    ).cast("double")
    term = (dev * dev) / (
        d38(F.col("__n")) * d38(F.col("__nx")) * d38(F.col("__ny"))
    ).cast("double")
    agg = (
        grid.withColumn("__t", F.round(term * 1e9, 0).cast("long"))
        .groupBy()
        .agg(
            F.first("__n").alias("n_rows"),
            F.count_distinct("__x").cast("long").alias("n_x"),
            F.count_distinct("__y").cast("long").alias("n_y"),
            (
                (F.count_distinct("__x") - F.lit(1))
                * (F.count_distinct("__y") - F.lit(1))
            )
            .cast("long")
            .alias("dof"),
            F.round(F.sum("__t").cast("double") / 1e9, 4).alias("chi2"),
        )
    )
    # Cramér's V normalizes χ² to [0, 1] (the effect size a threshold
    # can act on, where raw χ² grows with N): V = √(χ²/(N·min_dim)).
    # Derived from the already-rounded chi2 so both engines share the
    # rounding point; one sqrt, rounded to the 4-dp output contract.
    min_dim = F.least(F.col("n_x") - F.lit(1), F.col("n_y") - F.lit(1))
    return agg.withColumn(
        "cramers_v",
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n_rows") * min_dim).cast("double")
            ),
            4,
        ),
    )


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_cents: Column,
    id_col: str,
    k_num: int = 3,
    k_den: int = 1,
    eager_cleanup: bool = True,
) -> DataFrame:
    """Per-group ROBUST outlier screen — median/MAD, the
    breakdown-point-0.5 alternative to mean/stddev z-scores (one wild
    value cannot move the fence, the property that matters for
    quality screens over heavy-tailed corpus stats): per group the
    exact discrete median m, the exact discrete median of |x − m|
    (MAD), and how many rows sit beyond ``|x − m| > (k_num/k_den)·MAD``.

    This is the SCALE-PATH sibling of ``mad_outliers`` (r06, same
    rule): that face computes interpolated medians with Spark's
    ``percentile``, whose aggregation state holds each group's values
    — exact only while groups fit an executor, with an approx-sketch
    swap as its documented 100 TB door. Here both medians are
    ``discrete_quantiles``' ELEMENT SELECTION on the distributed
    prefix-rank, so the screen stays EXACT at any group size and the
    whole face is BIGINT (the no-float hash-check contract the
    interpolated form cannot give).

    Everything stays in BIGINT: values enter as exact cents, both
    medians are the ``discrete_quantiles`` ELEMENT-SELECTION primitive
    (type-1 / DuckDB ``quantile_disc`` semantics on the distributed
    prefix-rank — no per-group window funnel), and the fence
    comparison ``dev·k_den > k_num·MAD`` is integer cross-
    multiplication, so the result hash-checks exactly on any engine.

    Plan: two prefix-rank passes (median, then MAD over the
    |group|-broadcast-joined deviations) + one counting aggregate —
    each pass is one range-repartition of the corpus; the median/MAD
    tables are |groups|-sized and broadcast. The projected values and
    the deviation frame each have two consumers (a quantile pass + the
    next stage), so both are cache-pinned; the default eager_cleanup
    releases both pins once the |groups|-sized result materializes
    (``eager_cleanup=False`` keeps the lazy plan for the structural
    gates). NULL values are excluded throughout (SQL aggregate
    semantics). Returns (group, n, med_cents, mad_cents, n_outliers).
    """
    vals = df.select(
        F.col(group_col).alias("__grp"),
        F.col(id_col).alias("__id"),
        value_cents.alias("__cents"),
    ).filter(F.col("__cents").isNotNull()).cache()
    med = discrete_quantiles(vals, "__grp", "__cents", "__id", [(1, 2)]).select(
        F.col("__grp"), F.col("__cents").alias("med_cents")
    )
    dev = vals.join(F.broadcast(med), "__grp").select(
        "__grp", "__id", F.abs(F.col("__cents") - F.col("med_cents")).alias("__dev")
    ).cache()
    mad = discrete_quantiles(dev, "__grp", "__dev", "__id", [(1, 2)]).select(
        F.col("__grp"), F.col("__dev").alias("mad_cents")
    )
    fences = F.broadcast(med.join(mad, "__grp"))
    kn, kd = int(k_num), int(k_den)
    out = (
        dev.join(fences, "__grp")
        .groupBy("__grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.first("med_cents").alias("med_cents"),
            F.first("mad_cents").alias("mad_cents"),
            F.sum(
                F.when(
                    F.col("__dev") * F.lit(kd) > F.lit(kn) * F.col("mad_cents"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .withColumnRenamed("__grp", group_col)
    )
    if not eager_cleanup:
        return out
    out = out.localCheckpoint(eager=True)
    dev.unpersist()
    vals.unpersist()
    return out


def assoc_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
    eager_cleanup: bool = True,
) -> DataFrame:
    """Association rules over (basket, item) memberships — the classic
    market-basket miner (directed rules a→b with support, confidence,
    lift), the co-occurrence primitive behind "frequently bought
    together" and corpus-level topic-affinity screens.

    Support pruning FIRST, rules after: the within-basket pair
    self-join is bounded by Σ_b |b|² (baskets are small by data
    contract — the join is keyed on the basket id, never across
    baskets), pairs below ``min_support`` drop before any rule math,
    and the surviving pair table is output-sized. Item counts and the
    basket total are aggregate-sized and broadcast back. At 100 TB a
    hot basket (one order holding thousands of items) is the quadratic
    regime — the Σ|b|² bound is the operator's contract, stated here
    rather than silently assumed (the `jaccard` family's guarded-
    quadratic discipline; pre-cap baskets upstream if the contract
    does not hold).

    Exactness: confidence and lift are integer-rational and computed
    with DECIMAL(38,0) cross-products + integer DIV into nano-units —
    ``conf_nano = 1e9·n_ab div n_a``,
    ``lift_nano = 1e9·n_ab·N div (n_a·n_b)`` — bit-identical on any
    engine (DuckDB replays them in HUGEINT), no float anywhere.
    Both rule directions are emitted. Returns
    (antecedent, consequent, n_ab, n_a, n_b, conf_nano, lift_nano).

    The DISTINCT membership frame has four consumers (basket total,
    item counts, both pair-join sides), so it is PINNED once
    (repartition on the basket join key + cache, the
    ``session_type_affinity`` pattern) — without the pin each consumer
    re-pays the corpus scan + distinct shuffle. Same eager-cleanup
    contract as the rest of the family: by default the output-sized
    result materializes via localCheckpoint and the pin is released
    before returning; ``eager_cleanup=False`` keeps the lazy plan for
    the structural gates.
    """
    n_part = int(
        baskets.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    m = (
        baskets.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
        )
        .distinct()
        .repartition(n_part, "__b")
        .cache()
    )
    m.count()
    n_baskets = F.broadcast(
        m.select("__b").distinct().agg(F.count(F.lit(1)).cast("long").alias("__N"))
    )
    item_counts = m.groupBy("__i").agg(F.count(F.lit(1)).cast("long").alias("__n"))
    a = m.select("__b", F.col("__i").alias("__ia"))
    b = m.select("__b", F.col("__i").alias("__ib"))
    pairs = (
        a.join(b, "__b")
        .filter(F.col("__ia") < F.col("__ib"))
        .groupBy("__ia", "__ib")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_support))
    )
    # `pairs` is referenced twice by `directed` (both rule directions)
    # and `item_counts` twice (antecedent + consequent sides):
    # unpinned, the expensive within-basket self-join and the item agg
    # would each execute per reference (r14 guard class). persist(),
    # not an eager checkpoint: the cache fills on first touch and both
    # references reuse it WITHIN one action, the InMemoryRelation keeps
    # the gate-visible lineage, and the eager-cleanup branch below
    # releases both pins (lazy mode leaves them registered — the
    # documented toks-style trade for plan inspection).
    item_counts = item_counts.persist()
    pairs = pairs.persist()
    directed = pairs.select(
        F.col("__ia").alias("antecedent"), F.col("__ib").alias("consequent"), "n_ab"
    ).unionByName(
        pairs.select(
            F.col("__ib").alias("antecedent"), F.col("__ia").alias("consequent"), "n_ab"
        )
    )
    ca = F.broadcast(item_counts.select(F.col("__i").alias("antecedent"), F.col("__n").alias("n_a")))
    cb = F.broadcast(item_counts.select(F.col("__i").alias("consequent"), F.col("__n").alias("n_b")))
    out = (
        directed.join(ca, "antecedent")
        .join(cb, "consequent")
        .crossJoin(n_baskets)
        .select(
            "antecedent",
            "consequent",
            "n_ab",
            "n_a",
            "n_b",
            F.expr(
                "CAST((CAST(1000000000 AS DECIMAL(38,0)) * n_ab) DIV n_a AS LONG)"
            ).alias("conf_nano"),
            # integer DIV, never `/`: decimal true-division rounds at
            # its result scale and can cross the floor boundary
            F.expr(
                "CAST((CAST(1000000000 AS DECIMAL(38,0)) * n_ab * __N) "
                "DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS LONG)"
            ).alias("lift_nano"),
        )
    )
    if not eager_cleanup:
        return out
    out = out.localCheckpoint(eager=True)
    m.unpersist()
    item_counts.unpersist()
    pairs.unpersist()
    return out
