"""Event-sequence analytics (R8/R9 family extensions, r08): Markov
transition counts, conversion-latency distributions, and two-arm
experiment readouts — the product-analytics faces that sit between the
funnel operators (``asof.ordered_funnel``) and the aggregate screens
(``relational.distribution_drift`` etc.).

Everything here follows the repo's float-parity discipline: counts and
durations stay exact BIGINT (µs), probabilities/rates are ONE final
IEEE division of exact integers, and percentiles use the same
interpolated-percentile definition Spark's ``percentile`` and DuckDB's
``quantile_cont`` share — so every face is oracle-hash-checkable.

Scale posture: each operator is one or two hash-partitioned
shuffles keyed on the user/sequence column; nothing is quadratic,
nothing funnels a group through one task, and the per-user window
sorts are spill-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for
    every ordered pair of CONSECUTIVE events of one user, count the
    (from_type → to_type) transition, and report each source state's
    outgoing transition probability (exact counts, one IEEE division).
    The classic session-flow / clickstream-model input.

    Determinism: per-user ordering is (ts, id) — the id tiebreak makes
    the consecutive-pair set a pure function of the data under any
    partitioning (equal-timestamp events would otherwise order
    arbitrarily).

    Plan: ONE user-key shuffle for the lag window (partition by user,
    order by (ts, id) — per-partition sort, spill-able), then the
    (from, to) pair counts and the per-source totals reuse one hash
    aggregate each over the tiny |types|² result. No self-join of the
    log, no group-cardinality window.

    Returns (from_type, to_type, n, p_from) sorted by the caller.
    """
    u, t = F.col(user_col), F.col(ts_col)
    w = Window.partitionBy(u).orderBy(t.asc(), F.col(id_col).asc())
    pairs = (
        events.select(u, t, F.col(id_col), F.col(type_col).alias("to_type"))
        .withColumn("from_type", F.lag("to_type").over(w))
        .filter(F.col("from_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # per-source totals as a window over the |types|²-row AGGREGATE —
    # not a broadcast join of a counts-derived table: the broadcast
    # build side executed as its own job and re-ran the whole
    # window+agg subtree a second time (measured 13.8 s → 2.5 s at sf1).
    # A from_type-partitioned window here is NOT the group-cardinality
    # trap: it runs over the tiny post-aggregate table, never the log.
    w_tot = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(w_tot).cast("double")
        ).alias("p_from"),
    )


def time_to_convert(
    events: DataFrame,
    start_type: str = "view",
    convert_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    eager_cleanup: bool = True,
) -> DataFrame:
    """Conversion-latency distribution: per user, the time from their
    FIRST ``start_type`` event to their EARLIEST ``convert_type`` event
    at-or-after it; reported per weekly cohort of the first start event
    as exact-µs interpolated percentiles plus the conversion rate —
    the time-to-value / activation-latency report.

    Plan: one user-key aggregate per event side (min start ts; the
    candidate converts ride the SAME aggregate via a conditional min
    over a start-bounded pair — see below), i.e. the whole operator is
    ONE user-key shuffle over the two filtered event streams plus a
    ≤cohorts-row percentile rollup. The start-bounded earliest convert
    cannot be a plain conditional min in one pass (it depends on the
    start min), so the operator runs the classic two-phase form: the
    per-user start mins (first shuffle, reused partitioning) equi-join
    the convert stream on the user key and a second min-agg keyed on
    the user collapses it — both shuffles carry only the two filtered
    event types, never the full log.

    Returns one row per cohort week: (cohort_week, n_started,
    n_converted, conv_rate, p50_us, p90_us), converts outside the
    cohort's observation never counted twice (each user belongs to
    exactly one cohort — their first start week).
    """
    u, t = F.col(user_col), F.col(ts_col)
    starts = (
        events.filter(F.col("event_type") == start_type)
        .groupBy(u.alias("__u"))
        .agg(F.min(t).alias("__t0"))
        # two consumers (the bounded-convert join + the cohort join):
        # pinned so the filtered-events scan + user agg run once (r14
        # guard class). persist(), not a checkpoint: the cache fills on
        # first touch and the InMemoryRelation PRESERVES the user-key
        # partitioning both joins reuse. RELEASED before return under
        # the family's eager-cleanup contract (ADVICE r14 — the
        # doc_keywords idiom); ``eager_cleanup=False`` keeps the lazy
        # gate-visible lineage and leaves the pin (CacheManager-
        # deduped, eviction-bounded — the documented trade).
        .persist()
    )
    converts = events.filter(F.col("event_type") == convert_type).select(
        u.alias("__u"), t.alias("__tc")
    )
    first_conv = (
        converts.join(starts, "__u")
        .filter(F.col("__tc") >= F.col("__t0"))
        .groupBy("__u")
        .agg(F.min("__tc").alias("__tc"))
    )
    per_user = starts.join(first_conv, "__u", "left").select(
        F.date_trunc("week", F.col("__t0")).alias("cohort_week"),
        (F.unix_micros(F.col("__tc")) - F.unix_micros(F.col("__t0"))).alias("__dur_us"),
    )
    out = per_user.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("n_started"),
        F.count("__dur_us").cast("long").alias("n_converted"),
        (F.count("__dur_us").cast("double") / F.count(F.lit(1)).cast("double")).alias("conv_rate"),
        F.percentile("__dur_us", F.lit(0.5)).alias("p50_us"),
        F.percentile("__dur_us", F.lit(0.9)).alias("p90_us"),
    )
    if not eager_cleanup:
        return out
    out = out.localCheckpoint(eager=True)  # cohort-weeks-sized leaf
    starts.unpersist()
    return out


def ab_conversion_ztest(
    events: DataFrame,
    arm_expr,
    start_type: str = "view",
    convert_type: str = "purchase",
    user_col: str = "user_id",
) -> DataFrame:
    """Two-proportion experiment readout: users split into arms by
    ``arm_expr`` (a deterministic column expression over the event row,
    e.g. a hash of the user id), per arm the exposed-user and
    converted-user counts, and the pooled two-proportion z statistic of
    (arm 1 − arm 0) — the A/B dashboard row.

    Every input to the statistic is an exact BIGINT distinct-user
    count; the rates, pooled rate, standard error, and z are a fixed
    dag of IEEE +,−,×,÷,√ ops on those integers, so the result is
    bit-reproducible on any engine (no libm calls — sqrt is
    IEEE-correctly-rounded).

    Plan: one distinct hash-agg per (arm, user) over the two filtered
    event streams (converted users are EXPOSED users who also
    converted — the semi join keeps the denominator honest), then the
    ≤2-row arm rollup pivots into the 1-row statistic via conditional
    aggregation (single consumer — no per-arm filter + cross join).
    Nothing scales with more than the distinct-user count.

    Returns ONE row: (n0, conv0, rate0, n1, conv1, rate1, z) — or ZERO
    rows when either arm has no exposed users (the 1×1 cross of the
    two arm tables is empty); callers wanting a NULL-padded row instead
    outer-join the two single-row frames themselves.
    """
    u = F.col(user_col)
    exposed = (
        events.filter(F.col("event_type") == start_type)
        .select(arm_expr.cast("int").alias("__arm"), u.alias("__u"))
        .distinct()
    )
    converted = (
        events.filter(F.col("event_type") == convert_type)
        .select(u.alias("__u"))
        .distinct()
    )
    per_arm = (
        exposed.join(converted.withColumn("__c", F.lit(1)), "__u", "left")
        .groupBy("__arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count("__c").cast("long").alias("conv"),
        )
    )
    # ONE consumer of per_arm: the two arm rows pivot into one row via
    # conditional aggregation (the earlier filter-each-arm + 1×1 cross
    # re-executed the distinct-user agg per arm — r14 guard class);
    # the not-null filter reproduces the zero-rows-when-an-arm-is-empty
    # contract of the old empty cross join.
    j = per_arm.agg(
        F.sum(F.when(F.col("__arm") == 0, F.col("n"))).cast("long").alias("n0"),
        F.sum(F.when(F.col("__arm") == 0, F.col("conv"))).cast("long").alias("conv0"),
        F.sum(F.when(F.col("__arm") == 1, F.col("n"))).cast("long").alias("n1"),
        F.sum(F.when(F.col("__arm") == 1, F.col("conv"))).cast("long").alias("conv1"),
    ).filter(F.col("n0").isNotNull() & F.col("n1").isNotNull())
    r0 = F.col("conv0").cast("double") / F.col("n0").cast("double")
    r1 = F.col("conv1").cast("double") / F.col("n1").cast("double")
    pooled = (F.col("conv0") + F.col("conv1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    se = F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.col("n0").cast("double") + F.lit(1.0) / F.col("n1").cast("double"))
    )
    return j.select(
        "n0",
        "conv0",
        r0.alias("rate0"),
        "n1",
        "conv1",
        r1.alias("rate1"),
        F.when(se > 0, (r1 - r0) / se).alias("z"),
    )


def daily_count_correlation(
    events: DataFrame,
    type_x: str,
    type_y: str,
    ts_col: str = "ts",
    type_col: str = "event_type",
    eager_cleanup: bool = True,
) -> DataFrame:
    """Pearson correlation between the DAILY COUNTS of two event types
    over the observed day range — the do-views-drive-purchases screen.
    Days with neither type still count as (0, 0) points: the day axis
    is the span min(day)..max(day) over either type, so the statistic
    is a pure function of the data, not of which days happen to appear.

    Float parity: every moment (n, Σx, Σy, Σxy, Σx², Σy²) is an EXACT
    BIGINT — counts are integers, so nothing is summed in floating
    point — and r is one fixed dag of IEEE ops over those integers
    (sqrt is correctly rounded; no libm), hash-checkable cross-engine
    where a streamed ``corr()`` aggregate is summation-order-dependent.

    Plan: one (day) hash-agg over the two filtered types (conditional
    sums — a single pass), a ≤days-row day-spine explode from the
    1-row min/max aggregate, a broadcast join of counts onto the
    spine, and a 1-row moment rollup. Nothing scales beyond the day
    count after the first aggregate.

    Returns ONE row: (n_days, sum_x, sum_y, r).
    """
    d = F.to_date(F.col(ts_col))
    tx, ty = F.col(type_col) == type_x, F.col(type_col) == type_y
    per_day = (
        events.filter(tx | ty)
        .groupBy(d.alias("__d"))
        .agg(
            F.sum(F.when(tx, 1).otherwise(0)).cast("long").alias("__x"),
            F.sum(F.when(ty, 1).otherwise(0)).cast("long").alias("__y"),
        )
        # two consumers (the span agg + the spine join): pinned so the
        # filtered-events scan runs once (r14 guard class); the frame
        # is calendar-bounded (one row per observed day). RELEASED
        # before return under the family's eager-cleanup contract
        # (ADVICE r14 — the doc_keywords idiom); eager_cleanup=False
        # keeps the lazy gate-visible lineage and leaves the pin
        # (CacheManager-deduped, eviction-bounded).
        .persist()
    )
    spine = (
        per_day.agg(F.min("__d").alias("__d0"), F.max("__d").alias("__d1"))
        .select(F.explode(F.sequence(F.col("__d0"), F.col("__d1"))).alias("__d"))
    )
    filled = spine.join(per_day, "__d", "left").select(
        F.coalesce(F.col("__x"), F.lit(0)).alias("__x"),
        F.coalesce(F.col("__y"), F.lit(0)).alias("__y"),
    )
    m = filled.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("__x").cast("long").alias("sum_x"),
        F.sum("__y").cast("long").alias("sum_y"),
        F.sum(F.col("__x") * F.col("__y")).cast("long").alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).cast("long").alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).cast("long").alias("__syy"),
    )
    # moment products in decimal(38,0): n·Σx² and Σx·Σy overflow
    # BIGINT long before the day counts get big (DuckDB's HUGEINT sums
    # take the same exact-128-bit road); ONE double cast at the end
    def d38(c):
        return F.col(c).cast("decimal(38,0)")

    num = (d38("n_days") * d38("__sxy") - d38("sum_x") * d38("sum_y")).cast("double")
    vx = (d38("n_days") * d38("__sxx") - d38("sum_x") * d38("sum_x")).cast("double")
    vy = (d38("n_days") * d38("__syy") - d38("sum_y") * d38("sum_y")).cast("double")
    out = m.select(
        "n_days",
        "sum_x",
        "sum_y",
        F.when((vx > 0) & (vy > 0), num / (F.sqrt(vx) * F.sqrt(vy))).alias("r"),
    )
    if not eager_cleanup:
        return out
    out = out.localCheckpoint(eager=True)  # ONE-row leaf — THEN release
    per_day.unpersist()
    return out


def top_event_paths(
    events: DataFrame,
    path_len: int = 3,
    top_k: int = 10,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Most common length-``path_len`` consecutive event-type paths
    across users (sliding window over each user's deterministically
    ordered stream) — the path-analysis view behind "what do users do
    right before purchasing".

    Plan: ONE user-key shuffle for the lag windows (all ``path_len-1``
    lags share one window sort), a path hash-agg, and a global top-k
    via sort-limit — Spark plans TakeOrderedAndProject (per-partition
    O(k) heaps merged on the driver), so no global sort materializes.
    Ties break on the path string for determinism.

    Returns (path, n) — exactly ``top_k`` rows (fewer on tiny data).

    NULL contract (r12 review): NULL-typed events are EXCLUDED up
    front — ``concat_ws`` silently SKIPS nulls, so a NULL in any path
    slot would conflate distinct windows ([A,B,NULL] and [A,NULL,B]
    both rendering 'A>B') and a NULL in the oldest slot would be
    indistinguishable from a too-short window; paths are therefore
    defined over the user's non-null-typed event sequence.
    """
    if path_len < 2:
        raise ValueError(f"path_len must be >= 2, got {path_len}")
    events = events.filter(F.col(type_col).isNotNull())
    u, t = F.col(user_col), F.col(ts_col)
    w = Window.partitionBy(u).orderBy(t.asc(), F.col(id_col).asc())
    steps = [F.lag(F.col(type_col), path_len - 1 - i).over(w) for i in range(path_len)]
    with_path = events.select(
        F.when(
            steps[0].isNotNull(),  # lags shorter than the window are NULL
            F.concat_ws(">", *steps),
        ).alias("__path")
    ).filter(F.col("__path").isNotNull())
    return (
        with_path.groupBy(F.col("__path").alias("path"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(top_k)
    )


def cusum_changepoint(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per event type, a CUSUM level-shift screen over the DAILY count
    series: with x_d the day-d count and x̄ the series mean, the
    cumulative sum S_d = Σ_{i≤d} (x_i − x̄) peaks where the level
    shifts; the report carries the peak |S_d| day (the candidate
    change point) and the CUSUM range max(S)−min(S) — the classic
    pre-sequential-test triage for "did this metric's level move".

    Everything stays EXACT integers until the final columns: with
    n·S_d = n·Σx_i − d·Σx (scaled by the day count n to avoid the
    fractional mean), the scaled cusum is a BIGINT, its argmax-|·| day
    is deterministic (ties → earliest day), and the reported
    ``cusum_range`` = (max−min)/n is one IEEE division. Zero-count
    gap days participate via a generated day spine, so the series is
    a pure function of the data.

    Plan: one (type, day) hash-agg, a per-type day-spine explode from
    the 1-row global min/max day aggregate crossed with the ≤|types|
    distinct-type table (both broadcast), ONE type-keyed window sort
    for the running sum, and a per-type max_by rollup. Nothing beyond
    the (type, day) grid after the first aggregate.

    Returns one row per event type: (event_type, n_days, total,
    change_day, cusum_range).
    """
    d = F.to_date(F.col(ts_col))
    per = (
        events.groupBy(F.col(type_col).alias("__t"), d.alias("__d"))
        .agg(F.count(F.lit(1)).cast("long").alias("__x"))
        # cache pin (r13, the doc_keywords find): per feeds THREE
        # consumers (span, the distinct-type table, the spine join) —
        # unpinned, the corpus (type, day) agg executed three times
        # per action. RELEASED below once the cusum grid materializes
        # (ADVICE r13: a standing persist per distinct input frame
        # leaks one cache-manager entry per call for the session).
        .persist()
    )
    span = per.agg(F.min("__d").alias("__d0"), F.max("__d").alias("__d1"))
    types = per.select("__t").distinct()
    spine = (
        types.crossJoin(F.broadcast(span))
        .select("__t", F.explode(F.sequence(F.col("__d0"), F.col("__d1"))).alias("__d"))
    )
    filled = spine.join(per, ["__t", "__d"], "left").select(
        "__t", "__d", F.coalesce(F.col("__x"), F.lit(0)).cast("long").alias("__x")
    )
    w = Window.partitionBy("__t").orderBy("__d")
    w_all = Window.partitionBy("__t")
    cum = filled.select(
        "__t",
        "__d",
        F.sum("__x").over(w).alias("__cx"),          # Σ_{i<=d} x_i
        F.sum("__x").over(w_all).alias("__tot"),     # Σ x (per type)
        F.count(F.lit(1)).over(w_all).alias("__n"),  # n days
        F.row_number().over(w).alias("__i"),
    ).select(
        "__t",
        "__d",
        "__tot",
        "__n",
        # n·S_d — exact BIGINT (decimal(38) product headroom at scale)
        (
            F.col("__cx").cast("decimal(38,0)") * F.col("__n").cast("decimal(38,0)")
            - F.col("__i").cast("decimal(38,0)") * F.col("__tot").cast("decimal(38,0)")
        ).alias("__ns"),
    )
    # the (type×days) grid has two consumers (the stats rollup + the
    # argmax pass): one eager checkpoint materializes it — at which
    # point per's three consumers have all read the cache exactly once
    # and the pin can be RELEASED (no standing cache entry outlives
    # the call)
    cum = cum.localCheckpoint(eager=True)
    per.unpersist()
    stats = cum.groupBy("__t").agg(
        F.max("__n").cast("long").alias("n_days"),
        F.max("__tot").cast("long").alias("total"),
        F.max(F.abs(F.col("__ns"))).alias("__m"),
        ((F.max("__ns") - F.min("__ns")).cast("double") / F.max("__n").cast("double")).alias("cusum_range"),
    )
    # earliest day attaining the max |n·S| — a deterministic argmax as
    # a ≤|types|-row broadcast join back (identical cross-engine where
    # struct-ordered arg-extremes differ in tie handling). `stats` has
    # ONE consumer: its per-type row rides the argmax join and the
    # rollup carries every output column through (r14 guard class —
    # the earlier stats⨝change re-join re-executed the stats agg).
    return (
        cum.join(F.broadcast(stats), "__t")
        .filter(F.abs(F.col("__ns")) == F.col("__m"))
        .groupBy("__t")
        .agg(
            F.max("n_days").alias("n_days"),
            F.max("total").alias("total"),
            F.min("__d").alias("change_day"),
            F.max("cusum_range").alias("cusum_range"),
        )
        .select(
            F.col("__t").alias(type_col),
            "n_days",
            "total",
            "change_day",
            "cusum_range",
        )
    )


def session_type_affinity(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    eager_cleanup: bool = True,
) -> DataFrame:
    """Session-level event-type affinity: for every unordered type pair
    (a < b), in how many sessions both occur, and the LIFT
    ``P(a,b) / (P(a)·P(b)) = n_ab·S / (n_a·n_b)`` over the S sessions —
    the which-behaviors-travel-together view (market-basket analysis
    with sessions as baskets and event types as items).

    Sessions are the standard gap rule (same as ``asof.sessionize``:
    a >``gap_seconds`` silence starts a new session; (ts, id) order
    makes assignment deterministic; exact-µs comparisons).

    Plan: ONE user-key window (lag→flag→running-sum) assigns session
    ids, and the collapsed (session, type) membership (≤|types| rows
    per session — never quadratic in events) is PINNED once
    (repartition on the (user, session) join key + cache, the
    ``kcore_peel`` pattern) because it has four consumers — the
    session total, the per-type counts, and both sides of the
    within-session pair self-join. Without the pin each consumer
    re-evaluates the full scan→window→distinct subtree (measured 5
    parquet scans / 16 Window evals at sf0.1; AQE stage reuse does
    NOT dedup them because the consumers' post-shuffle projections
    differ). The self-join reuses the pinned partitioning (no new
    exchange); the ≤|types|²-row result is checkpoint-truncated and
    the pin released before returning (``eager_cleanup=False`` keeps
    the lazy plan for inspection, pinning the cache for the session).
    All counts exact BIGINT; lift is one IEEE division of decimal-128
    products.

    Returns (type_a, type_b, n_ab, lift).
    """
    u, t = F.col(user_col), F.col(ts_col)
    w = Window.partitionBy(u).orderBy(t.asc(), F.col(id_col).asc())
    gap_us = int(gap_seconds) * 1_000_000
    # session id = running count of gap-boundary flags (one window
    # stage; the boundary flag itself is never needed downstream)
    new_sess = F.when(
        F.lag(t).over(w).isNull()
        | ((F.unix_micros(t) - F.unix_micros(F.lag(t).over(w))) > gap_us),
        1,
    ).otherwise(0)
    flagged = events.select(
        u.alias("__u"),
        F.col(type_col).alias("__ty"),
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("__sess"),
    )
    n_part = int(
        events.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    st = (
        flagged.select("__u", "__sess", "__ty")
        .distinct()
        .repartition(n_part, "__u", "__sess")
        .cache()
    )
    st.count()
    tot = F.broadcast(
        st.select("__u", "__sess").distinct().agg(
            F.count(F.lit(1)).cast("long").alias("__S")
        )
    )
    # two consumers (both lift sides): pinned so the per-type agg over
    # the cached membership runs once (r14 guard class); ≤|types| rows.
    # persist() keeps the gate-visible lineage; released below with st.
    pt = st.groupBy("__ty").agg(F.count(F.lit(1)).cast("long").alias("__n")).persist()
    a = st.select("__u", "__sess", F.col("__ty").alias("type_a"))
    b = st.select("__u", "__sess", F.col("__ty").alias("type_b"))
    pairs = (
        a.join(b, ["__u", "__sess"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    pa = F.broadcast(pt.select(F.col("__ty").alias("type_a"), F.col("__n").alias("__na")))
    pb = F.broadcast(pt.select(F.col("__ty").alias("type_b"), F.col("__n").alias("__nb")))
    out = (
        pairs.crossJoin(tot)
        .join(pa, "type_a")
        .join(pb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_ab",
            (
                (F.col("n_ab").cast("decimal(38,0)") * F.col("__S").cast("decimal(38,0)")).cast("double")
                / (F.col("__na").cast("decimal(38,0)") * F.col("__nb").cast("decimal(38,0)")).cast("double")
            ).alias("lift"),
        )
    )
    if not eager_cleanup:
        return out
    out = out.localCheckpoint(eager=True)
    st.unpersist()
    pt.unpersist()
    return out


def eventually_follows(
    events: DataFrame,
    basket_cols: list[str],
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Directed EVENTUALLY-FOLLOWS matrix — the process-mining
    primitive (the alpha-algorithm's input relation): for every
    ordered type pair (a → b), in how many baskets does a's FIRST
    occurrence strictly precede b's first occurrence — "a happens,
    and b eventually happens after it", regardless of what runs in
    between. Complements the repo's ADJACENT `transition_counts`
    (direct succession) and fixed-step `funnel_ordered_steps`:
    eventually-follows is the order relation process discovery
    actually consumes.

    Plan: one (basket, type) min-ts hash aggregate is the only
    corpus-sized shuffle (map-side partials collapse each basket's
    events per type); the within-basket self-join runs on that
    |baskets|·|types|-sized frame keyed on the basket — ≤|types|² pairs
    per basket, never across baskets — and the (from, to) count is a
    |types|²-group aggregate. Per-type basket totals re-aggregate the
    SAME first-occurrence frame (checkpointed once for its three
    consumers — first-ts data is tiny relative to the corpus) and
    broadcast back for the support ratio
    ``ratio_nano = 1e9·n_baskets div n_from`` (integer DIV — exact on
    any engine).

    Strict ``<`` on first timestamps: a tie (both types debut on the
    same microsecond) counts in NEITHER direction — deterministic on
    any engine, no tiebreak needed. Returns
    (t_from, t_to, n_baskets, n_from, ratio_nano).

    NULL contract (r12 review): rows with a NULL basket key or NULL
    type are EXCLUDED up front — a NULL-keyed basket would be counted
    in ``n_from`` yet could never match the basket equi-join, silently
    deflating every ratio its types touch.
    """
    b = [F.col(c) for c in basket_cols]
    for cnd in (*b, F.col(type_col)):
        events = events.filter(cnd.isNotNull())
    firsts = (
        events.groupBy(*b, F.col(type_col).alias("__t"))
        .agg(F.min(ts_col).alias("__mt"))
        .localCheckpoint(eager=True)
    )
    totals = F.broadcast(
        firsts.groupBy("__t").agg(F.count(F.lit(1)).cast("long").alias("n_from"))
    )
    a = firsts.select(*basket_cols, F.col("__t").alias("t_from"), F.col("__mt").alias("__ma"))
    c = firsts.select(*basket_cols, F.col("__t").alias("t_to"), F.col("__mt").alias("__mb"))
    pairs = (
        a.join(c, basket_cols)
        .filter((F.col("t_from") != F.col("t_to")) & (F.col("__ma") < F.col("__mb")))
        .groupBy("t_from", "t_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
    )
    return (
        pairs.join(totals.withColumnRenamed("__t", "t_from"), "t_from")
        .select(
            "t_from",
            "t_to",
            "n_baskets",
            "n_from",
            F.expr(
                "CAST((CAST(1000000000 AS DECIMAL(38,0)) * n_baskets) DIV n_from AS LONG)"
            ).alias("ratio_nano"),
        )
    )


def km_survival(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimator over CENSORED
    durations — the time-to-event readout (`time_to_convert` gives
    percentiles of COMPLETED conversions; KM answers the question
    censoring makes those percentiles lie about: "what fraction has
    NOT converted by time t", counting the users who never converted
    for exactly as long as they were observed). The churn/conversion/
    TTL curve every retention team plots.

    Definition: at each distinct duration t with ≥1 event,
    ``n_risk = |duration ≥ t|``, ``n_event = d``, and
    ``S(t) = Π_{u ≤ t} (1 − d_u/n_u)``.

    Determinism contract: each factor enters as
    ``ln((n−d)/n)`` quantized ONCE to integer nano-nats — the
    ``mutual_information`` idiom — and the RUNNING PRODUCT becomes a
    RUNNING SUM of exact BIGINTs, so the curve's log (``log_s_nano``)
    hash-checks term-for-term on any engine. ``survival`` is one
    ``exp`` of the exact sum, rounded to 6 dp (a ≤1-ulp libm
    difference would need a value within ~1e-16 of a rounding
    boundary to flip — the BM25 single-``ln`` precedent). A time
    where EVERYONE remaining dies (d = n_risk) sets survival exactly
    0 (it can only be the globally last event time).

    Scale path: one per-duration count aggregate (the only
    subject-sized shuffle), then TWO chained distributed prefixes over
    the duration-cardinality frame on ONE ``_frozen_range_partition``
    tiling: pass 1 accumulates at-risk counts (reverse-cumulative via
    ``N − cum + c``), pass 2 accumulates the nano-log terms; each pass
    is per-tile running sums + broadcast exclusive offsets — never a
    pid-less window. The between-pass frame is eagerly checkpointed
    (duration-cardinality-sized) because pass 2's offsets and rows
    both read it.

    Returns one row per distinct duration with ≥1 event:
    (duration, n_risk, n_event, log_s_nano, survival).

    Input contract (r12 review): durations are INTEGERIZED via
    ``cast('long')`` — SQL cast semantics, truncation toward zero —
    so callers must pass integer-valued durations (epoch seconds,
    whole days); a fractional duration column would silently merge
    distinct event times into one KM step. NULL durations are
    excluded.
    """
    from transe_pyspark_spark.operators.relational import (
    _frozen_range_partition,
    _offsets_with_total,
)

    n_part = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    pv = (
        df.filter(F.col(duration_col).isNotNull())
        .groupBy(F.col(duration_col).cast("long").alias("__t"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("__c"),
            F.sum(F.when(F.col(event_col).cast("boolean"), 1).otherwise(0))
            .cast("long")
            .alias("__d"),
        )
    )
    part = _frozen_range_partition(pv, "__t", n_part)
    sizes = part.groupBy("__pid").agg(F.sum("__c").cast("long").alias("__s"))
    # offsets AND total from ONE consumer of sizes (r14 guard class)
    offs = _offsets_with_total(sizes, "__s")
    w_in = Window.partitionBy("__pid").orderBy("__t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    base = (
        part.join(offs, "__pid")
        .withColumn("__cum", (F.sum("__c").over(w_in) + F.col("__off")).cast("long"))
        .withColumn("__nr", (F.col("__n") - F.col("__cum") + F.col("__c")).cast("long"))
        .withColumn(
            "__tn",
            F.when(
                (F.col("__d") > 0) & (F.col("__d") < F.col("__nr")),
                F.round(
                    F.log(
                        (F.col("__nr") - F.col("__d")).cast("double")
                        / F.col("__nr").cast("double")
                    )
                    * 1e9,
                    0,
                ).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )
        .withColumn(
            "__dead", F.when(F.col("__d") == F.col("__nr"), F.lit(1)).otherwise(F.lit(0))
        )
        .localCheckpoint(eager=True)
    )
    w_off2 = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offs2 = F.broadcast(
        base.groupBy("__pid")
        .agg(F.sum("__tn").cast("long").alias("__s2"))
        .select(
            "__pid",
            F.coalesce(F.sum("__s2").over(w_off2), F.lit(0)).cast("long").alias("__off2"),
        )
    )
    return (
        base.join(offs2, "__pid")
        .withColumn("__snano", (F.sum("__tn").over(w_in) + F.col("__off2")).cast("long"))
        .filter(F.col("__d") > 0)
        .select(
            F.col("__t").alias("duration"),
            F.col("__nr").alias("n_risk"),
            F.col("__d").alias("n_event"),
            F.col("__snano").alias("log_s_nano"),
            F.when(F.col("__dead") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp(F.col("__snano").cast("double") / 1e9), 6))
            .alias("survival"),
        )
    )
