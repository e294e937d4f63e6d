"""Time-series joins: as-of and range (SURVEY §2B R7/R8 — capability
gaps in the reference, required by the engine contract).

Scale posture: the as-of join is the *union-window* formulation — one
shuffle on the join key, a single in-partition sort, no point-lookup
joins and no per-row subqueries. This is the same plan TimescaleDB /
kdb-style engines lower as-of to, and it survives arbitrarily many rows
per key (spill-able sort, no state blowup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` and equal key (left outer semantics).

    Implementation: tag both sides, union, and take
    ``last(right_value, ignorenulls)`` over a window ordered by
    (ts, side) within each key — right rows sort before left rows at
    equal timestamps, so an exactly-simultaneous right row IS matched.
    """
    rv = right_value_cols or [c for c in right.columns if c not in (on, right_ts)]
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__rv_{c}") for c in rv],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tag.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__rv_{c}") for c in rv],
        F.col(right_ts).alias("__rts"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "__k",
        "__side",
        "__lrow",
        F.last("__rts", ignorenulls=True).over(w).alias(f"{right_ts}{suffix}"),
        *[F.last(f"__rv_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}") for c in rv],
    )
    out = filled.filter(F.col("__side") == 1)
    return out.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        F.col(f"{right_ts}{suffix}"),
        *[F.col(f"{c}{suffix}") for c in rv],
    )


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_id: str = "event_id",
    tolerance_seconds: int | None = None,
    suffix: str = "_nearest",
) -> DataFrame:
    """For each left row, the single equal-key right row whose
    timestamp is CLOSEST in EITHER direction (minimal |Δt|), within an
    optional ± tolerance — the sensor-alignment / closest-interaction
    join that backward-only as-of can't express. Fully deterministic
    tie rules: equal |Δt| prefers the EARLIER right row; several right
    rows at one timestamp prefer the smallest ``right_id``.

    Plan: rights first collapse to one row per (key, ts) keeping the
    min id (only that row is ever selectable under the tie rule), then
    the ``asof_join`` union-window trick runs BOTH directions over ONE
    key-partitioned sort — backward neighbor from ``last(struct)``
    over the preceding frame, forward neighbor from ``first(struct)``
    over the following frame (right rows sort before left at equal
    timestamps, so a simultaneous right row wins with Δ=0) — and a
    narrow projection picks the closer side. ONE shuffle on the key,
    spill-able sort, no per-row subquery (the DuckDB oracle runs the
    quadratic correlated form this plan replaces).

    NULL keys follow equi-join semantics (r08 advisory fix): NULL
    never matches NULL, so NULL-key RIGHT rows are filtered before the
    union (``Window.partitionBy`` would otherwise group them into one
    NULL partition and hand them to NULL-key left rows — diverging
    from the oracle's correlated ``c.user_id = p.user_id`` predicate),
    while NULL-key LEFT rows are preserved with a NULL match, exactly
    as a left equi-join preserves them.

    Returns left columns + ``{right_id}{suffix}`` and
    ``delta_us{suffix}`` (signed right−left µs; both NULL when no
    right row lies within tolerance).
    """
    r0 = right.filter(F.col(on).isNotNull()).groupBy(
        F.col(on).alias("__k"), F.col(right_ts).alias("__ts")
    ).agg(F.min(right_id).alias("__rid"))
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(r0.schema["__rid"].dataType).alias("__rid"),
    )
    r_tag = r0.select(
        "__k",
        "__ts",
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tag.schema["__lrow"].dataType).alias("__lrow"),
        "__rid",
    )
    unioned = l_tag.unionByName(r_tag)
    order = [F.col("__ts").asc(), F.col("__side").asc()]
    w_back = (
        Window.partitionBy("__k").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("__k").orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    cand = F.when(F.col("__side") == 0, F.struct("__ts", "__rid"))
    picked = unioned.select(
        "__side",
        "__lrow",
        F.unix_micros(F.col("__ts")).alias("__lus"),
        F.last(cand, ignorenulls=True).over(w_back).alias("__prev"),
        F.first(cand, ignorenulls=True).over(w_fwd).alias("__next"),
    ).filter(F.col("__side") == 1)
    d_prev = F.col("__lus") - F.unix_micros(F.col("__prev.__ts"))
    d_next = F.unix_micros(F.col("__next.__ts")) - F.col("__lus")
    take_prev = F.col("__prev").isNotNull() & (
        F.col("__next").isNull() | (d_prev <= d_next)
    )
    chosen_id = F.when(take_prev, F.col("__prev.__rid")).otherwise(F.col("__next.__rid"))
    chosen_delta = F.when(take_prev, -d_prev).otherwise(d_next)
    if tolerance_seconds is not None:
        in_tol = F.abs(chosen_delta) <= int(tolerance_seconds) * 1_000_000
        chosen_id = F.when(in_tol, chosen_id)
        chosen_delta = F.when(in_tol, chosen_delta)
    return picked.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        chosen_id.alias(f"{right_id}{suffix}"),
        chosen_delta.cast("long").alias(f"delta_us{suffix}"),
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_expr: str = "INTERVAL 5 MINUTES",
    out_count: str = "n_in_range",
) -> DataFrame:
    """Count right rows per left row with equal key and
    ``left.ts − window < right.ts < left.ts`` (half-open lookback).

    Declarative non-equi join: Catalyst plans key-equi + range
    predicates; with AQE the equi part still hashes on the key, so the
    range condition is evaluated only within key groups.
    """
    l = left.alias("l")
    r = right.alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(window_expr))
        & (F.col(f"r.{right_ts}") < F.col(f"l.{left_ts}"))
    )
    joined = l.join(r, cond, "left")
    return joined.groupBy(*[F.col(f"l.{c}") for c in left.columns]).agg(
        F.count(F.col(f"r.{right_ts}")).alias(out_count)
    )


def gap_fill_resample(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "1 hour",
) -> DataFrame:
    """Resample an event stream onto a regular time grid with
    forward-fill (R7/R8 family: the gap-fill every time-series
    warehouse exposes — TimescaleDB ``time_bucket_gapfill``/``locf``,
    kdb ``fills``).

    Per key: bucket observations (integer-cents SUM per bucket — exact
    across engines), span the key's [first, last] bucket with
    ``sequence``+``explode`` (each key's grid generates map-side from
    2 values — never a driver loop), left-join observations onto the
    grid, and forward-fill empty buckets with ``last(value,
    ignorenulls)`` over the key's time-ordered window.

    Scale: one shuffle for the bucket agg, one for the grid↔obs join,
    one window sort per key — all hash-partitioned on the key. Grid
    size is bounded by span/bucket per key; a key with a pathological
    span yields a long grid but stays spill-able (window is a running
    last, O(1) state). Output: (key, bucket_ts, value_cents, observed).
    """
    # bucketing unit and grid step must agree; only these two buckets
    # have a matching date_trunc unit, so reject anything else rather
    # than silently bucketing by day while stepping the grid finer
    if bucket not in ("1 hour", "1 day"):
        raise ValueError(
            f"gap_fill_resample supports bucket '1 hour' or '1 day', got {bucket!r}"
        )
    b = F.date_trunc("hour" if bucket == "1 hour" else "day", F.col(ts_col))
    obs = (
        events.select(F.col(key), b.alias("__b"),
                      F.round(F.col(value_col) * 100).cast("long").alias("__c"))
        .groupBy(key, "__b")
        .agg(F.sum("__c").alias("__v"))
    )
    # spans come STRAIGHT from the events (same trunc expression), not
    # from obs: each frame then has exactly ONE consumer (r14 guard
    # class) and the cost is two explicit NARROW pushed-down scans —
    # measured CHEAPER at sf1 (0.6 s) than pinning the keys×buckets
    # obs frame (3.3 s: the cache write of millions of rows dwarfs the
    # columnar re-scan it saves). The span values are identical by
    # construction (min/max of the same bucket expression).
    spans = (
        events.select(F.col(key), b.alias("__b"))
        .groupBy(key)
        .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
    )
    grid = spans.select(
        key,
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"INTERVAL {bucket}"))
        ).alias("bucket_ts"),
    )
    joined = grid.join(
        obs.withColumnRenamed("__b", "bucket_ts"), [key, "bucket_ts"], "left"
    )
    w = (
        Window.partitionBy(key)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key,
        "bucket_ts",
        F.last("__v", ignorenulls=True).over(w).alias("value_cents"),
        F.col("__v").isNotNull().alias("observed"),
    )


def time_weighted_avg(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Time-weighted average per key (TimescaleDB ``time_weight('locf')``
    semantics): each observation's value holds until the next
    observation, so the average is ∫value·dt / total span —
    Σ vᵢ·(tᵢ₊₁−tᵢ) / (tₙ−t₀). Keys with fewer than two observations
    have no span and are omitted.

    Exact across engines: values in integer cents, durations in whole
    microseconds — both sums are exact BIGINTs folded map-side; the
    single double division happens once at the end. One shuffle
    (window by key) + the final per-key aggregation, both
    hash-partitioned on the key; window state is O(1) per row (lead).
    The window orders by (ts, value): with ts alone, duplicate
    timestamps would make which value carries the interval
    tie-order-nondeterministic (and engine-dependent vs the oracle)."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), F.col(value_col).asc())
    stepped = events.select(
        F.col(key),
        F.col(ts_col),
        F.round(F.col(value_col) * 100).cast("long").alias("__c"),
        (
            F.unix_micros(F.lead(ts_col).over(w)) - F.unix_micros(F.col(ts_col))
        ).alias("__dur_us"),
    ).filter(F.col("__dur_us").isNotNull())
    return (
        stepped.groupBy(key)
        .agg(
            F.sum(F.col("__c") * F.col("__dur_us")).alias("__num"),
            F.sum("__dur_us").alias("__den"),
        )
        .select(
            key,
            F.round(F.col("__num") / F.col("__den"), 6).alias("twa_cents"),
            F.col("__den").alias("span_us"),
        )
    )


def ewma_last(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.25,
) -> DataFrame:
    """Final exponentially-weighted moving average per key:
    e₀ = v₀, eᵢ = (1−α)·eᵢ₋₁ + α·vᵢ over the key's time-ordered
    values — the classic irregular-series smoother whose recursion is
    inherently SEQUENTIAL per key. The distributed unit is therefore
    the KEY (applyInPandas: every key's fold runs independently across
    executors, one shuffle); within a key the fold runs in pandas'
    C-implemented ``Series.ewm(adjust=False)``, which computes the
    identical recursion vectorized — no per-row Python loop, so a
    million-row key costs a C pass, not a Python one.

    Cross-engine determinism: rows order by (ts, value) — ties carry
    identical contributions — and both engines evaluate the same
    ``(1−α)·acc + α·x`` shape (pandas' adjust=False kernel divides by
    ``(1−α)+α``, exactly 1.0 for dyadic α, an identity), so IEEE
    doubles match bit-for-bit when α is dyadic (the default 0.25);
    the final round is explicit half-away-from-zero to match the SQL
    oracle's ROUND (Python's built-in round() is banker's and would
    diverge on exact 6th-decimal ties). Returns
    (key, ewma_last, n_obs)."""
    import math

    import pandas as pd

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col], kind="mergesort")
        e = float(
            pdf[value_col].astype("float64").ewm(alpha=alpha, adjust=False).mean().iloc[-1]
        )
        e6 = math.copysign(math.floor(abs(e) * 1e6 + 0.5), e) / 1e6
        return pd.DataFrame(
            {key: [pdf[key].iloc[0]], "ewma_last": [e6], "n_obs": [len(pdf)]}
        )

    key_type = events.schema[key].dataType.simpleString()
    return events.select(key, ts_col, value_col).groupBy(key).applyInPandas(
        fold, f"{key} {key_type}, ewma_last double, n_obs long"
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str = "event_id",
    agg_value_col: str | None = None,
) -> DataFrame:
    """Batch sessionization: assign every event to a session of its key
    where consecutive events more than ``gap_seconds`` apart start a
    new session, then roll each session up to one summary row — the
    batch twin of the streaming ``session_window`` face (R23), and the
    canonical lag→flag→running-sum window composition.

    Scale posture: ONE shuffle on the key. The lag/running-sum window
    partitions by key; the session rollup groups by (key, session_seq),
    which hash-partitioning on key already clusters, so Catalyst's
    EnsureRequirements inserts no second Exchange — lag, cumulative
    sum, and the final aggregation all run inside the key's partition
    (asserted in PLANS.md). Skewed keys spill through the sort, never
    blow up state.

    Ordering is (ts, tiebreak) so equal timestamps are deterministic.
    ``agg_value_col`` additionally sums that column EXACTLY via integer
    cents (the oracle-parity trick the profiler uses). Returns
    (key, session_seq, session_start, session_end, n_events[,
    sum_value_cents]).
    """
    w = Window.partitionBy(key).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(ts_col).over(w)
    # exact integer microseconds — a seconds cast truncates sub-second
    # components and disagrees with the oracle's epoch_us on gap ties
    is_new = F.when(
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)) > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    running = Window.partitionBy(key).orderBy(ts_col, order_tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessioned = events.withColumn("__new", is_new).withColumn(
        "session_seq", F.sum("__new").over(running).cast("long")
    )
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if agg_value_col is not None:
        aggs.append(
            F.sum(F.round(F.col(agg_value_col) * 100).cast("long")).alias("sum_value_cents")
        )
    return sessioned.groupBy(key, "session_seq").agg(*aggs)


def collapse_bursts(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 300,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Temporal duplicate suppression: within each key, events closer
    than ``gap_seconds`` to their predecessor drop — keeping the FIRST
    event of every burst. The telemetry/webhook dedup (retry storms,
    double-fires, at-least-once deliveries) where exact-key dedup
    can't help because every duplicate has a fresh event id.

    The sessionize lag trick with a keep-filter instead of a running
    sum: ONE shuffle on the key, exact integer-µs gap comparison,
    (ts, tiebreak) ordering so equal timestamps are deterministic.
    Note the semantics are predecessor-chained: three events 4 minutes
    apart collapse to one (each is within the gap of the previous),
    even though the third is 8 minutes from the survivor — burst
    semantics, not fixed-window semantics.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(ts_col).over(w)
    keep = prev_ts.isNull() | (
        (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)) > gap_seconds * 1_000_000
    )
    return events.withColumn("__keep", keep).filter(F.col("__keep")).drop("__keep")


def attribute_conversions(
    conversions: DataFrame,
    touches: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    channel_col: str = "event_type",
    horizon_hours: int = 24,
) -> DataFrame:
    """Linear multi-touch attribution: each conversion's value splits
    EQUALLY across the user's touches in the ``horizon_hours`` before
    it (inclusive of the conversion instant); conversions with no
    touch in the window credit a synthetic ``direct`` channel — the
    marketing-analytics allocator (vs last-touch, which is the
    existing ``asof_join`` composed with a rollup).

    Exactness contract: per-touch credit is
    ``(value_cents · 10⁶) div n_touches`` in integer MICRO-CENTS —
    floor division, so a conversion's attributed total can undershoot
    by < n_touches µ¢ but sums are BIGINT-exact and order-free. A
    double division here would make the channel rollup a sum of
    floats, which is summation-order-dependent and can't hash-check.

    Plan: one user-keyed equi-join (conversions ⨝ touches, LEFT so
    no-touch conversions survive) with the horizon predicate riding
    it, a per-conversion count window (keyed on (user, seq) — full key
    cardinality, no hot reducer), and a ≤|channels| rollup. The
    per-conversion key is CONTENT-DERIVED: ``row_number()`` over
    (user, ts, cents) — a per-user window that shares the join's user
    partitioning — so no ``monotonically_increasing_id`` (whose
    re-evaluated lineage could re-assign ids) and no eager
    materialization of the conversions table. Ties (fully identical
    conversion rows) get arbitrary but distinct seqs; the result is
    invariant because tied rows are interchangeable.
    Returns (channel, n_touches, attributed_microcents).
    """
    w_seq = Window.partitionBy("__u").orderBy("__cts", "__cents")
    conv = conversions.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__cts"),
        F.round(F.col(value_col) * 100).cast("long").alias("__cents"),
    ).withColumn("__cid", F.row_number().over(w_seq))
    tch = touches.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__tts"),
        F.col(channel_col).alias("__ch"),
    )
    horizon_us = int(horizon_hours) * 3600 * 1_000_000
    cond = (
        (F.unix_micros(F.col("__tts")) > F.unix_micros(F.col("__cts")) - horizon_us)
        & (F.col("__tts") <= F.col("__cts"))
    )
    j = conv.join(tch, on=[conv["__u"] == tch["__u"], cond], how="left").select(
        conv["__u"], "__cid", "__cents", F.col("__ch")
    )
    w = Window.partitionBy("__u", "__cid")
    credited = j.withColumn(
        "__n", F.count("__ch").over(w)
    ).select(
        F.coalesce(F.col("__ch"), F.lit("direct")).alias("channel"),
        F.when(
            F.col("__n") > 0,
            F.expr("(__cents * 1000000) div __n"),
        ).otherwise(F.col("__cents") * 1_000_000).alias("__credit"),
    )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.sum("__credit").cast("long").alias("attributed_microcents"),
    )


def interpolate_resample(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "1 hour",
) -> DataFrame:
    """Resample onto a regular grid with LINEAR interpolation between
    the surrounding observations — the companion of
    ``gap_fill_resample``'s forward-fill (TimescaleDB
    ``interpolate()`` vs ``locf()``): a gap between buckets valued 100
    and 400 fills with the line between them, not a repeated 100.

    Same plan skeleton as the gap-fill (bucket agg → per-key grid via
    ``sequence``+explode → grid⨝obs left join): each grid row then
    takes the last observed (value, bucket) at-or-before it and the
    first at-or-after it from two frames of ONE key-partitioned
    window sort, and interpolates
    ``prev + (next − prev)·(t − t_prev)/(t_next − t_prev)`` in exact
    integer cents×µs with one final IEEE division — engine-identical,
    so the result hash-checks. Grid rows ON an observation reduce to
    the observation exactly (ratio 0). The grid spans each key's
    [first, last] observed bucket, so both neighbors always exist —
    no extrapolation policy to choose.

    Output: (key, bucket_ts, value_interp — interpolated cents as
    double rounded to 6dp, observed).
    """
    if bucket not in ("1 hour", "1 day"):
        raise ValueError(
            f"interpolate_resample supports bucket '1 hour' or '1 day', got {bucket!r}"
        )
    b = F.date_trunc("hour" if bucket == "1 hour" else "day", F.col(ts_col))
    obs = (
        events.select(F.col(key), b.alias("__b"),
                      F.round(F.col(value_col) * 100).cast("long").alias("__c"))
        .groupBy(key, "__b")
        .agg(F.sum("__c").alias("__v"))
    )
    # spans come STRAIGHT from the events (same trunc expression), not
    # from obs: each frame then has exactly ONE consumer (r14 guard
    # class) and the cost is two explicit NARROW pushed-down scans —
    # measured CHEAPER at sf1 (0.6 s) than pinning the keys×buckets
    # obs frame (3.3 s: the cache write of millions of rows dwarfs the
    # columnar re-scan it saves). The span values are identical by
    # construction (min/max of the same bucket expression).
    spans = (
        events.select(F.col(key), b.alias("__b"))
        .groupBy(key)
        .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
    )
    grid = spans.select(
        key,
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"INTERVAL {bucket}"))
        ).alias("bucket_ts"),
    )
    joined = grid.join(
        obs.withColumnRenamed("__b", "bucket_ts"), [key, "bucket_ts"], "left"
    )
    w_back = (
        Window.partitionBy(key)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key)
        .orderBy("bucket_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_ts = F.when(F.col("__v").isNotNull(), F.col("bucket_ts"))
    prev_v = F.last("__v", ignorenulls=True).over(w_back)
    prev_t = F.unix_micros(F.last(obs_ts, ignorenulls=True).over(w_back))
    next_v = F.first("__v", ignorenulls=True).over(w_fwd)
    next_t = F.unix_micros(F.first(obs_ts, ignorenulls=True).over(w_fwd))
    t = F.unix_micros(F.col("bucket_ts"))
    # the cents-diff × µs-gap product can exceed int64 (≈3.6e6 cents
    # across a 30-day gap already does); decimal(38,0) keeps it exact
    # where BIGINT would wrap silently under non-ANSI mode (the
    # trend_per_key precedent; the DuckDB oracle uses HUGEINT). The
    # decimal→double cast is correctly rounded on both engines, so the
    # final value is engine-identical in and out of the BIGINT range.
    num = (next_v - prev_v).cast("decimal(20,0)") * (t - prev_t).cast("decimal(18,0)")
    interp = F.when(
        next_t == prev_t, prev_v.cast("double")
    ).otherwise(
        prev_v.cast("double")
        + num.cast("double") / (next_t - prev_t).cast("double")
    )
    return joined.select(
        key,
        "bucket_ts",
        F.round(interp, 6).alias("value_interp"),
        F.col("__v").isNotNull().alias("observed"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    bucket_micros: int,
    start_col: str = "start",
    end_col: str = "end",
    suffix: str = "_r",
    max_explode_factor: int = 1_000_000,
) -> DataFrame:
    """Interval-overlap join: all (left, right) row pairs whose
    half-open time intervals ``[start, end)`` intersect — the
    temporal/genomic workhorse (concurrent sessions, overlapping
    downtime windows, co-occurring bursts) that a naive theta join
    makes quadratic.

    Banding plan: each interval explodes to EVERY time bucket of width
    ``bucket_micros`` it touches (``sequence(floor(start/w),
    floor((end−1)/w))``); candidates come from the bucket EQUI-join;
    exact overlap predicates filter; duplicates (pairs sharing several
    buckets) collapse with one distinct. Candidate volume is
    Σ_b |left_b|·|right_b| — concurrency-bounded per bucket, never
    |L|·|R|.

    ``bucket_micros`` is a COST knob, not a correctness bound: because
    an interval explodes into all buckets it spans, no pair is ever
    missed at any width — a bucket much smaller than the longest
    interval only inflates the explode factor (an interval of length L
    becomes ~L/w rows), while a bucket much wider than typical
    intervals only admits more candidates for the exact filter to
    drop. Pick it near the longest common interval length; the r06
    eager max-length guard (two extra full-scan jobs per call, and a
    wrong rationale — it claimed undersized buckets MISS pairs) is
    gone.

    What remains is a cheap IN-PLAN sanity cap (r08 advisory): an
    interval spanning more than ``max_explode_factor`` buckets raises
    with an actionable message at evaluation time — a badly undersized
    width is a silent cost cliff (a 1-year interval at 1-second
    buckets is ~31 M rows, and extreme cases would otherwise die in
    ``sequence()``'s opaque array-length limit). The check is a
    per-row narrow expression on the already-computed bucket bounds —
    no extra scan, no extra job, unlike the r06 guard.

    Returns left columns + right columns suffixed; overlap is strict
    (``l.start < r.end AND r.start < l.end`` — touching endpoints of
    half-open intervals do NOT overlap).
    """
    if bucket_micros <= 0:
        raise ValueError(f"bucket_micros must be positive, got {bucket_micros}")
    if max_explode_factor <= 0:
        raise ValueError(f"max_explode_factor must be positive, got {max_explode_factor}")
    w = int(bucket_micros)

    def us(c):
        return F.unix_micros(F.col(c))

    def banded(df: DataFrame, rename: bool) -> DataFrame:
        cols = (
            [F.col(c).alias(f"{c}{suffix}") for c in df.columns] if rename
            else [F.col(c) for c in df.columns]
        )
        b0 = F.floor(us(start_col) / w)
        # end is exclusive: an interval ending exactly on a bucket
        # boundary does not touch that bucket
        b1 = F.floor((us(end_col) - 1) / w)
        nb = b1 - b0 + F.lit(1)
        b1_guarded = F.when(
            nb > max_explode_factor,
            F.raise_error(
                F.concat(
                    F.lit("interval_overlap_join: an interval spans "),
                    nb.cast("string"),
                    F.lit(
                        f" buckets of width {w} µs, over max_explode_factor="
                        f"{max_explode_factor}. bucket_micros is a pure cost "
                        "knob (no pair is ever missed) — raise it toward the "
                        "longest interval length, or raise max_explode_factor."
                    ),
                )
            ).cast("long"),
        ).otherwise(b1)
        return df.select(
            *cols, F.explode(F.sequence(b0, b1_guarded)).alias("__bucket")
        )

    la = banded(left, rename=False)
    rb = banded(right, rename=True)
    ls, le = us(start_col), us(end_col)
    rs, re_ = us(f"{start_col}{suffix}"), us(f"{end_col}{suffix}")
    return (
        la.join(rb, "__bucket")
        .filter((ls < re_) & (rs < le))
        .drop("__bucket")
        .distinct()
    )


def rolling_active_users(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Rolling DAU/WAU engagement: per calendar day, the distinct
    users active THAT day (dau), the distinct users active in the
    trailing ``window_days`` window ending that day (wau), and the
    dau/wau stickiness ratio — the daily-engagement report every
    product-analytics stack publishes.

    Rolling COUNT DISTINCT cannot be a window function (distinctness
    doesn't decompose over frames); the classic day-range self-join is
    quadratic in days. Instead each (day, user) activity CONTRIBUTES
    itself to the ≤``window_days`` trailing windows it falls in — a
    map-side explode of a ``window_days``-element date sequence,
    narrow and bounded — and the rolling distinct count becomes a
    plain per-day ``count_distinct``. Cost: one (day, user) distinct
    hash-agg to collapse raw events, a ≤``window_days``× explode of
    that already-collapsed table, and two-phase distinct aggs on the
    day key. Days before the first full window report partial windows
    (window_end ≤ max day filters the tail overhang).

    Returns (day, dau, wau, stickiness), one row per day with any
    activity in its trailing window.
    """
    d = F.to_date(F.col(ts_col))
    du = events.select(d.alias("__d"), F.col(user_col).alias("__u")).distinct()
    bounds = F.broadcast(du.agg(F.max("__d").alias("__max_d")))
    contrib = (
        du.select(
            F.explode(F.sequence(F.col("__d"), F.date_add(F.col("__d"), window_days - 1)))
            .alias("day"),
            "__u",
        )
        .crossJoin(bounds)
        .filter(F.col("day") <= F.col("__max_d"))
    )
    wau = contrib.groupBy("day").agg(F.count_distinct("__u").cast("long").alias("wau"))
    dau = du.groupBy(F.col("__d").alias("day")).agg(
        F.count_distinct("__u").cast("long").alias("dau")
    )
    return (
        wau.join(dau, "day", "left")
        .select(
            "day",
            F.coalesce(F.col("dau"), F.lit(0)).cast("long").alias("dau"),
            "wau",
            (F.coalesce(F.col("dau"), F.lit(0)).cast("double") / F.col("wau").cast("double")).alias("stickiness"),
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    eager_cleanup: bool = True,
) -> DataFrame:
    """Weekly cohort-retention matrix — the product-analytics staple:
    users are assigned to the cohort of their FIRST event's week, and
    each cell counts how many of that cohort were active ``age_weeks``
    weeks later, as a fraction of the cohort.

    Scale posture: the first-event aggregate shuffles once on the user
    key and has exactly ONE consumer (the activity join, which re-uses
    that same hash partitioning — EnsureRequirements inserts no new
    Exchange on the aggregated side); the cell rollup's
    ``count_distinct`` is a two-phase partial-then-final aggregate on
    (cohort, age) — a matrix of at most weeks² cells, kilobytes
    however large the event log. Cohort SIZES come from the cell
    matrix itself: every user is active at age 0 by construction
    (their first event), so ``n_cohort = n_active at age_weeks=0`` —
    no second consumer of the user-sized first-event frame (r14 guard
    class); the kilobyte cell matrix is pinned once and its age-0
    slice broadcasts into the final ratio. No window functions,
    nothing per-user on the driver.

    Float parity: ``retention`` divides two BIGINTs in one IEEE
    division (exact cross-engine); week truncation is Monday-anchored
    on both Spark and DuckDB ``date_trunc('week', ...)``.

    Returns (cohort_week, age_weeks, n_active, n_cohort, retention).
    """
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("__first_ts"))
    cohort = F.date_trunc("week", F.col("__first_ts")).alias("cohort_week")
    acts = (
        events.select(user_col, ts_col)
        .join(first, user_col)
        .select(
            F.col(user_col),
            cohort,
            F.floor(
                F.datediff(F.date_trunc("week", F.col(ts_col)), F.date_trunc("week", F.col("__first_ts"))) / 7
            ).cast("long").alias("age_weeks"),
        )
    )
    cells = (
        acts.groupBy("cohort_week", "age_weeks")
        .agg(F.count_distinct(F.col(user_col)).alias("n_active"))
        # weeks²-sized; two consumers below. RELEASED before return
        # under the family's eager-cleanup contract (ADVICE r14 — the
        # doc_keywords idiom); eager_cleanup=False keeps the lazy
        # gate-visible lineage and leaves the pin (kilobytes,
        # CacheManager-deduped, eviction-bounded).
        .persist()
    )
    sizes = cells.filter(F.col("age_weeks") == 0).select(
        "cohort_week", F.col("n_active").alias("n_cohort")
    )
    out = (
        cells
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "age_weeks",
            F.col("n_active").cast("long").alias("n_active"),
            F.col("n_cohort").cast("long").alias("n_cohort"),
            (F.col("n_active").cast("double") / F.col("n_cohort").cast("double")).alias("retention"),
        )
    )
    if not eager_cleanup:
        return out
    out = out.localCheckpoint(eager=True)  # weeks²-sized leaf
    cells.unpersist()
    return out


def ordered_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """TRUE ordered funnel: a user completes step k at the EARLIEST
    event of type ``steps[k]`` at-or-after their step k−1 completion
    time — and STRICTLY after the latest earlier completion of the
    SAME type, adjacent or not: a repeated step needs a genuinely new
    event, so ["click", "click"] counts users with ≥2 clicks, and in
    ["view", "click", "view"] the view that opened the funnel can
    never also close it through a tied click timestamp (r08+r09
    advisory rule; simultaneous duplicate events of one type count
    once, the strictly-after reading) — the
    product-analytics ordered-sequence semantics. (The
    existing ``purchase_funnel`` face uses the weaker first-event
    ordering, which wrongly drops a user whose first click precedes
    their first view even though an ordered view→click path exists
    later.) Greedy earliest-completion is optimal for existence: an
    earlier step-k time can only admit more step-k+1 candidates.

    Plan (r08): the step branches are written over ONE step-filtered,
    user-key-repartitioned view of the log. Catalyst then pushes each
    step's equality predicate back through the repartition into its
    own column-pruned, type-filtered parquet scan (predicate pushdown
    beats the single-pass sharing — each scan reads only its step's
    rows), so per step the plan is: pushed-filter scan → ONE user-key
    exchange → join/min-agg chains that all REUSE that partitioning.
    Every event row crosses the wire exactly once; no join or
    aggregate ever re-exchanges the user key; and the identical
    prev-step subtrees (step k's table feeds both its own count and
    step k+1's join) dedup at runtime via AQE stage reuse
    (ReusedExchange — gated in PLANS.md). No window functions, no
    self-join of the full log; the whole funnel is ONE lazy plan (a
    union of k one-row count aggregates — no driver-side loop
    actions).

    Returns (step_idx, step, n_users) — one row per step, counts
    monotonically non-increasing.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    u, t = F.col(user_col), F.col(ts_col)
    # one scan + one user-key exchange shared by every step branch
    ev_all = (
        events.filter(F.col(type_col).isin(*set(steps)))
        .select(u.alias("__u"), t.alias("__ts"), F.col(type_col).alias("__e"))
        .repartition("__u")
    )
    # a repeated step TYPE — adjacent or not — must consume a strictly
    # newer event than the latest earlier completion of that type, so
    # one event can never close two occurrences of its own type.
    # Completion times are monotone non-decreasing along the funnel,
    # so carrying ONE last-completion column per repeated type (named
    # by the type's first occurrence index) captures the constraint.
    repeated = {s for s in steps if steps.count(s) > 1}

    def _lt(s: str) -> str:
        return f"__lt_{steps.index(s)}"

    prev = (
        ev_all.filter(F.col("__e") == steps[0])
        .groupBy("__u")
        .agg(F.min("__ts").alias("__t"))
    )
    if steps[0] in repeated:
        prev = prev.withColumn(_lt(steps[0]), F.col("__t"))
    seen = {steps[0]}

    def step_row(i: int, name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(i).cast("long").alias("step_idx"),
            F.lit(name).alias("step"),
            "n_users",
        )

    out = step_row(0, steps[0], prev)
    for i, step in enumerate(steps[1:], start=1):
        ev = ev_all.filter(F.col("__e") == step).select("__u", "__ts")
        # at-or-after (>=) the previous step: a click at the exact
        # view timestamp completes view→click. A step whose TYPE
        # already completed earlier additionally requires strictly
        # after that type's latest completion (adjacent repeats reduce
        # to plain >, the r08 rule; non-adjacent repeats are the r09
        # generalization — the python fuzz model mirrors both)
        cond = F.col("__ts") >= F.col("__t")
        if step in seen:
            cond = cond & (F.col("__ts") > F.col(_lt(step)))
        carried = [c for c in prev.columns if c.startswith("__lt_") and c != _lt(step)]
        prev = (
            ev.join(prev, "__u")
            .filter(cond)
            .groupBy("__u")
            .agg(
                F.min("__ts").alias("__t"),
                # per-user constants under this group-by — first() is
                # deterministic here
                *[F.first(c).alias(c) for c in carried],
            )
        )
        if step in repeated:
            prev = prev.withColumn(_lt(step), F.col("__t"))
        seen.add(step)
        out = out.unionByName(step_row(i, step, prev))
    return out


def interval_islands(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping-or-touching intervals per key into maximal
    covered ISLANDS (the classic gaps-and-islands union): a new island
    opens exactly where an interval starts strictly after the running
    maximum end of everything before it. The complement of
    ``sessionize`` (which gaps POINT events): here the inputs carry
    their own extents, and the answer is the union of ranges — device
    uptime from lease intervals, effective coverage from overlapping
    SLAs, busy time from job spans.

    Determinism: rows order by (start, end) within a key; equal
    (start, end) duplicates are order-indifferent, and the island
    boundary rule is ``>`` (touching intervals [a,b],[b,c] merge).
    Intervals must have ``start <= end`` and non-null extents —
    enforced, because a silently-negative interval would corrupt the
    running maximum for every later row in its key.

    Plan: ONE key-hash shuffle — the running-max window, the island
    cumulative sum, and the final per-(key, island) rollup all share
    the ``key_col`` partitioning (the rollup key is a superset, so
    EnsureRequirements adds no second Exchange); nothing driver-side,
    state one row per interval.

    Returns (key, island_start, island_end, n_intervals) — one row
    per maximal island.
    """
    order = [F.col(start_col).asc(), F.col(end_col).asc()]
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bad = F.col(start_col).isNull() | F.col(end_col).isNull() | (
        F.col(start_col) > F.col(end_col)
    )
    checked = df.select(
        key_col,
        F.when(
            bad,
            F.raise_error(
                F.concat(
                    F.lit("interval_islands: bad interval (null or start>end): "),
                    F.col(start_col).cast("string"), F.lit(" .. "),
                    F.col(end_col).cast("string"),
                )
            ),
        ).otherwise(F.col(start_col)).alias(start_col),
        F.col(end_col),
    )
    prev_max = F.max(end_col).over(w_prev)
    flagged = checked.withColumn(
        "__new",
        F.when(prev_max.isNull() | (F.col(start_col) > prev_max), 1).otherwise(0),
    )
    grouped = flagged.withColumn("__island", F.sum("__new").over(w_run))
    return (
        grouped.groupBy(key_col, "__island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
        )
        .drop("__island")
    )


def absent_followup(
    events: DataFrame,
    trigger_type: str,
    expected_type: str,
    window_seconds: int,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """ABSENCE detection — the time-window anti-join: per key, how many
    trigger events were NOT followed by the expected event within the
    window ("views with no purchase inside the hour", "alert with no
    ack in 15 min" — the SLA/abandonment primitive). The as-of family
    answers "what happened nearest/next"; this answers the operational
    complement, "what never happened in time", which SQL states as
    NOT EXISTS over a time range.

    Plan: both sides prune to their type at the scan, then ONE
    key-equi anti join carries the window predicate
    ``trigger.ts ≤ expected.ts < trigger.ts + window`` as a residual —
    candidates are key-co-partitioned (one shuffle each side, the
    equi-key anti form Catalyst plans as SMJ/ShuffledHash LeftAnti),
    never a time-range cross join. The inclusive/exclusive bounds are
    exact-µs comparisons (``unix_micros``), so the result is
    hash-exact. Returns (key, n_triggers, n_unanswered) per key that
    has at least one trigger.
    """
    # NTZ-tolerant: both sides take the same cast, so the window
    # comparison is unaffected by the session zone
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    trig = events.filter(F.col(type_col) == trigger_type).select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        t_us.alias("__us"),
    )
    exp = events.filter(F.col(type_col) == expected_type).select(
        F.col(key_col).alias("__k"), t_us.alias("__eus")
    )
    win_us = int(window_seconds) * 1_000_000
    unanswered = trig.join(
        exp,
        (trig["__k"] == exp["__k"])
        & (F.col("__eus") >= F.col("__us"))
        & (F.col("__eus") < F.col("__us") + F.lit(win_us)),
        "left_anti",
    )
    n_un = unanswered.groupBy("__k").agg(
        F.count(F.lit(1)).cast("long").alias("n_unanswered")
    )
    n_tr = trig.groupBy("__k").agg(
        F.count(F.lit(1)).cast("long").alias("n_triggers")
    )
    return (
        n_tr.join(n_un, "__k", "left")
        .select(
            F.col("__k").alias(key_col),
            "n_triggers",
            F.coalesce("n_unanswered", F.lit(0)).cast("long").alias("n_unanswered"),
        )
    )
