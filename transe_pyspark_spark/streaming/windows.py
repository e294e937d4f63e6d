"""Structured Streaming over the ``events`` table (SURVEY §2B R23 — a
capability gap in the reference, required by the engine contract).

Each streaming query has a *batch twin* built from the same column
expressions; tests assert twin equivalence under
``Trigger.AvailableNow`` (SURVEY §5.5). Watermarks bound state at
scale: a tumbling/sliding agg holds only open windows, session windows
hold one state per active (key, session), and
``dropDuplicatesWithinWatermark`` evicts seen-keys past the watermark.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch under AvailableNow).

    The stream schema is taken from the batch footer, because the
    fixture's ``ts`` physical type has shipped BOTH as TIMESTAMP(NANOS)
    (int64 under ``nanosAsLong`` — converted to µs here) and as plain
    TIMESTAMP(MICROS) (native TimestampType, no conversion). Pinning
    either layout silently mis-scales the other by 1000× — a 1970-epoch
    stream every watermark/window then happily processes."""
    import os

    from pyspark.sql import types as T

    from transe_pyspark_spark.sources.readers import ensure_session_conf

    ensure_session_conf(spark)
    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if isinstance(schema["ts"].dataType, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(schema["ts"].dataType, T.TimestampNTZType):
        # NTZ is not a valid event-time column for watermarks; the
        # session tz is UTC so the cast preserves the instant
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(events: DataFrame, width: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window count+sum per event_type; watermark drops late
    rows and bounds state."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "value_cents")
    )


def windowed_quality_counts(
    events: DataFrame,
    width: str = "1 hour",
    watermark: str = "2 hours",
    value_hi: float = 400.0,
) -> DataFrame:
    """Streaming data-quality monitor — the ``operators/quality``
    constraint vocabulary applied per tumbling window: total rows,
    error-class rows (``event_type = 'error'``), value outliers
    (``value > value_hi``), and NULL-user rows, all exact BIGINTs.
    The screen that pages on a bad deploy (error-rate spike) or an
    upstream schema break (NULL surge) within one watermark delay.

    Plan: one windowed conditional aggregate — every violation rule is
    a ``sum(when(...))`` inside the SAME groupBy, so the stream pays
    one stateful operator with watermark-bounded state regardless of
    how many rules ride along. Works identically on a batch frame (the
    oracle twin)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("n_error"),
            F.sum(
                F.when(F.col("value").isNotNull() & (F.col("value") > value_hi), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_value_outlier"),
            (F.count(F.lit(1)) - F.count(F.col("user_id"))).cast("long").alias("n_null_user"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "n_error",
            "n_value_outlier",
            "n_null_user",
        )
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_counts(events: DataFrame, gap: str = "10 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming dedup on event_id with watermark-bounded
    state; batch twin is a plain dropDuplicates."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])
    return events.dropDuplicates(["event_id"])


def click_purchase_interval_join(clicks: DataFrame, purchases: DataFrame, horizon: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join (R23): each click matched to the
    same user's purchases within ``horizon`` after it. Watermarks on
    BOTH sides bound the join state — click state is droppable once
    the purchase-side watermark passes click.ts + horizon; without the
    time bound the state would grow forever."""
    c = clicks.select(
        F.col("user_id"), F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return c.join(p, cond, "inner").select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts")


def run_process_all(stream_df: DataFrame, spark: SparkSession, output_mode: str = "complete") -> DataFrame:
    """Execute a streaming query until no more data is available
    (``processAllAvailable`` + stop) into a memory sink. The runner for
    BOUNDED custom Python stream sources: ``Trigger.AvailableNow``
    snapshots only the first prefetched micro-batch of a
    ``SimpleDataSourceStreamReader`` (measured: 800 of 5000 rows), while
    processAllAvailable drains until the source's offset stops
    advancing — which a bounded source guarantees."""
    name = f"q_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    return spark.table(name)


def run_available_now(stream_df: DataFrame, spark: SparkSession, output_mode: str = "complete") -> DataFrame:
    """Execute a streaming query to completion (AvailableNow) into a
    memory sink; returns the materialized result as a DataFrame."""
    name = f"q_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def documents_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """The documents stream schema, taken from the landed parquet's own
    footer rather than pinned in code: the fixture is regenerated
    per-round and physical types drift (the events ``ts`` column has
    already shipped as both int64-nanos and TIMESTAMP(MICROS)); a
    pinned schema silently mis-reads the other layout. Falls back to
    the documented logical shape when the directory has no parquet yet
    (a stream may start before the first drop lands)."""
    import os

    path = os.path.join(sf_dir, "documents.parquet")
    try:
        return spark.read.parquet(path).schema
    except Exception:
        return T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
                T.StructField("lang", T.StringType()),
                T.StructField("source", T.StringType()),
                T.StructField("n_chars", T.LongType()),
            ]
        )


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet — the shape of a
    continuously-landing corpus drop directory (at 100 TB: each landed
    file becomes a micro-batch; ``maxFilesPerTrigger`` paces it)."""
    return (
        spark.readStream.schema(documents_schema(spark, sf_dir))
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def corpus_clean_stream(docs: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming corpus ingestion: content-fingerprint dedup →
    Gopher-rule quality gate → token accounting, in one pass.

    The streaming face of ``corpus_clean_pipeline``: documents landing
    continuously are deduplicated against watermark-bounded seen-
    fingerprint state (``dropDuplicatesWithinWatermark`` — the state
    store holds only fingerprints newer than the watermark, so a
    forever-running ingest never accumulates unbounded keys), then
    pass the shared ``gopher_keep`` gate, then get token counts. All
    per-doc work is narrow column expressions; the only stateful op is
    the dedup. Ingest time is synthesized deterministically from
    doc_id (the fixture has no arrival timestamp) so twin equivalence
    is exact. Batch frames take the stateless twin path.
    """
    from transe_pyspark_spark.functions import text as X

    d = docs.withColumn(
        "ts", F.timestamp_micros((F.lit(1_600_000_000) + F.col("doc_id")) * 1_000_000)
    ).withColumn("fp", X.fingerprint("text"))
    if d.isStreaming:
        d = d.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["fp"])
    else:
        d = d.dropDuplicates(["fp"])
    return d.filter(X.gopher_keep("text")).select(
        "doc_id",
        "lang",
        "fp",
        X.word_count("text").alias("n_words"),
        X.token_count("text").alias("n_tokens"),
    )


def enriched_nation_counts(
    events: DataFrame,
    customers: DataFrame,
    width: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static enrichment join + windowed rollup (R23): the event
    stream joins the static customer dimension (broadcast into every
    micro-batch — stream-static joins are stateless, no watermark
    needed on the dim side), then aggregates per (window, nation).
    The canonical "enrich the firehose against reference data" shape:
    at 100 TB/day the dim broadcast is per-executor-constant while
    stream state stays bounded by the watermark."""
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), F.col("c_nationkey").alias("nation")
    )
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.join(F.broadcast(dim), "user_id")
        .groupBy(F.window("ts", width).alias("w"), "nation")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(F.col("w.start").alias("window_start"), "nation", "n_events", "value_cents")
    )


def click_purchase_interval_join_outer(
    clicks: DataFrame, purchases: DataFrame, horizon: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """LEFT OUTER stream-stream interval join (R23): like
    ``click_purchase_interval_join``, but clicks with NO purchase in
    the horizon still emit — with null purchase columns — once the
    watermark passes ``click_ts + horizon`` and the engine can prove no
    match can arrive. This is the abandoned-funnel query (clicks that
    never converted) as a STREAM: inner join state bounds identically,
    and the null-side emission is exactly watermark-gated, so clicks
    too close to the stream head stay withheld rather than emitting a
    false "never purchased"."""
    c = clicks.select(
        F.col("user_id"), F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return c.join(p, cond, "left_outer").select(
        "user_id", "click_id", "purchase_id", "click_ts", "purchase_ts"
    )


def chained_windowed_counts(
    events: DataFrame,
    slice_width: str = "10 minutes",
    roll_width: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """CHAINED stateful streaming aggregation (R23, Spark ≥ 3.4 multiple
    stateful operators): 10-minute per-type counts roll up into hourly
    total / peak / slice-count — the downsample-then-rollup cascade
    every metrics pipeline runs (raw firehose → 10-min pre-agg →
    hourly dashboard), expressed as TWO windowed aggregations in ONE
    streaming query instead of an intermediate sink + second job.

    The second aggregation windows over ``window_time(w)`` (the first
    window's event-time column, end − 1 µs), which lets the engine
    thread ONE watermark through both stateful operators: a 10-minute
    slice finalizes when the watermark passes its end, and the hourly
    window finalizes when the watermark passes ITS end — state for
    both stays watermark-bounded. Append output mode is required for
    chained stateful ops, so ONLY FINALIZED hourly windows emit:
    windows whose end exceeds the final watermark (max event time −
    ``watermark``) are withheld, exactly like the outer interval
    join's null-side gate — the batch twin / oracle replicates the
    gate with a max-ts filter.

    ``peak_10min`` (the max slice count) is the rollup a plain
    single-window agg cannot express — it needs the finalized slice
    values as input rows. Batch frames run the identical two-level
    plan (window_time is an ordinary expression) without the gate.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    slices = src.groupBy(F.window("ts", slice_width).alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        slices.groupBy(
            F.window(F.window_time("w"), roll_width).alias("w2"), "event_type"
        )
        .agg(
            F.sum("n").cast("long").alias("total_events"),
            F.max("n").cast("long").alias("peak_10min"),
            F.count(F.lit(1)).cast("long").alias("n_slices"),
        )
        .select(
            F.col("w2.start").alias("window_start"),
            "event_type",
            "total_events",
            "peak_10min",
            "n_slices",
        )
    )


def windowed_value_drift(
    events: DataFrame,
    ref_items: list[tuple[int, int]],
    ref_total: int,
    width: str = "1 hour",
    watermark: str = "2 hours",
    bucket_width: float = 10.0,
) -> DataFrame:
    """Streaming distribution-drift monitor: per tumbling window, the
    exact total-variation distance between the window's bucketed value
    histogram and a STATIC reference histogram (``ref_items`` — e.g.
    last week's known-good distribution; model-sized by contract, it
    rides along as a map literal). The alarm that pages when an
    upstream change shifts the value distribution — the streaming twin
    of ``distribution_drift``'s batch screen, with the same exact
    arithmetic: ``tv_num = Σ_b |n_b·R − r_b·N|`` (+ ``r_b·N`` for
    reference buckets absent from the window, folded as
    ``(R − covered)·N``) — counts in BIGINT, every product and the
    running sum in decimal(38,0) (the ``distribution_drift`` /
    ``ks_statistic`` idiom; the oracle's HUGEINT takes the same
    road), one cast back to BIGINT at ``tv_num``, and ONE IEEE
    division ``tv = tv_num / (2·N·R)``.

    Plan (the ``chained_windowed_counts`` cascade): per-(window,
    bucket) counts are stateful agg #1; agg #2 windows over
    ``window_time`` and collapses each window to ONE row —
    ``collect_list(struct(bucket, n))`` (bounded: ≤ |buckets| entries,
    not rows) plus the window total — so the TV fold is a narrow
    higher-order ``aggregate`` over the collected histogram with the
    reference map, zero further shuffles. Append mode emits only
    finalized windows (end ≤ max event time − watermark); the batch
    oracle replicates the gate. NULL values are excluded (they are the
    quality monitor's business, not a bucket).
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    bucket = F.floor(F.col("value") / F.lit(bucket_width)).cast("long")
    slices = (
        src.filter(F.col("value").isNotNull())
        .groupBy(F.window("ts", width).alias("w"), bucket.alias("__b"))
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    rolled = slices.groupBy(F.window(F.window_time("w"), width).alias("w2")).agg(
        F.collect_list(F.struct(F.col("__b"), F.col("__n"))).alias("__h"),
        F.sum("__n").cast("long").alias("n_events"),
    )
    ref_map = F.create_map(
        *[F.lit(x) for bc in ref_items for x in (int(bc[0]), int(bc[1]))]
    ) if ref_items else F.create_map().cast("map<bigint,bigint>")
    r_total = F.lit(int(ref_total)).cast("long")
    rb = lambda e: F.coalesce(ref_map[e["__b"]], F.lit(0).cast("long"))  # noqa: E731

    def d38(c):
        return c.cast("decimal(38,0)")

    # products and the running sum ride decimal(38,0), matching the
    # batch siblings and the oracle's HUGEINT — a BIGINT·BIGINT
    # product here would silently wrap past 2⁶³ at large
    # window-count × reference-total scales (r10 advisory); the one
    # cast back to BIGINT happens at tv_num, where the docstring's
    # exactness contract applies
    matched = F.aggregate(
        F.col("__h"),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, e: acc
        + F.abs(d38(e["__n"]) * d38(r_total) - d38(rb(e)) * d38(F.col("n_events"))),
    )
    covered = F.aggregate(
        F.col("__h"), F.lit(0).cast("long"), lambda acc, e: acc + rb(e)
    )
    tv_num = (
        matched + d38(r_total - covered) * d38(F.col("n_events"))
    ).cast("long")

    return rolled.select(
        F.col("w2.start").alias("window_start"),
        "n_events",
        tv_num.alias("tv_num"),
        F.when(
            (F.col("n_events") > 0) & (r_total > 0),
            tv_num.cast("double")
            / (F.lit(2).cast("decimal(38,0)") * d38(F.col("n_events")) * d38(r_total)).cast("double"),
        ).alias("tv"),
    )


def stream_pit_enriched_counts(
    events: DataFrame,
    dim: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static POINT-IN-TIME enrichment (R23 × SCD2): each
    micro-batch's events join the dimension VERSION valid at the
    event's own timestamp — ``relational.pit_join``'s residual-on-
    equi-join shape, unchanged, because stream-static inner joins are
    stateless (the dim broadcasts into every micro-batch; no join
    state, no dim-side watermark). This is the streaming form of the
    latest-version-leakage guard: a replayed/late event still picks
    the version that was valid WHEN IT HAPPENED, not today's row.

    Downstream: one stateful aggregate per (segment, version) — state
    bounded by |segments| × |versions per key| regardless of stream
    length. Complete-mode output, run to completion under AvailableNow
    by the face; the batch twin is the oracle."""
    from transe_pyspark_spark.operators.relational import pit_join

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        pit_join(src, dim, "user_id", "c_custkey", "ts", broadcast_dim=True)
        .groupBy("c_mktsegment", "valid_from")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("value_cents"),
        )
    )
