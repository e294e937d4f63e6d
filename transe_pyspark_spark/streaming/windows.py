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

#: events.ts is TIMESTAMP(NANOS) in parquet → int64 under
#: spark.sql.legacy.parquet.nanosAsLong; converted to µs below.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch under AvailableNow)."""
    from transe_pyspark_spark.sources.readers import ensure_session_conf

    ensure_session_conf(spark)
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


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
