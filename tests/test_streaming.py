"""Streaming twin tests (SURVEY §5.5): every streaming query under
Trigger.AvailableNow must equal its batch twin on the same events."""

from __future__ import annotations

from pyspark.sql import functions as F

from transe_pyspark_spark.sources.readers import load_table
from transe_pyspark_spark.streaming.windows import (
    dedup_within_watermark,
    read_events_stream,
    run_available_now,
    session_counts,
    sliding_counts,
    tumbling_counts,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_twin(spark, sf_dir):
    batch = tumbling_counts(load_table(spark, sf_dir, "events"))
    stream = run_available_now(tumbling_counts(read_events_stream(spark, sf_dir)), spark)
    cols = ["window_start", "event_type", "n_events", "value_cents"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_sliding_twin(spark, sf_dir):
    batch = sliding_counts(load_table(spark, sf_dir, "events"))
    stream = run_available_now(sliding_counts(read_events_stream(spark, sf_dir)), spark)
    cols = ["window_start", "event_type", "n_events"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_session_twin(spark, sf_dir):
    batch = session_counts(load_table(spark, sf_dir, "events"))
    stream = run_available_now(session_counts(read_events_stream(spark, sf_dir)), spark)
    cols = ["session_start", "session_end", "user_id", "n_events"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stateful_profiles_twin(spark, sf_dir):
    """applyInPandasWithState running profile == batch aggregation."""
    from transe_pyspark_spark.streaming.stateful import (
        run_stateful_to_completion,
        user_profiles_batch,
    )

    batch = user_profiles_batch(load_table(spark, sf_dir, "events"))
    stream = run_stateful_to_completion(spark, sf_dir)
    cols = ["user_id", "n_events", "value_cents", "last_ts"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_streaming_dedup_twin(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    batch_n = dedup_within_watermark(ev).count()
    stream = run_available_now(
        dedup_within_watermark(read_events_stream(spark, sf_dir)), spark, output_mode="append"
    )
    assert stream.count() == batch_n == ev.select("event_id").distinct().count()
