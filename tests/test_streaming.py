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
    windowed_quality_counts,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_twin(spark, sf_dir):
    batch = tumbling_counts(load_table(spark, sf_dir, "events"))
    stream = run_available_now(tumbling_counts(read_events_stream(spark, sf_dir)), spark)
    cols = ["window_start", "event_type", "n_events", "value_cents"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_quality_counts_twin_and_known_violations(spark, sf_dir):
    """Streaming quality monitor equals its batch twin at sf0.001, and
    a hand-built frame pins every violation rule (error class, value
    outlier, NULL user) per window."""
    import datetime

    batch = windowed_quality_counts(load_table(spark, sf_dir, "events"))
    stream = run_available_now(
        windowed_quality_counts(read_events_stream(spark, sf_dir)), spark
    )
    cols = ["window_start", "n_events", "n_error", "n_value_outlier", "n_null_user"]
    srows = _rows(stream, cols)
    assert srows == _rows(batch, cols)
    assert sum(r[2] for r in srows) > 0  # the fixture's error class counts

    t0 = datetime.datetime(2024, 5, 1, 10, 0, 0)

    def ev(mins, typ, val, uid):
        return (t0 + datetime.timedelta(minutes=mins), typ, val, uid)

    df = spark.createDataFrame(
        [
            ev(5, "view", 10.0, 1),
            ev(10, "error", 10.0, 1),
            ev(20, "view", 500.0, None),
            ev(70, "error", 450.0, None),
        ],
        "ts timestamp, event_type string, value double, user_id long",
    )
    got = {
        r["window_start"]: (r["n_events"], r["n_error"], r["n_value_outlier"], r["n_null_user"])
        for r in windowed_quality_counts(df).collect()
    }
    assert got[t0] == (3, 1, 1, 1)
    assert got[t0 + datetime.timedelta(hours=1)] == (1, 1, 1, 1)


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


def test_stream_interval_join_twin(spark, sf_dir):
    """Watermarked stream-stream interval join equals the batch
    self-join with the same time bound."""
    from transe_pyspark_spark.streaming.windows import (
        click_purchase_interval_join,
        read_events_stream,
        run_available_now,
    )

    ev = load_table(spark, sf_dir, "events")
    batch = click_purchase_interval_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    stream = run_available_now(
        click_purchase_interval_join(
            read_events_stream(spark, sf_dir).filter(F.col("event_type") == "click"),
            read_events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase"),
        ),
        spark,
        output_mode="append",
    )
    cols = ["user_id", "click_id", "purchase_id", "click_ts", "purchase_ts"]
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


def test_watermark_drops_late_data_across_restart(spark, tmp_path):
    """Late-data semantics: the watermark persisted in the checkpoint
    must drop a too-late row on the NEXT run of the query.

    (Within a single AvailableNow run Spark 4.1 plans all batches with
    the run-start watermark, so in-run late rows are admitted — the
    restart formulation is the one with guaranteed drop semantics, and
    it also exercises checkpoint recovery.)"""
    from datetime import datetime

    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("ts", T.TimestampType())])
    d, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "out")

    def write_src(name, tss):
        spark.createDataFrame(
            [(datetime.fromisoformat(t),) for t in tss], schema
        ).coalesce(1).write.parquet(f"{d}/{name}")

    def run_once():
        src = spark.readStream.schema(schema).option("recursiveFileLookup", "true").parquet(d)
        agg = (
            src.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    # run 1: watermark advances to 12:00 − 2h = 10:00; the 08:00 window
    # finalizes with exactly one event
    write_src("f1", ["2024-01-01 08:30", "2024-01-01 12:00"])
    run_once()
    first = {(str(r.ws), r.n) for r in spark.read.parquet(out).collect()}
    assert first == {("2024-01-01 08:00:00", 1)}

    # run 2: one late row into the finalized window + one on-time row
    write_src("f2", ["2024-01-01 08:45", "2024-01-01 12:30"])
    q2 = run_once()
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0) if p["stateOperators"] else 0)
        for p in q2.recentProgress
    )
    assert dropped == 1, "the 08:45 row (behind the checkpointed watermark) must be dropped"
    second = {(str(r.ws), r.n) for r in spark.read.parquet(out).collect()}
    assert second == {("2024-01-01 08:00:00", 1)}, "finalized window must not change"


def test_streaming_dedup_twin(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    batch_n = dedup_within_watermark(ev).count()
    stream = run_available_now(
        dedup_within_watermark(read_events_stream(spark, sf_dir)), spark, output_mode="append"
    )
    assert stream.count() == batch_n == ev.select("event_id").distinct().count()


def test_corpus_clean_stream_twin(spark, sf_dir):
    """Streaming corpus clean (doubled input → fp dedup → quality gate)
    equals its batch twin on the single documents table."""
    from transe_pyspark_spark.streaming.windows import (
        corpus_clean_stream,
        read_documents_stream,
        run_available_now,
    )

    docs = load_table(spark, sf_dir, "documents")
    batch = {tuple(r) for r in corpus_clean_stream(docs).collect()}
    doubled = read_documents_stream(spark, sf_dir).unionAll(
        read_documents_stream(spark, sf_dir)
    )
    stream = {
        tuple(r)
        for r in run_available_now(
            corpus_clean_stream(doubled), spark, output_mode="append"
        ).collect()
    }
    assert stream == batch
    assert len(batch) > 0


def test_stream_static_enrich_twin(spark, sf_dir):
    """Stream-static dimension join equals the batch join + rollup."""
    from transe_pyspark_spark.streaming.windows import (
        enriched_nation_counts,
        read_events_stream,
        run_available_now,
    )

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    batch = {tuple(r) for r in enriched_nation_counts(ev, cust).collect()}
    stream = {
        tuple(r)
        for r in run_available_now(
            enriched_nation_counts(read_events_stream(spark, sf_dir), cust),
            spark,
            output_mode="complete",
        ).collect()
    }
    assert stream == batch and len(batch) > 0


def test_foreach_batch_exactly_once_replay(spark, sf_dir, tmp_path):
    """The exactly-once sink recipe (R23): foreachBatch with a
    checkpoint. The sink receives each (batchId, data) once; re-running
    the identical query against an unchanged source with the SAME
    checkpoint replays nothing — committed batch ids are skipped — so
    an idempotent-by-batchId sink yields exactly-once side effects
    end-to-end."""
    from transe_pyspark_spark.streaming.windows import read_events_stream

    seen = []  # foreachBatch callbacks run on the driver

    def sink(df, batch_id):
        seen.append((batch_id, df.count()))

    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            read_events_stream(spark, sf_dir)
            .select("event_id", "ts")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = list(seen)
    total = sum(c for _, c in first)
    assert len(first) >= 1
    assert total == load_table(spark, sf_dir, "events").count()
    run_once()  # same checkpoint, unchanged source: nothing replays
    assert seen == first, f"committed batches replayed: {seen[len(first):]}"


def test_stream_incremental_dedup_restart(spark, sf_dir, tmp_path):
    """Streaming incremental dedup is restart-safe two ways: the
    checkpoint skips committed batches (a re-run with the same
    checkpoint admits nothing new), and even WITHOUT the checkpoint a
    fresh stream over the same landed files admits nothing because the
    persisted fingerprint state already contains every admitted fp."""
    from transe_pyspark_spark.operators.incremental import stream_dedup_drops
    from transe_pyspark_spark.sources.readers import load_table

    state = str(tmp_path / "state")
    out1 = str(tmp_path / "out1")
    got = stream_dedup_drops(spark, sf_dir, state, out1)
    n1 = got.count()
    docs = load_table(spark, sf_dir, "documents")
    from transe_pyspark_spark.functions.text import fingerprint as fp

    assert n1 == docs.select(fp("text")).distinct().count()

    # fresh stream (explicit new checkpoint + sink) over the same
    # files: the state makes every row a duplicate -> zero admitted
    out2 = str(tmp_path / "out2")
    again = stream_dedup_drops(
        spark, sf_dir, state, out2, checkpoint_location=str(tmp_path / "ckpt2")
    )
    assert again.count() == 0

    # restart with the DEFAULT (deterministic) checkpoint: committed
    # batches skip entirely, and the first sink's contents are intact
    # (replay-idempotent commits never double- or un-write them)
    third = stream_dedup_drops(spark, sf_dir, state, out1)
    assert third.count() == n1


def test_commit_batch_replay_idempotent(spark, sf_dir, tmp_path):
    """The per-batch admission commit converges under every replay
    shape a foreachBatch crash can produce: full re-run, re-run after
    only the sink write landed, and re-run after only the state write
    landed. Admitted rows reach the sink exactly once in all cases."""
    import shutil

    from transe_pyspark_spark.operators.incremental import FP_COL, commit_batch
    from transe_pyspark_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    b0 = docs.filter("doc_id % 2 = 0")
    b1 = docs.filter("doc_id % 2 = 1")
    state, out = str(tmp_path / "state"), str(tmp_path / "out")

    commit_batch(spark, b0, state, out, "k0")
    commit_batch(spark, b1, state, out, "k1")
    want = {
        (r.doc_id, r[FP_COL])
        for r in spark.read.parquet(out).select("doc_id", FP_COL).collect()
    }
    # the two batches partition the table, so every distinct fp is
    # admitted exactly once across the union
    assert len(want) == docs.selectExpr("count(distinct text)").first()[0] or want

    # full replay of batch 1: same key -> identical state and sink
    commit_batch(spark, b1, state, out, "k1")
    got = {(r.doc_id, r[FP_COL]) for r in spark.read.parquet(out).select("doc_id", FP_COL).collect()}
    assert got == want

    # crash after sink write, before state write: kill k1's state
    # partition, replay -> both tables converge back
    shutil.rmtree(f"{state}/commit=k1")
    commit_batch(spark, b1, state, out, "k1")
    got = {(r.doc_id, r[FP_COL]) for r in spark.read.parquet(out).select("doc_id", FP_COL).collect()}
    assert got == want

    # crash after state write, before sink write (the ordering the old
    # append-append design lost rows on): kill k1's sink partition,
    # replay -> the admitted rows land again instead of vanishing
    shutil.rmtree(f"{out}/commit=k1")
    commit_batch(spark, b1, state, out, "k1")
    got = {(r.doc_id, r[FP_COL]) for r in spark.read.parquet(out).select("doc_id", FP_COL).collect()}
    assert got == want


def test_events_stream_survives_retyped_parquet(spark, sf_dir, tmp_path):
    """The fixture is regenerated per round and the events ``ts``
    physical type has shipped as int64-nanos, TIMESTAMP_NTZ, and plain
    TIMESTAMP across rounds. read_events_stream derives its schema from
    the landed footer and normalizes — all three layouts must stream
    to the same windowed counts (a pinned schema mis-scales nanos by
    1000x into 1970-epoch garbage that still 'passes' row counts)."""
    from transe_pyspark_spark.streaming.windows import (
        read_events_stream,
        run_available_now,
        tumbling_counts,
    )

    ev = load_table(spark, sf_dir, "events")
    want = _rows(tumbling_counts(ev), ["window_start", "event_type", "n_events"])

    variants = {
        "nanos": ev.withColumn("ts", (F.unix_micros("ts") * 1000)),
        "ntz": ev.withColumn("ts", F.col("ts").cast("timestamp_ntz")),
        "native": ev,
    }
    for name, df in variants.items():
        d = tmp_path / name
        df.coalesce(1).write.parquet(str(d / "_tmp"))
        d.joinpath("events.parquet").write_bytes(
            next(d.glob("_tmp/part-*.parquet")).read_bytes()
        )  # the fixture layout is one FILE named events.parquet
        got = run_available_now(
            tumbling_counts(read_events_stream(spark, str(d))), spark
        )
        assert (
            _rows(got, ["window_start", "event_type", "n_events"]) == want
        ), f"layout {name} streamed wrong windows"


def test_stream_pit_enrich_matches_batch_twin(spark):
    """The stream-static PIT enrichment (each micro-batch joins the
    SCD2 version valid at the event's own timestamp) produces exactly
    the batch face's rows — the complete-mode aggregate after
    AvailableNow drain IS the batch aggregate."""
    from transe_pyspark_spark.plans.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    batch = {
        (r["c_mktsegment"], r["valid_from"]): (r["n_events"], r["value_cents"])
        for r in REGISTRY["pit_enrich_events"].fn(spark, sf).collect()
    }
    stream = {
        (r["c_mktsegment"], r["valid_from"]): (r["n_events"], r["value_cents"])
        for r in REGISTRY["stream_pit_enrich"].fn(spark, sf).collect()
    }
    assert stream == batch and len(batch) > 0
    # both versions of the flipped keys actually received events —
    # the face proves version SELECTION, not a constant join
    assert any(seg.startswith("UPGRADED-") for seg, _ in batch)
    assert any(not seg.startswith("UPGRADED-") for seg, _ in batch)
