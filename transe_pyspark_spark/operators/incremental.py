"""Incremental corpus dedup across batch "drops" (R18/R19 family —
the 100 TB ingest story the one-shot dedup operators don't cover).

At training-corpus scale new shards land continuously; deduplicating a
shard must NOT rescan every prior shard. The state that makes that
possible is a persisted *seen-fingerprint* table: content fingerprints
of every document ever admitted, stored as parquet. Each arriving drop
then costs exactly (a) one narrow fingerprint pass over the NEW rows,
(b) one within-drop hash-agg, (c) one anti-join of |drop| rows against
the fingerprint table — prior shards' text is never read again.

Scale posture: state rows are a single BIGINT per admitted document
(~8 GB per 10⁹ docs — parquet-compressed far less), the anti-join
hash-partitions on fp (no skew: fingerprints are uniform), and the
per-drop append touches no existing state file. On a warehouse the
state table would be written bucketed by fp so every drop's anti-join
reuses the layout and shuffles only the drop side; plain parquet is
used here so the operator has no catalog dependency.

Reprocessing safety: a drop landed twice admits ZERO documents the
second time (every fp is already state), so at-least-once delivery of
shards cannot double-admit content — the property the exactly-once
``foreachBatch`` streaming recipe (streaming/windows.py) relies on.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transe_pyspark_spark.functions.text import fingerprint

#: column name used for content fingerprints in the state table
FP_COL = "fp"


def _state_exists(spark: SparkSession, state_path: str) -> bool:
    # local/posix path probe — sufficient for file: warehouses; on an
    # object store the caller passes a path whose existence it manages.
    # Walks into partition subdirs (commit=<key>/part-…) as well as the
    # flat layout the batch API appends.
    if not os.path.isdir(state_path):
        return False
    for _root, _dirs, files in os.walk(state_path):
        if any(n.startswith("part-") for n in files):
            return True
    return False


def seen_fingerprints(spark: SparkSession, state_path: str) -> DataFrame:
    """The persisted seen-fingerprint table (empty frame if no drop has
    been admitted yet)."""
    if _state_exists(spark, state_path):
        return spark.read.parquet(state_path).select(FP_COL)
    return spark.createDataFrame([], f"{FP_COL} long")


def dedup_drop(
    spark: SparkSession,
    drop: DataFrame,
    state_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Admit one newly-landed drop against all previously admitted
    content and persist the new fingerprints.

    Within the drop, one row per content fingerprint survives (the
    canonical min-``id_col`` row — same keep rule as ``exact_dedup``);
    rows whose fingerprint was admitted by ANY earlier drop are
    discarded. Survivors are returned with their ``fp`` and their
    fingerprints are appended to the state table — the returned frame
    is materialized (the append is an action), so callers can use it
    without re-running the drop's lineage.
    """
    fp = drop.select(
        F.col(id_col), F.col(text_col), fingerprint(text_col).alias(FP_COL)
    )
    # within-drop canonical keep: min id per fingerprint
    canon = fp.groupBy(FP_COL).agg(F.min(id_col).alias(id_col))
    survivors = fp.join(canon, [FP_COL, id_col], "left_semi")
    # cross-drop dedup: one anti-join against the state table
    fresh = survivors.join(seen_fingerprints(spark, state_path), FP_COL, "left_anti")

    # append the admitted fingerprints; localCheckpoint first so the
    # returned frame and the appended state share one evaluation (the
    # write is the action that materializes it)
    fresh = fresh.localCheckpoint(eager=True)
    fresh.select(FP_COL).write.mode("append").parquet(state_path)
    return fresh


def commit_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_path: str,
    out_path: str,
    key: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One replay-idempotent admission commit: compute the batch's
    admitted set against all state EXCEPT the batch's own ``commit=key``
    partition, then overwrite that partition in the sink first and the
    state second. Calling this any number of times with the same
    (batch, key) — including after a crash that landed only one of the
    two writes — converges both tables to the same contents, which is
    what lets ``stream_dedup_drops`` claim exactly-once admission on
    top of Structured Streaming's at-least-once foreachBatch replay."""
    fp = batch_df.select(
        F.col(id_col), F.col(text_col), fingerprint(text_col).alias(FP_COL)
    )
    canon = fp.groupBy(FP_COL).agg(F.min(id_col).alias(id_col))
    survivors = fp.join(canon, [FP_COL, id_col], "left_semi")
    if _state_exists(spark, state_path):
        prior = (
            spark.read.parquet(state_path)
            .filter(F.col("commit") != key)  # partition-pruned
            .select(FP_COL)
        )
    else:
        prior = spark.createDataFrame([], f"{FP_COL} long")
    fresh = survivors.join(prior, FP_COL, "left_anti").localCheckpoint(eager=True)
    fresh.select(id_col, FP_COL).write.mode("overwrite").parquet(
        f"{out_path}/commit={key}"
    )
    fresh.select(FP_COL).write.mode("overwrite").parquet(f"{state_path}/commit={key}")


def stream_dedup_drops(
    spark: SparkSession,
    source_dir: str,
    state_path: str,
    out_path: str,
    path_glob: str = "documents.parquet",
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_location: str | None = None,
) -> DataFrame:
    """Streaming face of the incremental dedup: a continuously-landing
    drop directory consumed as a file stream, each micro-batch admitted
    against the persisted seen-fingerprint state inside ``foreachBatch``,
    admitted rows landed in a parquet sink. Returns the sink contents
    after an AvailableNow run.

    Exactly-once story (sink AND state): each batch commits to
    deterministic ``commit=<key>`` partitions of both tables, where the
    key hashes (checkpoint, batch_id) — the pair Structured Streaming
    guarantees maps to the same input rows on replay. The admission
    anti-join reads the state EXCLUDING the batch's own partition, so a
    replayed batch recomputes the identical admitted set regardless of
    how far the failed attempt got, then OVERWRITES its two partitions
    (sink first, then state — a crash between them re-lands the same
    rows on replay instead of losing them). Admitted rows therefore
    reach the sink exactly once however many times the batch runs, and
    a crash after the state write but before the sink write cannot
    silently drop documents — the failure mode of the naive
    append-state-then-append-sink ordering. ``checkpoint_location``
    defaults to ``state_path + "_ckpt"`` so a restarted caller actually
    resumes (committed batches skip); pass a fresh path to force a full
    re-read, which admits nothing because the state already holds every
    fingerprint. The streaming state layout is partitioned by commit
    key — give the streaming face its own ``state_path``, not one the
    flat-append batch ``dedup_drop`` writes to. Long-running ingests
    accumulate one partition per batch; compact offline by rewriting
    the state table (fps are a plain column — layout is not semantic).
    """
    import hashlib
    import uuid

    from transe_pyspark_spark.streaming.windows import documents_schema

    stream = (
        spark.readStream.schema(documents_schema(spark, source_dir))
        .format("parquet")
        .option("pathGlobFilter", path_glob)
        .load(source_dir)
    )
    ckpt = checkpoint_location or (state_path.rstrip("/") + "_ckpt")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        key = hashlib.sha1(f"{ckpt}|{batch_id}".encode()).hexdigest()[:16]
        commit_batch(spark, batch_df, state_path, out_path, key, id_col, text_col)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .queryName(f"incdedup_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if _state_exists(spark, out_path):
        return spark.read.parquet(out_path).select(id_col, FP_COL)
    return spark.createDataFrame([], f"{id_col} long, {FP_COL} long")


def neardedup_drop(
    spark: SparkSession,
    drop: DataFrame,
    state_path: str,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental NEAR-dedup across drops: admit one newly-landed drop,
    rejecting documents that are near-duplicates (estimated Jaccard ≥
    ``threshold``) of anything previously admitted — or of an
    earlier-id document within the same drop — using MinHash-LSH state.

    State is one parquet row per admitted document: ``(id, signature)``
    — ``num_hashes`` longs however long the document is, so the state
    table stays a fixed-width sketch of the whole corpus (a 10⁹-doc
    corpus at 64 hashes is ~0.5 TB — scannable; the documents
    themselves are never re-read). Per drop: signatures are one narrow
    Arrow pass over the NEW rows; candidate pairs come from joining the
    drop's band-bucket keys against the state's (re-derived from stored
    signatures by the same ``band_keys`` expression — a shuffle on
    bucket keys only, never all-pairs); candidates are confirmed by
    SIGNATURE AGREEMENT (the fraction of equal minhash components is an
    unbiased estimator of Jaccard — exact shingle verification would
    require re-reading prior drops' text, which is exactly what this
    operator exists to avoid). Exact duplicates agree on every
    component, so they are always rejected at any threshold ≤ 1 —
    relanding a shard admits nothing.

    Returns the admitted rows (id, signature); their signatures are
    appended to the state. Docs shorter than ``shingle_n`` words have
    no signature and are dropped (same rule as ``minhash_lsh_pairs``).
    """
    from transe_pyspark_spark.operators.dedup import band_keys, minhash_signatures_arrow

    rows_per_band = num_hashes // bands
    sigs = minhash_signatures_arrow(
        drop, text_col, id_col, num_hashes, shingle_n, seed
    ).localCheckpoint()

    agree = lambda a, b: (
        F.size(F.filter(F.zip_with(a, b, lambda x, y: x == y), lambda eq: eq))
        / F.lit(float(num_hashes))
    )

    # within-drop: reject any doc whose band collides with an
    # EARLIER-id doc of this drop that estimates ≥ threshold (keep
    # first seen — the same canonical rule as the exact path)
    new_bands = band_keys(sigs, bands, rows_per_band, id_col)
    a, b = new_bands.alias("a"), new_bands.alias("b")
    intra = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("__keep"), F.col(f"b.{id_col}").alias("__cand")
        )
        .distinct()
        .join(sigs.select(F.col(id_col).alias("__keep"), F.col("signature").alias("__sa")), "__keep")
        .join(sigs.select(F.col(id_col).alias("__cand"), F.col("signature").alias("__sb")), "__cand")
        .filter(agree(F.col("__sa"), F.col("__sb")) >= threshold)
        .select(F.col("__cand").alias(id_col))
        .distinct()
    )
    kept = sigs.join(intra, id_col, "left_anti")

    # cross-drop: band-join against the persisted signatures
    if _state_exists(spark, state_path + "_sigs"):
        state = spark.read.parquet(state_path + "_sigs")
        state_bands = band_keys(state, bands, rows_per_band, id_col).select(
            F.col(id_col).alias("__old"), "band", "bucket"
        )
        cand = (
            band_keys(kept, bands, rows_per_band, id_col)
            .join(state_bands, ["band", "bucket"])
            .select(id_col, "__old")
            .distinct()
            .join(kept.select(F.col(id_col), F.col("signature").alias("__sb")), id_col)
            .join(state.select(F.col(id_col).alias("__old"), F.col("signature").alias("__sa")), "__old")
            .filter(agree(F.col("__sa"), F.col("__sb")) >= threshold)
            .select(id_col)
            .distinct()
        )
        kept = kept.join(cand, id_col, "left_anti")

    kept = kept.localCheckpoint(eager=True)
    kept.write.mode("append").parquet(state_path + "_sigs")
    return kept


# ---------------------------------------------------------------------------
# streaming incremental view maintenance
# ---------------------------------------------------------------------------


def _ivm_gen_dir(state_path: str, gen: int) -> str:
    return os.path.join(state_path, f"gen={gen}")


def _ivm_latest_gen(state_path: str, before: int | None = None) -> int | None:
    """Largest COMMITTED summary generation (< ``before`` if given).
    A generation counts only once its parquet ``_SUCCESS`` marker
    exists, so a crash mid-write leaves a dir that replay ignores and
    overwrites. Local/posix probe, the module's standing convention."""
    import re

    if not os.path.isdir(state_path):
        return None
    gens = [
        int(m.group(1))
        for d in os.listdir(state_path)
        for m in [re.fullmatch(r"gen=(-?\d+)", d)]
        if m
        and os.path.exists(os.path.join(state_path, d, "_SUCCESS"))
        and (before is None or int(m.group(1)) < before)
    ]
    return max(gens) if gens else None


def apply_ivm_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    group_col: str,
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> None:
    """Apply ONE change micro-batch to the versioned summary state —
    the ``foreachBatch`` body of ``stream_ivm_summary``, exposed so
    replay idempotency is directly testable. Generation ``batch_id``
    is recomputed from the newest generation BELOW it and overwritten
    in place: Structured Streaming replays a failed batch under the
    same batch_id with the same rows, the parent generation is never
    touched, so however many times the batch runs the committed
    ``gen=<batch_id>`` is identical — exactly-once maintenance on top
    of at-least-once replay, the ``commit_batch`` recipe transposed
    from append-only state to versioned state."""
    from transe_pyspark_spark.operators.relational import maintain_group_summary

    prev = _ivm_latest_gen(state_path, before=batch_id)
    if prev is None:
        raise RuntimeError(
            f"no committed base summary below gen={batch_id} in {state_path} "
            "(stream_ivm_summary seeds gen=-1 before starting the query)"
        )
    summary = spark.read.parquet(_ivm_gen_dir(state_path, prev))
    nxt = maintain_group_summary(summary, batch_df, group_col, sum_cols, count_col)
    nxt.write.mode("overwrite").parquet(_ivm_gen_dir(state_path, batch_id))


def stream_ivm_summary(
    spark: SparkSession,
    changes_dir: str,
    state_path: str,
    group_col: str,
    sum_cols: list[str],
    count_col: str = "n_rows",
    initial_summary: DataFrame | None = None,
    path_glob: str = "*.parquet",
    max_files_per_trigger: int = 1,
    checkpoint_location: str | None = None,
) -> DataFrame:
    """Continuously-maintained grouped count/sum rollup: before-image
    change batches (``snapshot_changeset_images`` format) land as
    parquet files, are consumed as a file stream, and each micro-batch
    delta-refreshes the persisted summary inside ``foreachBatch`` —
    the forever-running materialized-view maintainer. The base fact
    table is NEVER read: every refresh costs one |batch|-sized delta
    aggregate plus one key join against the current summary
    generation (``maintain_group_summary``'s contract).

    State is a chain of versioned generations ``gen=<batch_id>``
    (seeded with ``initial_summary`` — or an empty rollup — at
    ``gen=-1``); each batch recomputes its generation from the newest
    committed one below its id and overwrites in place, so replays
    are idempotent (see ``apply_ivm_batch``). Old generations double
    as a time-travel audit trail; long-running maintainers prune
    them offline. Returns the newest committed summary after an
    AvailableNow run drains the directory.
    """
    import uuid

    static = spark.read.option("pathGlobFilter", path_glob).parquet(changes_dir)
    if initial_summary is None:
        initial_summary = (
            static.select(
                F.col(f"before_{group_col}").alias(group_col),
                F.lit(0).cast("long").alias(count_col),
                *[F.lit(0).cast("long").alias(f"sum_{c}") for c in sum_cols],
            )
            .filter(F.lit(False))
        )
    initial_summary.write.mode("overwrite").parquet(_ivm_gen_dir(state_path, -1))

    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", path_glob)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .format("parquet")
        .load(changes_dir)
    )
    ckpt = checkpoint_location or (state_path.rstrip("/") + "_ckpt")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        apply_ivm_batch(
            spark, batch_df, batch_id, state_path, group_col, sum_cols, count_col
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .queryName(f"ivm_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    latest = _ivm_latest_gen(state_path)
    return spark.read.parquet(_ivm_gen_dir(state_path, latest))
