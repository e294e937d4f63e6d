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
    # object store the caller passes a path whose existence it manages
    return os.path.isdir(state_path) and any(
        n.startswith("part-") for n in os.listdir(state_path)
    )


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
