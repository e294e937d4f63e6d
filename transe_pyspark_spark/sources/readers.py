"""Sources & sinks (SURVEY §2B R1/R2).

Replaces the reference's schemaless ``sc.textFile`` + three-pass tuple
splitting (reference ``TransEmodule/utils.py:5-10``) with schema-ful,
splittable, pushdown-capable readers. Explicit schemas everywhere: no
``inferSchema`` (which costs an extra full scan and is nondeterministic
on dirty data).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Schema of a raw knowledge-graph triples file: three tab-separated
#: string columns, no header (reference ``utils.py:6``, ``README.md:86-87``).
TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("head", T.StringType(), nullable=False),
        T.StructField("label", T.StringType(), nullable=False),
        T.StructField("tail", T.StringType(), nullable=False),
    ]
)


def ensure_session_conf(spark: SparkSession) -> None:
    """Defensively apply the runtime-settable confs our plans depend on.

    The harness may hand us a SparkSession it built itself (without
    ``session.get_spark``); without these, every scan of the events
    table fails outright (its parquet type is TIMESTAMP(NANOS), which
    Spark rejects unless read as int64) and timestamps collect in a
    local zone instead of the oracle's UTC. Both are runtime-settable
    session confs; setting them repeatedly is a no-op.
    """
    for key, value in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # conf not recognized/settable on this build — proceed


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided fixture table (TESTDATA.md).

    ``events.ts`` has shipped in two physical layouts across fixture
    generations: TIMESTAMP(NANOS) (int64 under
    ``spark.sql.legacy.parquet.nanosAsLong`` — converted to µs here;
    the values are µs-precision so ``div 1000`` is lossless) and plain
    TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ — cast to TIMESTAMP so
    watermarks/windows accept it; session tz is UTC so the instant is
    unchanged). Normalizing here keeps every downstream plan and the
    streaming twin on one ts type.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ensure_session_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql``."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_triples_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Scan a triples TSV (R1).

    One CSV scan with an explicit schema replaces the reference's
    ``textFile`` → ``split('\\t')`` → three per-column ``map`` passes
    (``utils.py:6-10``): Catalyst prunes columns at the scan, so a
    downstream ``select('head')`` never materializes the other two.
    """
    return spark.read.csv(path, sep="\t", schema=TRIPLES_SCHEMA, header=False)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines scan with explicit schema (R1)."""
    return spark.read.json(path, schema=schema)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table (R2 + scale posture): co-locates rows by
    hash(bucket_cols) at WRITE time, so a later join or aggregation on
    those columns needs NO exchange — the shuffle is paid once instead
    of per query. ``sort_cols`` additionally pre-sorts within buckets
    (sort-merge join without the sort). See
    ``test_bucketed_join_no_shuffle`` for the plan-level proof.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """Parquet sink (R2) — replaces the reference's driver-side pickle
    checkpoints (``utils.py:44-49``). ``partition_by`` enables partition
    pruning for downstream readers at scale.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", sep: str = "\t", header: bool = False) -> None:
    """CSV/TSV sink (R2) — the interchange format the reference's
    datasets arrive in (``README.md:86-87``)."""
    df.write.mode(mode).options(sep=sep, header=header).csv(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """ORC sink (R2) — the other columnar warehouse format Spark ships
    natively; same pushdown/pruning story as parquet."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (R1): schema from file footers, predicate pushdown and
    column pruning exactly as with parquet."""
    return spark.read.orc(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 1,
) -> dict[str, int]:
    """Small-files compaction (R2 maintenance): rewrite a parquet
    directory into ``max(min_files, ceil(bytes/target))`` files — the
    nightly warehouse job that keeps streaming/micro-batch sinks (one
    file per trigger per partition) from degrading every later scan
    into a metadata storm. At 100 TB the same plan holds: one read +
    one round-robin repartition + one write, all distributed; nothing
    driver-sized but the file listing.

    The rewrite is staged through ``<path>/__compact_tmp`` and
    committed with a manifest: the new files are moved up FIRST, old
    files are removed only after every new file is in place, and the
    manifest (written after the staging write completes, deleted last)
    lets the next run finish or undo an interrupted swap. A crash at
    any point therefore leaves either the old layout intact (staging
    incomplete → rolled back) or a completable new layout (manifest
    present → rolled forward) — never an empty directory. The one
    non-atomic window is between the last move and the last delete,
    where a concurrent reader can see both layouts (duplicates); the
    next call heals it. (On a real
    object store the swap would be a catalog/manifest pointer flip —
    Iceberg/Delta commit semantics — which this local-FS layout stands
    in for.)

    Returns {"files_before", "files_after", "bytes"} for the caller's
    audit log.
    """
    import json
    import math
    import shutil
    import uuid

    tmp = os.path.join(path, "__compact_tmp")
    manifest_path = os.path.join(tmp, "__compact_manifest.json")

    def _parts(p: str) -> list[str]:
        # staged files under __compact_tmp are not live data — a stale
        # tmp dir from a crashed run must never count as input
        out = []
        for root, _dirs, files in os.walk(p):
            if os.path.basename(root) == "__compact_tmp" or root.startswith(tmp):
                continue
            out += [os.path.join(root, f) for f in files if f.startswith("part-")]
        return out

    # recover from a previously interrupted compaction before reading
    # anything: a manifest means the staging write finished, so roll
    # the swap FORWARD (finish moves, then deletes); no manifest means
    # the staging write itself died, so roll BACK (old layout is
    # untouched — just drop the partial tmp dir).
    if os.path.isdir(tmp):
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                m = json.load(f)
            for name in m["new"]:
                staged = os.path.join(tmp, name)
                if os.path.exists(staged):  # same-FS rename is atomic:
                    os.replace(staged, os.path.join(path, name))
            for old in m["old"]:
                if os.path.exists(old):
                    os.remove(old)
        shutil.rmtree(tmp, ignore_errors=True)

    before = _parts(path)
    if not before:
        raise ValueError(f"no parquet part files under {path}")
    total = sum(os.path.getsize(f) for f in before)
    n_out = max(min_files, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    # round-robin repartition: balanced output files regardless of the
    # input layout; no column skew can starve a writer task
    df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    # rename staged files to run-unique names so they can never
    # collide with a live part file when moved up
    run_id = uuid.uuid4().hex[:12]
    new_names = []
    for i, f in enumerate(sorted(_parts_under(tmp))):
        name = f"part-{i:05d}-compact-{run_id}.parquet"
        os.replace(f, os.path.join(tmp, name))
        new_names.append(name)
    with open(manifest_path, "w") as f:
        json.dump({"old": before, "new": new_names}, f)
    # commit: new files up first (old data stays visible until every
    # new file is in place), old files removed after, manifest last
    for name in new_names:
        os.replace(os.path.join(tmp, name), os.path.join(path, name))
    for f in before:
        os.remove(f)
    shutil.rmtree(tmp, ignore_errors=True)
    return {"files_before": len(before), "files_after": n_out, "bytes": total}


def _parts_under(p: str) -> list[str]:
    """part-* files directly under ``p`` (one os.walk level tree)."""
    out = []
    for root, _dirs, files in os.walk(p):
        out += [os.path.join(root, f) for f in files if f.startswith("part-")]
    return out
