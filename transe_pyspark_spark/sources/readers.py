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

    The rewrite is staged through ``<path>/__compact_tmp`` and swapped
    in with two renames, so a crash mid-rewrite leaves either the old
    or the new layout, never a mix. (On a real object store the swap
    would be a catalog/manifest pointer flip — Iceberg/Delta commit
    semantics — which this local-FS layout stands in for.)

    Returns {"files_before", "files_after", "bytes"} for the caller's
    audit log.
    """
    import math
    import shutil

    def _parts(p: str) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(p):
            out += [os.path.join(root, f) for f in files if f.startswith("part-")]
        return out

    before = _parts(path)
    if not before:
        raise ValueError(f"no parquet part files under {path}")
    total = sum(os.path.getsize(f) for f in before)
    n_out = max(min_files, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = os.path.join(path, "__compact_tmp")
    # round-robin repartition: balanced output files regardless of the
    # input layout; no column skew can starve a writer task
    df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    # swap: move the new part files up, drop the old ones
    for f in before:
        os.remove(f)
    for f in _parts(tmp):
        shutil.move(f, os.path.join(path, os.path.basename(f)))
    # _SUCCESS markers and the tmp dir are bookkeeping only
    success = os.path.join(tmp, "_SUCCESS")
    if os.path.exists(success):
        shutil.move(success, os.path.join(path, "_SUCCESS"))
    shutil.rmtree(tmp, ignore_errors=True)
    return {"files_before": len(before), "files_after": n_out, "bytes": total}
