"""Materialize an sf1-scale fixture (~6M-row lineitem, 10× sf0.1) for
the scale-proof bench section (VERDICT r04 ask #6).

The driver's testdata stops at sf0.1; "survives 100×" claims need at
least a measured 10× point. This builds one by replicating the sf0.1
tables 10× with disjoint key spaces — distributions, selectivities,
and join fan-outs stay exactly those of the driver's generator, only
cardinality grows:

* fact/dim keys get a per-replica offset (orderkeys, custkeys,
  doc_ids, event/user ids), so joins fan out 10× without creating
  cross-replica matches that would change per-row join selectivity;
* ``documents`` text gets a replica-tagged token spliced in every 5
  words (replica 0 is byte-identical to sf0.1), which breaks ~60% of
  word 3-grams between copies of the same doc — cross-replica Jaccard
  lands ≈0.3-0.4, below the 0.6 near-dup threshold, so the near-pair
  workload scales ~10× like a real corpus instead of exploding
  quadratically in exact copies;
* ``events`` keeps the same time range with 10× users, so windowed
  streaming aggregates see 10× rows per window.

Output is cached at $SPARK_GRAFT_SF1_DIR (default
/tmp/spark_graft_sf1) behind a _DONE marker; generation is pure Spark
(one narrow crossJoin per table) and runs once per machine.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPLICAS = 10
#: key offsets: far above any sf0.1 key, so replica key spaces are disjoint
ORDERKEY_OFF = 10_000_000
CUSTKEY_OFF = 1_000_000
DOCID_OFF = 1_000_000
EVENTID_OFF = 10_000_000
USERID_OFF = 1_000_000
PARTKEY_OFF = 1_000_000

SF1_TABLES = ("lineitem", "orders", "customer", "nation", "region", "documents", "events", "part", "supplier", "embeddings")

#: bump when the replication logic or its parameters change — the
#: cached fixture regenerates on mismatch, so sf1 numbers and plan
#: gates always reflect the CURRENT generator (a bare _DONE marker
#: silently served stale fixtures across code versions)
GENERATOR_VERSION = f"v6|replicas={REPLICAS}|offs={ORDERKEY_OFF},{CUSTKEY_OFF},{DOCID_OFF},{EVENTID_OFF},{USERID_OFF},{PARTKEY_OFF}"


def sf1_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")


def _replicate(df: DataFrame, offsets: dict[str, int]) -> DataFrame:
    """Union ``REPLICAS`` copies with per-replica key offsets, one
    narrow crossJoin (replica table is 10 literal rows, broadcast)."""
    rep = F.explode(F.array(*[F.lit(i) for i in range(REPLICAS)])).alias("__rep")
    out = df.select("*", rep)
    for col, off in offsets.items():
        out = out.withColumn(col, F.col(col) + F.col("__rep") * F.lit(off))
    return out.drop("__rep")


def _replicate_documents(df: DataFrame) -> DataFrame:
    """Replicate docs with perturbed text: splice token ``zz<rep>q<j>``
    after every 5th word (replica 0 untouched). Word-level splice via
    higher-order functions — generation is one-time, clarity wins."""
    rep = F.explode(F.array(*[F.lit(i) for i in range(REPLICAS)])).alias("__rep")
    out = df.select("*", rep).withColumn("doc_id", F.col("doc_id") + F.col("__rep") * F.lit(DOCID_OFF))
    words = F.split(F.col("text"), " ")
    tagged = F.array_join(
        F.zip_with(
            words,
            F.sequence(F.lit(0), F.size(words) - 1),
            lambda w, i: F.when(
                (F.col("__rep") > 0) & (i % 5 == 4),
                F.concat(w, F.lit(" zz"), F.col("__rep").cast("string"), F.lit("q"), (i / 5).cast("int").cast("string")),
            ).otherwise(w),
        ),
        " ",
    )
    return (
        out.withColumn("text", F.when(F.col("__rep") == 0, F.col("text")).otherwise(tagged))
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("__rep")
    )


def ensure_sf1(spark: SparkSession, src_dir: str = "/root/testdata/sf0.1") -> str:
    """Build the sf1 fixture if absent; returns its directory."""
    out = sf1_dir()
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == GENERATOR_VERSION:
                return out
        # stale fixture from an older generator: rebuild from scratch
        import shutil as _shutil

        _shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    def load(name: str) -> DataFrame:
        return spark.read.parquet(os.path.join(src_dir, f"{name}.parquet"))

    plans = {
        # facts repartition to 32 so the written layout gives the same
        # read parallelism a real warehouse's file sizing would
        "lineitem": _replicate(load("lineitem"), {"l_orderkey": ORDERKEY_OFF}).repartition(32),
        "orders": _replicate(load("orders"), {"o_orderkey": ORDERKEY_OFF, "o_custkey": CUSTKEY_OFF}).repartition(32),
        "customer": _replicate(load("customer"), {"c_custkey": CUSTKEY_OFF}),
        "nation": load("nation"),
        "region": load("region"),
        # documents repartition like the facts: the text operators'
        # map side (gram explode, MG candidate pass) parallelizes by
        # input FILE — a 2-file layout ran the sf1 bigram explode on 2
        # of 32 cores (89 s; 32-file layout ~9 s, same plan)
        "documents": _replicate_documents(load("documents")).repartition(32),
        "events": _replicate(load("events"), {"event_id": EVENTID_OFF, "user_id": USERID_OFF}),
        # part feeds the linkage face: replicated names keep the same
        # first-word block distribution at 10× the rows per block
        "part": _replicate(load("part"), {"p_partkey": PARTKEY_OFF}),
        # supplier stays unreplicated (like nation/region): replicated
        # lineitems keep their base l_suppkey, so the audit face's FK
        # check sees 10× children against the same parent key set
        "supplier": load("supplier"),
        # embeddings replicate with the DOCUMENT offset so the
        # vec_id ↔ doc_id row correspondence survives at 10×; vectors
        # are byte-identical across replicas — exact top-k stays
        # deterministic through the (dist, id) tiebreak, and the knn
        # sweep cost (the thing the sf1 row measures) is unaffected
        "embeddings": _replicate(load("embeddings"), {"vec_id": DOCID_OFF}),
    }
    for name, df in plans.items():
        dest = os.path.join(out, f"{name}.parquet")
        if name == "events":
            # the streaming faces read {dir}/events.parquet as a FILE
            # via pathGlobFilter, so mirror the driver fixture's flat
            # single-file layout (1M rows — one file is fine)
            import glob as _glob
            import shutil as _shutil

            tmp = os.path.join(out, "_events_tmp")
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            _shutil.rmtree(dest, ignore_errors=True)
            if os.path.exists(dest):
                os.remove(dest)
            _shutil.move(part, dest)
            _shutil.rmtree(tmp, ignore_errors=True)
        else:
            df.write.mode("overwrite").parquet(dest)
    with open(marker, "w") as f:
        f.write(GENERATOR_VERSION + "\n")
    return out


def main() -> None:
    from transe_pyspark_spark.session import get_spark

    spark = get_spark("make-sf1")
    out = ensure_sf1(spark)
    for name in SF1_TABLES:
        n = spark.read.parquet(os.path.join(out, f"{name}.parquet")).count()
        print(f"{name}: {n}")


if __name__ == "__main__":
    main()
