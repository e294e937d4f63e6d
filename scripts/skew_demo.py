"""Skewed-join demonstration: the same hot-key join three ways —
plain sort-merge (the straggler), AQE skew-join split, explicit
salting (``operators/relational.py:salted_join``) — with wall times
and the executed-plan evidence (``skew=true``) for PLANS.md.

Workload: lineitem at $SF with a synthetically skewed key (a hot
fraction of rows all map to key 0 — the "one customer is half the
traffic" shape), joined to a distinct-key dimension derived from
orders, then aggregated. The dimension side is forced NOT to
broadcast (autoBroadcastJoinThreshold=-1): at warehouse scale the
right side of a skewed fact-fact join doesn't broadcast, and AQE's
skew split only applies to shuffle joins.

What each variant proves at 100 TB:
* plain      — one reducer owns the hot key's entire partition: the
               job is as slow as that straggler, however many
               executors exist.
* aqe        — AQE splits the oversized partition into N chunks and
               replicates the matching right side (``skew=true`` on
               the SortMergeJoin, no code change) — the default
               mitigation for moderate skew.
* salted     — the key is salted explicitly (hot key spreads over
               ``salt`` reducers at shuffle time) — the extreme-skew
               path when one key exceeds what a single AQE split
               should hold, and the only option for skewed
               AGGREGATIONS (AQE splits joins, not hash aggregates).

Usage: python scripts/skew_demo.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOT_FRACTION = 0.5
N_KEYS = 5000

#: confs toggled per variant (saved/restored around each run)
_SKEW_CONFS = {
    "plain": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    },
    "aqe": {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # sf0.1's hot partition is ~10s of MB; the defaults (256 MB)
        # target real clusters — scale them to the fixture so the
        # mechanism (not the constant) is what's demonstrated
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    },
    "salted": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    },
}


def build_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    from transe_pyspark_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    # repartition(16) BEFORE the skewed projection: the fixture parquet
    # is one row group → one map task, and AQE's skew split operates on
    # map-output blocks — a hot reduce partition fed by a single mapper
    # is unsplittable however large it is. Real warehouse tables have
    # thousands of mappers; 16 models that. The sha2 pad makes the hot
    # partition's bytes material (~45 MB vs ~1.3 MB median at sf0.1).
    left = li.repartition(16).select(
        F.when(F.rand(7) < HOT_FRACTION, F.lit(0))
        .otherwise(F.pmod(F.col("l_orderkey"), F.lit(N_KEYS)))
        .alias("sk"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
        F.sha2(F.col("l_orderkey").cast("string"), 512).alias("pad"),
    )
    # materialize the dimension: an aggregation between the join's
    # shuffle stage and its sort (Sort(HashAgg(ShuffleStage))) does not
    # match OptimizeSkewedJoin's Sort(ShuffleStage) pattern, so the
    # split silently never applies — exactly how a real pipeline would
    # hit this, and why the dim is produced as its own materialized
    # table here
    right = (
        load_table(spark, sf_dir, "orders")
        .select(F.pmod(F.col("o_orderkey"), F.lit(N_KEYS)).alias("sk"))
        .distinct()
        .withColumn("dim_payload", F.col("sk") * 2 + 1)
        .localCheckpoint()
    )
    return left, right


def run_variant(spark: SparkSession, sf_dir: str, mode: str, n_runs: int = 3):
    """Returns (median_seconds, executed_plan_string)."""
    from transe_pyspark_spark.operators.relational import salted_join

    saved = {}
    for k, v in _SKEW_CONFS[mode].items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        def build() -> DataFrame:
            # rebuilt per run: re-collecting ONE Dataset reuses its
            # shuffle map outputs (same RDD lineage → MapOutputTracker
            # hit), which would time only the final stage
            left, right = build_sides(spark, sf_dir)
            if mode == "salted":
                joined = salted_join(left, right, on="sk", salt=16)
            else:
                joined = left.join(right, "sk")
            # global aggregate, NOT groupBy(sk): a per-join-key grouping
            # right after the join would REQUIRE the join's hash
            # partitioning downstream, and AQE then declines to split
            # the skewed partition (splitting breaks the required
            # distribution). Real skewed enrich-joins aggregate on
            # other dimensions; a global rollup keeps the demo honest.
            return joined.agg(
                F.sum(F.col("net") * F.col("dim_payload")).alias("revenue"),
                F.count(F.length("pad")).alias("n"),
            )

        # collect(), not count(): count() spawns a separate query
        # execution, leaving the Dataset's adaptive plan unfinalized
        # (isFinalPlan=false, no skew markers). The result is one row.
        build().collect()  # warmup (codegen, footers)
        samples = []
        result = None
        for _ in range(n_runs):
            result = build()
            t0 = time.time()
            result.collect()
            samples.append(round(time.time() - t0, 3))
        plan = result._jdf.queryExecution().executedPlan().toString()
        return sorted(samples)[len(samples) // 2], samples, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def demo(spark: SparkSession, sf_dir: str) -> tuple[dict, list[str], int]:
    """Run all three variants; returns (times, PLANS.md section lines,
    failure count). Fails if the AQE executed plan carries no
    ``skew=true`` marker."""
    times, all_samples, plans = {}, {}, {}
    for mode in ("plain", "aqe", "salted"):
        times[mode], all_samples[mode], plans[mode] = run_variant(spark, sf_dir, mode)
    failures = 0
    aqe_ok = "skew=true" in plans["aqe"]
    plain_clean = "skew=true" not in plans["plain"]
    if not aqe_ok or not plain_clean:
        failures += 1
    skew_lines = [
        line.strip()
        for line in plans["aqe"].splitlines()
        if "skew=true" in line
    ][:3]
    lines = [
        "## skewed join — AQE skew split vs explicit salting",
        "",
        f"**Requirement:** a {int(HOT_FRACTION * 100)}%-hot key must not ride on one reducer: "
        "AQE splits the oversized partition (skew=true markers, no code change); "
        "`salted_join` spreads it at shuffle time (the extreme-skew and skewed-AGG path).",
        f"**Status:** {'OK' if not failures else 'FAIL (no skew=true in AQE executed plan)'}",
        "",
        "```",
        f"plain SMJ (AQE off):  {times['plain']:.3f}s  {all_samples['plain']}",
        f"AQE skew split:       {times['aqe']:.3f}s  {all_samples['aqe']}",
        f"salted_join(salt=16): {times['salted']:.3f}s  {all_samples['salted']}",
        *skew_lines,
        "```",
        "",
    ]
    return times, lines, failures


def main() -> int:
    from transe_pyspark_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("skew-demo")
    times, lines, failures = demo(spark, sf_dir)
    print("\n".join(lines))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
