"""Isolated per-query measurement + plan capture (optimization rounds).

Usage:
    python scripts/profile_queries.py [--sf-dir DIR] [--plans-out DIR]
        [--runs N] [--action count|noop] query [query ...]

For each named registry query: one untimed warmup, then N timed runs
(median reported), and the ``explain("formatted")`` text written to
``--plans-out/<query>.txt`` when requested.  The timed action defaults
to ``count`` — the bench's methodology — so numbers here are directly
comparable to BENCH rows; ``--action noop`` forces full
materialization of every column (guide §1.4) for isolation work.

Prints one line per query: ``<name>  median=<s>  runs=[..]  rows=<n>``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transe_pyspark_spark.plans.queries import REGISTRY  # noqa: E402
from transe_pyspark_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--plans-out", default=None)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--action", choices=("count", "noop"), default="count")
    args = ap.parse_args()

    spark = get_spark("profile")
    # warm the JVM + parquet footers like bench.py does
    spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet")).count()

    def run_action(df) -> int:
        if args.action == "noop":
            df.write.format("noop").mode("overwrite").save()
            return -1
        return df.count()

    for name in args.queries:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = fn(spark, args.sf_dir)
        if args.plans_out:
            os.makedirs(args.plans_out, exist_ok=True)
            with open(os.path.join(args.plans_out, f"{name}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        n = run_action(df)  # warmup: codegen compile, footer cache
        samples = []
        for _ in range(args.runs):
            t0 = time.time()
            run_action(fn(spark, args.sf_dir))
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        med = sorted(samples)[len(samples) // 2]
        print(f"{name}  median={med}  runs={samples}  rows={n}", flush=True)
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
