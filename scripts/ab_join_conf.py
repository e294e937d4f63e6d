"""A/B battery: spark.sql.join.preferSortMergeJoin=false (shuffled-hash
joins where their size conditions fit — guide §3.1/§9) vs the default,
interleaved in ONE session so host-era drift cancels.

Runs each query under A then B per round (runtime-settable conf), three
rounds, reports per-query medians and the jvm_codegen probe bracketing
the battery. Usage:

    python scripts/ab_join_conf.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transe_pyspark_spark.plans.queries import REGISTRY  # noqa: E402
from transe_pyspark_spark.session import get_spark  # noqa: E402

DEFAULT_BATTERY = [
    # headline rows with real joins
    "region_revenue", "top_revenue_orders", "asof_purchase_click",
    "jaccard3_near_pairs", "jaccard_prefix_near_pairs",
    # sf1-heavy join shapes at sf0.1 scale
    "weighted_jaccard3_prefix_docs", "hits_copurchase_parts",
    "bfs_hops_trading", "spearman_qty_price_lineitem",
    "robust_outliers_events", "eventually_follows_events",
]


def probe(spark) -> float:
    fn = lambda: spark.range(500_000_000).selectExpr("sum(id * 2 + 7)").collect()  # noqa: E731
    fn()
    s = []
    for _ in range(3):
        t0 = time.time()
        fn()
        s.append(round(time.time() - t0, 3))
    return sorted(s)[1]


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = [a for a in args if not os.path.isdir(a)] or DEFAULT_BATTERY
    spark = get_spark("ab-join-conf")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    print(f"# probe before: {probe(spark)}")

    def run(name: str) -> float:
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).count()  # warm (codegen + any per-call caches)
        t0 = time.time()
        fn(spark, sf_dir).count()
        dt = round(time.time() - t0, 3)
        spark.catalog.clearCache()
        return dt

    results: dict[str, dict[str, list[float]]] = {n: {"smj": [], "shj": []} for n in names}
    for rnd in range(3):
        for name in names:
            spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
            results[name]["smj"].append(run(name))
            spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
            results[name]["shj"].append(run(name))
        print(f"# round {rnd} done", flush=True)
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    print(f"# probe after: {probe(spark)}")
    for name, r in results.items():
        med = lambda s: sorted(s)[len(s) // 2]  # noqa: E731
        print(f"{name}: smj={r['smj']} med={med(r['smj'])} | shj={r['shj']} med={med(r['shj'])}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
