"""End-to-end warehouse + product-analytics workflow — the r06
analytics layer composed from operator-library calls (each stage is
the same code the oracle-checked queries run).

    nightly snapshot maintenance
      → key-skew report on the fact table's join keys (decides plain
        vs AQE-split vs salted for everything downstream)
      → CDC apply: the day's change batch (upserts + deletes,
        last-writer-wins sequencing) merges into the customer snapshot
      → SCD2 merge: the same batch versions the slowly-changing
        dimension (history closed, new versions opened)
    product analytics over the event log
      → weekly cohort-retention matrix
      → rolling 7-day DAU/WAU engagement + stickiness
      → robust median/MAD outlier screen on event values
      → sessionization + funnel-adjacent co-purchase mining
      → exact-integer PageRank over the customer↔supplier trading
        graph (who is structurally central in the order flow)

Usage:
    python examples/warehouse_pipeline.py [sf_dir]   # default sf0.001

Every stage prints a compact result so the flow is visible. At 100 TB
the same plans hold: merges touch the snapshot through one key join,
analytics aggregate on day/cohort/key cells that stay KB-sized however
large the event log, and the PageRank iterations join checkpointed
edge leaves.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from transe_pyspark_spark.operators.asof import (  # noqa: E402
    cohort_retention,
    rolling_active_users,
    sessionize,
)
from transe_pyspark_spark.operators.graph import (  # noqa: E402
    copurchase_pairs,
    pagerank_integer,
)
from transe_pyspark_spark.operators.asof import collapse_bursts  # noqa: E402
from transe_pyspark_spark.operators.relational import (  # noqa: E402
    cdc_apply,
    distribution_drift,
    key_skew_report,
    mad_outliers,
    scd2_merge,
    trend_per_key,
    winsorize_report,
)
from transe_pyspark_spark.session import get_spark  # noqa: E402
from transe_pyspark_spark.sources.readers import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("warehouse-pipeline")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")

    # r08: gate the night on a constraint audit — violations surface
    # BEFORE any merge runs, as one |checks|-row report
    from transe_pyspark_spark.operators import quality as Q

    print("== constraint audit (pre-merge gate) ==")
    audit = Q.constraint_audit(
        [
            Q.check_not_null(orders, "o_custkey"),
            # customer's two checks share one scan (r09 audit_table)
            Q.audit_table(cust, [
                ("unique", "c_custkey"),
                ("range", "c_acctbal", 0, None),
            ]),
            Q.check_foreign_key(orders, "o_custkey", cust, "c_custkey"),
        ]
    )
    for r in audit.collect():
        flag = " <-- violations" if r["n_violations"] else ""
        print(f"  {r['check_name']}: {r['n_violations']}/{r['n_checked']}{flag}")

    print("== key skew (sizing the night's shuffles) ==")
    skew = key_skew_report(lineitem, "l_orderkey").unionByName(
        key_skew_report(orders, "o_custkey")
    )
    for r in skew.collect():
        print(f"  {r['key_name']}: {r['n_keys']} keys, max {r['max_count']}, "
              f"p99 {r['p99_count']}, top1 share {r['top1_share']:.4f}")

    # the day's change batch: updates for some keys, deletes for others
    snap = cust.select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
    )
    null_l = F.lit(None).cast("long")
    changes = (
        snap.filter(F.col("c_custkey") % 10 == 3)
        .select("c_custkey", "c_nationkey",
                (F.col("acctbal_cents") + 10000).alias("acctbal_cents"),
                F.lit("U").alias("op"), F.lit(1).alias("seq"))
        .unionByName(
            snap.filter(F.col("c_custkey") % 10 == 7)
            .select("c_custkey", null_l.alias("c_nationkey"),
                    null_l.alias("acctbal_cents"),
                    F.lit("D").alias("op"), F.lit(1).alias("seq"))
        )
    )
    applied = cdc_apply(snap, changes, ["c_custkey"])
    print(f"== CDC apply == {snap.count()} snapshot rows -> {applied.count()} after merge")

    # r08: post-merge snapshot diff — one full-outer join + one agg
    # recovers exactly what the merge did (the audit for the audit)
    from transe_pyspark_spark.operators.relational import table_diff

    print("== snapshot diff (old vs CDC-applied) ==")
    for r in table_diff(snap, applied, ["c_custkey"]).collect():
        print(f"  {r['metric']}: {r['n']}")

    # r09: the per-nation rollup is maintained INCREMENTALLY from the
    # same change batch — the base table is never rescanned; at
    # warehouse scale this is the dashboard-refresh path
    from transe_pyspark_spark.operators.relational import (
        build_group_summary,
        maintain_group_summary,
        snapshot_changeset_images,
    )

    images = snapshot_changeset_images(snap, applied, ["c_custkey"])
    refreshed = maintain_group_summary(
        build_group_summary(snap, "c_nationkey", ["acctbal_cents"]),
        images,
        "c_nationkey",
        ["acctbal_cents"],
    )
    recomputed = build_group_summary(applied, "c_nationkey", ["acctbal_cents"])
    drift = refreshed.exceptAll(recomputed).count() + recomputed.exceptAll(refreshed).count()
    print(
        f"== incremental summary refresh == {images.count()} change rows -> "
        f"{refreshed.count()} maintained groups; drift vs recompute: {drift} (must be 0)"
    )
    assert drift == 0, "maintained summary diverged from recompute"

    dim = snap.withColumn("valid_from", F.to_date(F.lit("2024-01-01"))).withColumn(
        "valid_to", F.lit(None).cast("date")
    )
    versioned = scd2_merge(
        dim,
        changes.filter(F.col("op") != "D").select("c_custkey", "c_nationkey", "acctbal_cents"),
        key_cols=["c_custkey"],
        compare_cols=["c_nationkey", "acctbal_cents"],
        effective=F.to_date(F.lit("2024-06-01")),
    )
    open_rows = versioned.filter(F.col("valid_to").isNull()).count()
    print(f"== SCD2 merge == {versioned.count()} version rows, {open_rows} open")

    # point-in-time enrichment (r11): every event joins the version of
    # its user's dimension row that was valid AT THE EVENT'S OWN
    # TIMESTAMP — the temporal-correctness join that prevents
    # latest-version leakage when labeling historical facts. The events
    # fixture predates the 2024-06-01 change batch, so every event
    # resolves to a first-generation version — asserted, not assumed.
    from transe_pyspark_spark.operators.relational import pit_join

    enriched = pit_join(
        events, versioned, "user_id", "c_custkey", "ts", how="left", broadcast_dim=True
    )
    n_pre_change = enriched.filter(
        F.col("valid_from") == F.to_date(F.lit("2024-01-01"))
    ).count()
    print(
        f"== point-in-time enrichment == {enriched.count()} events labeled AS OF "
        f"their own ts; {n_pre_change} resolved to pre-change versions (all)"
    )

    print("== weekly cohort retention ==")
    for r in cohort_retention(events).orderBy("cohort_week", "age_weeks").collect()[:6]:
        print(f"  cohort {r['cohort_week'].date()} +{r['age_weeks']}w: "
              f"{r['n_active']}/{r['n_cohort']} = {r['retention']:.2f}")

    print("== rolling DAU/WAU ==")
    for r in rolling_active_users(events).orderBy("day").collect()[-5:]:
        print(f"  {r['day']}: dau {r['dau']}, wau {r['wau']}, stickiness {r['stickiness']:.2f}")

    print("== MAD outlier screen on event values ==")
    for r in mad_outliers(events, "event_type", "value").collect():
        print(f"  {r['event_type']}: {r['n_outliers']}/{r['n']} outliers "
              f"(med {r['med']}, mad {r['mad']})")

    n_sessions = sessionize(events).count()
    print(f"== sessionization == {n_sessions} sessions")

    n_raw = events.count()
    n_deduped = collapse_bursts(events, ["user_id", "event_type"], gap_seconds=300).count()
    print(f"== burst dedup == {n_raw} events -> {n_deduped} after 5-min suppression")

    print("== value drift (first vs second half-month) ==")
    cut = F.lit("2024-01-16").cast("timestamp")
    drift = distribution_drift(
        events.filter(F.col("ts") < cut), events.filter(F.col("ts") >= cut),
        F.floor(F.col("value") / 10.0).cast("long"),
    )
    tv = sum(r["tv_contrib"] for r in drift.collect())
    print(f"  total-variation distance: {tv:.4f}")

    print("== per-type value trend (cents/s) ==")
    for r in trend_per_key(events, "event_type", "ts", "value").collect()[:3]:
        print(f"  {r['event_type']}: slope {r['slope_cents_per_s']}, n {r['n']}")

    print("== winsorization (p01/p99) ==")
    for r in winsorize_report(events, "event_type", "value").collect()[:3]:
        print(f"  {r['event_type']}: clipped {r['n_clipped_lo']}+{r['n_clipped_hi']}, "
              f"sum {r['sum_cents_raw']} -> {r['sum_cents_winsorized']}")

    # r08: RFM segmentation — three prefix-rank quintiles over one
    # customer-grain pass
    from transe_pyspark_spark.operators.relational import rfm_segments

    print("== RFM segments (5 largest) ==")
    for r in (rfm_segments(orders)
              .orderBy(F.col("n_customers").desc(), "r_score", "f_score", "m_score")
              .limit(5).collect()):
        print(f"  R{r['r_score']} F{r['f_score']} M{r['m_score']}: "
              f"{r['n_customers']} customers, {r['sum_monetary_cents'] / 100:.0f} total")

    print("== co-purchase mining (top 5 part pairs) ==")
    for r in copurchase_pairs(lineitem, "l_orderkey", "l_partkey", top_k=5).collect():
        print(f"  parts {r['item_a']} + {r['item_b']}: {r['n_baskets']} orders")

    fwd = (
        orders.join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("src"),
                (F.lit(10000000) + F.col("l_suppkey")).alias("dst"))
        .distinct()
    )
    edges = fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank_integer(edges, iterations=3)
    print("== trading-graph PageRank (top 5 nodes) ==")
    for r in ranks.orderBy(F.col("rank_micro").desc(), "node").limit(5).collect():
        kind = "supplier" if r["node"] >= 10000000 else "customer"
        print(f"  {kind} {r['node'] % 10000000}: rank {r['rank_micro'] / 1_000_000:.3f}")

    # r07: graph-shape census of the part co-occurrence graph
    from transe_pyspark_spark.operators.graph import triangle_stats

    li = lineitem.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    pa = li.select("o", F.col("p").alias("src"))
    pb = li.select("o", F.col("p").alias("dst"))
    co = pa.join(pb, "o").filter(F.col("src") < F.col("dst")).select("src", "dst")
    ts = triangle_stats(co).collect()[0]
    print(f"== part co-occurrence graph == {ts['n_nodes']} nodes, {ts['n_edges']} edges, "
          f"{ts['n_triangles']} triangles, clustering {ts['clustering']:.4f}")

    # r07: day-of-week seasonal anomaly screen (top 3 deviations)
    from transe_pyspark_spark.operators.relational import seasonal_anomaly_report

    print("== seasonal anomalies (largest deviation from weekday baseline) ==")
    for r in (seasonal_anomaly_report(events)
              .orderBy(F.abs(F.col("ratio") - 1).desc()).limit(3).collect()):
        print(f"  {r['key']} {r['day']}: {r['day_cents']}c vs weekday mean "
              f"{r['dow_total_cents'] // r['dow_days']}c (ratio {r['ratio']:.2f})")


if __name__ == "__main__":
    main()
