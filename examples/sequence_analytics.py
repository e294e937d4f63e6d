"""End-to-end event-sequence analytics workflow — the r08 layer
composed from operator-library calls (each stage is the same code the
oracle-checked queries run).

    behavioral modeling over the event log
      → Markov transition matrix (what follows what, per source state)
      → top-10 consecutive 3-event paths (the routes users actually take)
    conversion analysis
      → TRUE ordered funnel view → click → purchase
      → conversion-latency percentiles per weekly first-view cohort
      → two-proportion A/B z readout (arms by user-id parity)
    metric health
      → daily view↔purchase count correlation (exact integer moments)
      → CUSUM level-shift screen per event type (change-day candidates)
      → exact half-life-decayed engagement scores (top users)

Usage:
    python examples/sequence_analytics.py [sf_dir]   # default sf0.001

Every stage prints a compact result so the flow is visible. At 100 TB
the same plans hold: the sequence operators ride ONE user-key window
sort each, the funnels/joins share the user hash partitioning, and the
statistics aggregate exact integers into day/type/arm cells that stay
KB-sized however large the log.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from transe_pyspark_spark.operators.asof import ordered_funnel  # noqa: E402
from transe_pyspark_spark.operators.relational import time_decay_scores  # noqa: E402
from transe_pyspark_spark.operators.sequences import (  # noqa: E402
    ab_conversion_ztest,
    cusum_changepoint,
    daily_count_correlation,
    time_to_convert,
    top_event_paths,
    transition_counts,
)
from transe_pyspark_spark.session import get_spark  # noqa: E402
from transe_pyspark_spark.sources.readers import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("sequence-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    events = load_table(spark, sf_dir, "events")

    print("== Markov transitions (top 8 by count) ==")
    transition_counts(events).orderBy(F.desc("n")).show(8, truncate=False)

    print("== top 3-event paths ==")
    top_event_paths(events, path_len=3, top_k=5).show(truncate=False)

    print("== ordered funnel view -> click -> purchase ==")
    ordered_funnel(events, ["view", "click", "purchase"]).orderBy("step_idx").show()

    print("== conversion latency per weekly cohort ==")
    time_to_convert(events).orderBy("cohort_week").show()

    print("== A/B readout (arms by user parity) ==")
    ab_conversion_ztest(events, arm_expr=F.pmod(F.col("user_id"), F.lit(2))).show()

    print("== daily view/purchase correlation ==")
    daily_count_correlation(events, "view", "purchase").show()

    print("== CUSUM change-point screen per type ==")
    cusum_changepoint(events).orderBy("event_type").show()

    print("== decayed engagement scores (top 5 users) ==")
    time_decay_scores(events).orderBy(F.desc("decayed_cents")).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
