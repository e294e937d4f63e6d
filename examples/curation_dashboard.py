"""Curation dashboard — the late-r11 statistics layer composed from
operator-library calls (each stage is the same code the oracle-checked
queries run): what to buy, what to merge, what to flag, and whether
the event stream is drifting.

    documents
      → vocabulary-growth curve per source (Heaps law: which slice
        still buys new terms, which is lexical re-tread)
      → PMI collocations (phrase mining before vocabulary building)
      → per-doc TF-IDF keywords (reversible index terms)
      → functional-dependency audit source→lang (data-contract check
        with the exact g3 repair cost)
      → golden-record survivorship over opening-bigram blocks
        (per-field min/max/mode merge)
    events
      → the two-sample drift triptych on one shared scaffolding:
        KS (worst CDF gap), Wasserstein-1 (area = mean transport in
        value units), Mann-Whitney AUC (P(view > purchase))
      → chi² + Cramér's V: does language predict source? (docs)
      → Kaplan-Meier view→purchase conversion curve under censoring

Usage:
    python examples/curation_dashboard.py [sf_dir]    # default sf0.001

At 100 TB the same plans hold: every tokenization pins once, every
two-sample statistic rides the frozen-tile distributed prefix (never a
pid-less window), the chi² grid and golden-record pieces stay
aggregate-sized, and the KM curve is two chained prefixes over the
duration cardinality.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from transe_pyspark_spark.functions.text import (  # noqa: E402
    collocations,
    top_terms_per_doc,
    vocab_growth,
)
from transe_pyspark_spark.operators.dedup import golden_record  # noqa: E402
from transe_pyspark_spark.operators.quality import fd_violations  # noqa: E402
from transe_pyspark_spark.operators.relational import (  # noqa: E402
    chi2_independence,
    ks_statistic,
    mannwhitney_u,
    wasserstein_1d,
)
from transe_pyspark_spark.operators.sequences import km_survival  # noqa: E402
from transe_pyspark_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation-dashboard")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from transe_pyspark_spark.sources.readers import load_table

    events = load_table(spark, sf_dir, "events")

    print("== vocabulary growth per source (buy more of the slices with high n_new) ==")
    for r in vocab_growth(docs).orderBy("source").limit(5).collect():
        print(
            f"  {r['source']}: {r['n_tokens']} tokens, {r['n_distinct']} distinct, "
            f"+{r['n_new']} new -> vocab {r['vocab_cum']}"
        )

    print("== top PMI collocations (phrase candidates) ==")
    for r in (
        collocations(docs, min_count=5)
        .orderBy(F.desc("pmi_nano"))
        .limit(5)
        .collect()
    ):
        print(f"  '{r['term_1']} {r['term_2']}' x{r['n_pair']} pmi {r['pmi_nano'] / 1e9:.3f}")

    print("== TF-IDF keywords for the first two docs ==")
    kw = top_terms_per_doc(docs, k=3)
    for r in kw.filter(F.col("doc_id") <= 2).orderBy("doc_id", "rank").collect():
        print(f"  doc {r['doc_id']} #{r['rank']}: {r['term']} (tf {r['tf']})")

    print("== FD audit source -> lang (g3 repair cost per violating source) ==")
    for r in fd_violations(docs, "source", "lang").orderBy(F.desc("n_violating")).limit(3).collect():
        print(
            f"  {r['det']}: {r['n_dep']} langs over {r['n_rows']} docs, "
            f"{r['n_violating']} rows must change"
        )

    print("== golden records over opening-bigram blocks ==")
    key = F.array_join(
        F.slice(F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""), 1, 2),
        " ",
    )
    gr = golden_record(docs, key, "doc_id", max_cols=("n_chars",), mode_cols=("source", "lang"))
    for r in gr.orderBy(F.desc("n_members")).limit(3).collect():
        print(
            f"  block @doc{r['canonical_id']}: {r['n_members']} members, "
            f"longest {r['max_n_chars']} chars, mode source {r['mode_source']}, lang {r['mode_lang']}"
        )

    print("== two-sample drift triptych: view vs purchase value ==")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    ks = ks_statistic(events, "event_type", "value", "view", "purchase").collect()[0]
    w1 = wasserstein_1d(events, "event_type", cents, "view", "purchase").collect()[0]
    mw = mannwhitney_u(events, "event_type", "value", "view", "purchase").collect()[0]
    print(f"  KS D = {ks['ks_d']:.4f} (worst CDF gap)")
    print(f"  W1   = {w1['w1'] / 100:.2f} value units of mean transport")
    print(f"  AUC  = {mw['auc_a']:.4f} = P(view value > purchase value)")

    chi = chi2_independence(docs, F.col("lang"), F.col("source")).collect()[0]
    print(
        f"== chi2(lang, source) == {chi['chi2']} (dof {chi['dof']}), "
        f"Cramer's V {chi['cramers_v']}"
    )

    print("== Kaplan-Meier view -> purchase conversion (censored at horizon) ==")
    v = events.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("__t0"))
    fp = (
        events.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("__t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("__tp"))
    )
    mx = F.broadcast(events.agg(F.max("ts").alias("__mx")))
    subj = (
        v.join(fp, "user_id", "left")
        .crossJoin(mx)
        .select(
            F.expr("(unix_micros(coalesce(__tp, __mx)) - unix_micros(__t0)) div 1000000").alias("dur_s"),
            F.col("__tp").isNotNull().cast("int").alias("converted"),
        )
    )
    curve = km_survival(subj, "dur_s", "converted").orderBy("duration").collect()
    for r in curve[:: max(1, len(curve) // 5)][:5]:
        print(
            f"  t={r['duration']}s: {r['survival']:.4f} unconverted "
            f"(risk {r['n_risk']}, events {r['n_event']})"
        )

    spark.stop()


if __name__ == "__main__":
    main()
