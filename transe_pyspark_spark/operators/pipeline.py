"""End-to-end corpus pipeline as ONE lazy composition (r09, VERDICT
r08 ask #4).

``examples/corpus_pipeline.py`` narrates the same chain stage by
stage with a count() per stage — fine for a demo, but each count is
an extra action and the stage frames are consumed more than once, the
exact multi-consumer shape that has bitten this repo three times
(transition totals, affinity membership, r06 PageRank: an uncached
frame with N consumers re-runs its whole subtree N times). This
module composes the chain

    ingest audit → exact dedup → near dedup → quality gate →
    decontaminate → PII scrub → stratified mix → chunk → pack →
    leakage-safe split → mixture report

into one DataFrame of (metric, value) rows whose single action
executes every stage, with the three fan-out frames PINNED
(``repartition``/``cache`` — InMemoryRelation preserves partitioning,
the repo's standing multi-consumer fix):

* ``d1`` (post exact-dedup): consumed by the near-dup pair builder,
  the canonical-keep join-back, and the keep map itself — unpinned,
  the fingerprint shuffle would run 3×.
* ``d3`` (post quality gate): consumed by the corpus side, the eval
  side, and the decontamination gram join — unpinned, the semi-join
  chain would run 3×.
* ``d5`` (post mix + PII scrub): consumed by chunk→pack, the
  leakage-safe split, and the mixture report — unpinned, the scrub
  expressions would run 3×.

The connected-components step inside ``near_dedup_canonical`` is
inherently iterative (its own eager, checkpoint-truncated loop); its
output is a tiny keep map, so the "one action" claim applies to every
corpus-sized subtree.

At 100 TB: each pin is one corpus-sized shuffle + cache write —
exactly the price of NOT re-running the stage per consumer; spill is
bounded because every downstream consumer reads the cached columnar
blocks. The caller unpersists the returned pins after the action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transe_pyspark_spark.functions import text as X
from transe_pyspark_spark.operators import dedup as D
from transe_pyspark_spark.operators import quality as Q
from transe_pyspark_spark.operators.relational import (
    leakage_safe_split,
    pack_by_running_total,
    stratified_mod_sample,
)


def corpus_pipeline_report(
    docs: DataFrame,
    near_threshold: float = 0.8,
    eval_mod: int = 7,
    eval_rem: int = 3,
    chunk_size: int = 32,
    chunk_stride: int = 24,
    pack_budget: int = 2048,
) -> tuple[DataFrame, list[DataFrame]]:
    """Build the full pipeline; returns ``(report, pins)`` where
    ``report`` is a lazy (metric, value) frame — ONE action runs the
    whole chain — and ``pins`` are the cached fan-out frames for the
    caller to ``unpersist()`` afterwards."""
    spark = docs.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def one(name: str, agg_df: DataFrame) -> DataFrame:
        return agg_df.select(F.lit(name).alias("metric"), F.col("value").cast("long"))

    # 0. ingest audit: one batched aggregate over one pruned scan
    audit = Q.audit_table(docs, [
        ("unique", "doc_id"),
        ("not_null", "text"),
        ("range", "n_chars", 1, None),
    ]).select(
        F.concat(F.lit("audit_violations:"), F.col("check_name")).alias("metric"),
        F.col("n_violations").alias("value"),
    )

    # 1. exact dedup (xxhash64 fingerprint), pinned for its 3 consumers
    d1 = (
        docs.withColumn("__fp", X.fingerprint("text"))
        .dropDuplicates(["__fp"])
        .drop("__fp")
        .repartition(n_part, "doc_id")
        .cache()
    )
    # 2. near dedup: MinHash-LSH pairs → CC (eager, tiny output) → keep
    keep = D.near_dedup_canonical(d1, threshold=near_threshold, shingle_n=3, method="minhash")
    d2 = d1.join(keep.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi")
    # 3. quality gate, pinned for the corpus/eval/decontaminate fan-out
    d3 = d2.filter(X.gopher_keep("text")).cache()
    # 3b. benchmark decontamination (held-out docs stand in as evals)
    corpus = d3.filter(F.col("doc_id") % eval_mod != eval_rem)
    evals = d3.filter(F.col("doc_id") % eval_mod == eval_rem)
    dirty = X.contaminated_docs(corpus, evals, n=8).select("doc_id")
    d4 = corpus.join(dirty, "doc_id", "left_anti")
    # 4+5. PII scrub + stratified mix, pinned for chunk/split/report
    d5 = (
        stratified_mod_sample(
            d4.withColumn("text", X.scrub_pii("text")),
            strata_col="lang",
            key_col="doc_id",
            fractions={"en": 0.5, "zh": 0.2},
            default=0.1,
        )
        .cache()
    )
    # 6+7. chunk into sequences, pack into token-budget bins
    chunks = X.chunk_docs(d5, size=chunk_size, stride=chunk_stride)
    packed = pack_by_running_total(
        chunks.withColumn("__ord", F.col("doc_id") * 10_000 + F.col("chunk_id")),
        order_col="__ord",
        weight_col="n_tokens",
        budget=pack_budget,
    )
    # 8. leakage-safe split + 9. mixture report, all as metric rows
    report = audit
    report = report.unionByName(
        one("docs_after_near_dedup", d2.agg(F.count(F.lit(1)).alias("value")))
    )
    report = report.unionByName(
        one("docs_after_decontaminate", d4.agg(F.count(F.lit(1)).alias("value")))
    )
    report = report.unionByName(
        one("n_packs", packed.agg(F.count_distinct("pack_id").alias("value")))
    )
    report = report.unionByName(
        leakage_safe_split(d5)
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("value"))
        .select(F.concat(F.lit("split:"), F.col("split")).alias("metric"), "value")
    )
    report = report.unionByName(
        d5.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("value"))
        .select(F.concat(F.lit("mix:"), F.col("lang")).alias("metric"), "value")
    )
    return report, [d1, d3, d5]
