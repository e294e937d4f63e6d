"""End-to-end training-corpus pipeline — the LLM-data workflow this
engine adds beyond the reference's KG surface, composed entirely from
operator-library calls (each stage is the same code the oracle-checked
queries run).

    raw documents
      → exact + near dedup (fingerprint, then MinHash-LSH candidates
        verified by exact Jaccard, connected components, canonical keep)
      → Gopher-rule quality gate
      → PII scrub
      → benchmark decontamination (8-gram overlap vs the eval set)
      → per-language stratified mixing
      → token-window chunking into training sequences
      → token-budget sequence packing (distributed prefix sum)
      → deterministic train/val/test split
      → mixture report

Usage:
    python examples/corpus_pipeline.py [sf_dir]      # default sf0.001

Every stage prints its surviving-row count so the funnel is visible.
At 100 TB the same plan holds: dedup joins are bucketed by
shingle/band keys, everything else is narrow column work that
pipelines with the scan.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from transe_pyspark_spark.functions import text as X  # noqa: E402
from transe_pyspark_spark.operators import dedup as D  # noqa: E402
from transe_pyspark_spark.operators.relational import stratified_mod_sample  # noqa: E402
from transe_pyspark_spark.session import get_spark  # noqa: E402
from transe_pyspark_spark.sources.readers import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-pipeline")
    docs = load_table(spark, sf_dir, "documents")
    print(f"raw docs: {docs.count()}")

    # 0. ingest audit (r08): fail fast on broken drops BEFORE any
    # dedup work — one |checks|-row report of exact violation counts
    from transe_pyspark_spark.operators import quality as Q

    # all four checks name the same table, so they batch into ONE
    # aggregate over one pruned scan (r09 audit_table)
    audit = Q.audit_table(docs, [
        ("unique", "doc_id"),
        ("not_null", "text"),
        ("accepted", "lang", ["en", "de", "fr", "es", "zh"]),
        ("range", "n_chars", 1, None),
    ])
    for r in audit.collect():
        flag = " <-- violations" if r["n_violations"] else ""
        print(f"  audit {r['check_name']}: {r['n_violations']}/{r['n_checked']}{flag}")

    # 1. exact dedup by content fingerprint (cheap, catches byte-dups)
    docs = docs.withColumn("__fp", X.fingerprint("text")).dropDuplicates(["__fp"]).drop("__fp")
    print(f"after exact dedup: {docs.count()}")

    # 2. near dedup: MinHash-LSH candidates → exact-Jaccard verify →
    #    connected components → keep the min-id doc per duplicate group
    keep = D.near_dedup_canonical(docs, threshold=0.8, shingle_n=3, method="minhash")
    docs = docs.join(keep.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi")
    print(f"after near dedup: {docs.count()}")

    # 3. quality gate (Gopher rules, shared expression with the oracle query)
    docs = docs.filter(X.gopher_keep("text"))
    print(f"after quality gate: {docs.count()}")

    # 3b. benchmark decontamination: drop docs sharing any 8-gram with
    #     the held-out eval set (docs with doc_id % 7 == 3 stand in) —
    #     same operator the oracle-checked query runs
    corpus = docs.filter(F.col("doc_id") % 7 != 3)
    dirty = X.contaminated_docs(
        corpus, docs.filter(F.col("doc_id") % 7 == 3), n=8
    ).select("doc_id")
    docs = corpus.join(dirty, "doc_id", "left_anti")
    print(f"after decontamination: {docs.count()}")

    # 4. PII scrub (audit counts + redaction)
    emails, phones = X.pii_counts(F.col("text"))
    docs = docs.withColumn("__emails", emails).withColumn("__phones", phones).withColumn(
        "text", X.scrub_pii("text")
    )
    audited = docs.agg(F.sum("__emails").alias("e"), F.sum("__phones").alias("p")).first()
    print(f"pii scrubbed: {audited.e} emails, {audited.p} phones")

    # 5. per-language mixing (data-mixture rates)
    docs = stratified_mod_sample(
        docs, strata_col="lang", key_col="doc_id", fractions={"en": 0.5, "zh": 0.2}, default=0.1
    )
    print(f"after stratified mix: {docs.count()}")

    # 6. chunk into overlapping training sequences
    chunks = X.chunk_docs(docs, size=32, stride=24)
    print(f"training sequences: {chunks.count()}")

    # 7. pack sequences into 2048-token training bins (distributed prefix sum)
    from transe_pyspark_spark.operators.relational import pack_by_running_total

    packed = pack_by_running_total(
        chunks.withColumn("__ord", F.col("doc_id") * 10_000 + F.col("chunk_id")),
        order_col="__ord",
        weight_col="n_tokens",
        budget=2048,
    )
    n_packs = packed.agg(F.countDistinct("pack_id")).first()[0]
    print(f"packed into {n_packs} bins of <=2048 tokens (+1 seq overflow)")

    # 8. LEAKAGE-SAFE train/val/test split (r07): normalized-identical
    #    docs always co-assign — the split hashes each duplicate
    #    group's canonical min-id, so near-identical text can't
    #    straddle train and test (still deterministic and stable under
    #    repartition, retry, and append)
    from transe_pyspark_spark.operators.relational import leakage_safe_split

    split_counts = {
        r.split: r.n
        for r in leakage_safe_split(docs)
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(f"split: {split_counts}")

    # 9. mixture report
    report = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum(X.word_count("text")).alias("words"))
        .orderBy("lang")
    )
    for r in report.collect():
        print(f"  {r.lang}: {r.n_docs} docs, {r.words} words")


if __name__ == "__main__":
    main()
