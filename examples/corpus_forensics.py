"""Corpus forensics workflow — the r11 layer composed from
operator-library calls (each stage is the same code the oracle-checked
queries run): quality screening, similarity forensics at three
granularities, and batch retrieval over one small corpus.

    documents
      → unigram-NLL quality screen (corpus-as-its-own-LM perplexity
        stand-in: flag the most- and least-surprising docs)
      → weighted (multiset) Jaccard near-dup (repeated-paragraph
        inflation visible where set Jaccard is blind)
      → winnowing fingerprints (MOSS local similarity: guaranteed
        detection of shared ≥6-word runs, positional evidence)
      → PSI drift between two sources' length distributions
      → BM25 top-k retrieval for a batch of queries in ONE corpus pass

Usage:
    python examples/corpus_forensics.py [sf_dir]      # default sf0.001

At 100 TB the same plans hold: the NLL screen and BM25 pass pin ONE
tokenization each, similarity pairs come from posting-list equi-joins
(never all pairs), and the weighted path's benched configuration is
the 3-gram expansion whose pseudo-shingles stay near-unique.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from transe_pyspark_spark.functions.text import bm25_topk, unigram_nll  # noqa: E402
from transe_pyspark_spark.operators.dedup import (  # noqa: E402
    weighted_jaccard_prefix_pairs,
    winnow_pairs,
)
from transe_pyspark_spark.operators.relational import psi_drift  # noqa: E402
from transe_pyspark_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-forensics")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    print("== unigram-NLL quality screen (high = surprising, low = boilerplate) ==")
    nll = unigram_nll(docs).cache()
    for label, df in (
        ("most surprising", nll.orderBy(F.desc("mean_nll"))),
        ("most boilerplate", nll.orderBy("mean_nll")),
    ):
        for r in df.limit(3).collect():
            print(f"  {label}: doc {r['doc_id']} nll {r['mean_nll']} ({r['n_tokens']} tokens)")

    wj = weighted_jaccard_prefix_pairs(docs, threshold=0.6, shingle_n=3)
    print(f"== weighted 3-gram Jaccard >= 0.6 == {wj.count()} near-dup pairs")

    wp = winnow_pairs(docs, min_shared=5).cache()
    print(f"== winnowing (k=3, w=4, >=5 shared fingerprints) == {wp.count()} pairs")
    for r in wp.orderBy(F.desc("n_shared")).limit(3).collect():
        print(f"  docs {r['doc_a']}/{r['doc_b']}: {r['n_shared']} shared fps "
              f"(of {r['nf_a']}/{r['nf_b']})")

    srcs = [r[0] for r in docs.select("source").distinct().limit(2).collect()]
    if len(srcs) == 2:
        row = psi_drift(
            docs.filter(F.col("source") == srcs[0]),
            docs.filter(F.col("source") == srcs[1]),
            F.floor(F.col("n_chars") / 50).cast("long"),
        ).collect()[0]
        print(f"== PSI({srcs[0]} vs {srcs[1]}, doc-length buckets) == "
              f"{row['psi']} over {row['n_buckets']} buckets "
              f"({'stable' if row['psi'] < 0.1 else 'shifting' if row['psi'] < 0.25 else 'action'})")

    print("== BM25 top-3 retrieval, one corpus pass for the whole query batch ==")
    hits = bm25_topk(
        docs,
        {"joins": ["hash", "join", "merge"], "streaming": ["stream", "window", "batch"]},
        k=3,
    )
    for r in hits.orderBy("query_id", "rank").collect():
        print(f"  [{r['query_id']}] #{r['rank']}: doc {r['doc_id']} "
              f"score {r['score']} ({r['n_matched_terms']} terms)")

    spark.stop()


if __name__ == "__main__":
    main()
