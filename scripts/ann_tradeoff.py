"""ANN recall/latency tradeoff table — measured, not guessed.

Runs exact brute-force kNN and each approximate index (LSH, IVF,
IVF-PQ) over the embeddings fixture at $SPARK_GRAFT_SF_DIR (default
sf0.1: 5,000 vectors), recording recall@k vs exact and wall-clock per
variant. Prints a markdown table (pasted into README) plus one JSON
line for tooling.

Usage: python scripts/ann_tradeoff.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from transe_pyspark_spark.operators import similarity as S  # noqa: E402
from transe_pyspark_spark.session import get_spark  # noqa: E402
from transe_pyspark_spark.sources.readers import load_table  # noqa: E402

K = 10
N_QUERIES = 20


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("ann-tradeoff")
    emb = load_table(spark, sf_dir, "embeddings").cache()
    n = emb.count()
    q = emb.filter(F.col("vec_id") < N_QUERIES)

    variants = {
        "exact (brute force)": lambda: S.knn_relational(q, emb, k=K),
        "LSH (5 tables)": lambda: S.ann_lsh(q, emb, k=K, num_hash_tables=5),
        "IVF (16 cells, probe 6)": lambda: S.ann_ivf(q, emb, k=K, n_cells=16, n_probe=6),
        "IVF-PQ (16c/6p, 8x64 codes, refine 16)": lambda: S.ann_ivf_pq(
            q, emb, k=K, n_cells=16, n_probe=6, m_subvectors=8, n_codes=64
        ),
    }

    results: dict[str, dict] = {}
    exact_pairs: set = set()
    for name, fn in variants.items():
        fn().count()  # warmup: codegen + model fits cached paths
        t0 = time.time()
        rows = fn().collect()
        dt = round(time.time() - t0, 3)
        pairs = {(r.query_id, r.neighbor_id) for r in rows}
        if not exact_pairs:
            exact_pairs = pairs
        recall = round(len(pairs & exact_pairs) / len(exact_pairs), 3)
        results[name] = {"sec": dt, "recall_at_k": recall}

    print(f"\n| Variant | Recall@{K} | Wall (s, {n} vecs, {N_QUERIES} queries) |")
    print("|---|---|---|")
    for name, r in results.items():
        print(f"| {name} | {r['recall_at_k']:.3f} | {r['sec']} |")
    print()
    print(json.dumps({"metric": "ann_tradeoff", "n_vectors": n, "k": K, "results": results}))


if __name__ == "__main__":
    main()
