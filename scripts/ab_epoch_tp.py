"""Interleaved A/B of TransETrainer.train_partitions at the bench shape
(r16 optimization round).

r15 A/B'd tp ∈ {8, 16, 32} and found epoch time MONOTONE in tp (8 best)
— transport (~tp × V×k×8 B per batch) plus per-task scheduling dominate
the kernel's 0.185 s/task compute. This probes BELOW the incumbent:
tp ∈ {8, 4, 2}, ABBA-interleaved in one session so host drift hits all
arms equally. Reports per-fit epoch medians and phase splits.

Usage: python scripts/ab_epoch_tp.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transe_pyspark_spark.session import get_spark  # noqa: E402
from transe_pyspark_spark.transe.train import TransETrainer  # noqa: E402


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    arms = [int(a) for a in (sys.argv[2].split(",") if len(sys.argv) > 2 else ("8", "4", "2"))]
    spark = get_spark("ab_epoch_tp")
    V, L, N, K = 14541, 237, 483142, 50
    rng = np.random.default_rng(42)
    pdf = pd.DataFrame(
        {"h": rng.integers(0, V, N), "l": rng.integers(0, L, N), "t": rng.integers(0, V, N)}
    )
    triples = spark.createDataFrame(pdf).repartition(32)
    triples.count()  # warm

    for r in range(rounds):
        order = arms if r % 2 == 0 else list(reversed(arms))
        for tp in order:
            tr = TransETrainer(
                k=K, n_epochs=4, n_batches=2, learning_rate=0.01, seed=1,
                train_partitions=tp,
            )
            t0 = time.time()
            tr.fit(spark, triples, n_entities=V, n_labels=L)
            wall = time.time() - t0
            later = sorted(tr.epoch_times[1:])
            med = later[len(later) // 2]
            ph = {k: round(v, 3) for k, v in tr.phase_times.items()}
            print(
                f"round {r} tp={tp}: epoch_med={med:.3f}s "
                f"epochs={[round(t, 3) for t in tr.epoch_times]} "
                f"phases={ph} wall={wall:.2f}",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
