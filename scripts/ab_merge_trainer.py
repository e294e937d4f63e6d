"""A/B of the `_merge_updates` scatter rewrite (r15 opt): old
(concatenate + np.add.at) vs new (per-frame unique-id fancy add).

Identity is proven at the FUNCTION level: during a real
`TransETrainer.fit` at the bench shape, every collected updates frame
is captured, and old/new merges are replayed on each frame from the
same starting matrices — asserted BITWISE identical (the rewrite
preserves per-id add order). Whole-run loss comparison is deliberately
NOT the bar: `fit` is not run-to-run deterministic on unchanged code —
`orderBy(F.rand(seed))`'s range-sort boundaries vary across runs, so
`sample()` draws a slightly different batch each fit (measured: batch
checksum and count differ run-to-run with identical seeds; inherited
behavior, reference TransE.py:88 shuffles unseeded).

Timing compares ONLY the merge phase, ABBA-interleaved fits in one
session (kernel_collect is unaffected by the change and host-noisy).

Usage: python scripts/ab_merge_trainer.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transe_pyspark_spark.session import get_spark  # noqa: E402
import transe_pyspark_spark.transe.train as T  # noqa: E402

NEW_MERGE = T._merge_updates


def old_merge(updates, entity, label, merge):
    """The pre-r15-opt implementation, verbatim."""
    loss = 0.0
    for blob in updates.loc[updates["kind"] == "__loss__", "data"]:
        loss += float(np.frombuffer(blob, dtype=np.float64)[0])
    for kind, store in (("entity", entity), ("label", label)):
        sub = updates[updates["kind"] == kind]
        if len(sub) == 0:
            continue
        dim = store.shape[1]
        parts = [
            (np.asarray(r, dtype=np.int64),
             np.frombuffer(b, dtype=np.float64).reshape(-1, dim))
            for r, b in zip(sub["ids"], sub["data"]) if len(r)
        ]
        if not parts:
            continue
        ids = np.concatenate([p[0] for p in parts])
        mat = np.concatenate([p[1] for p in parts])
        if merge == "last":
            store[ids] = mat
        else:
            if len(ids) * 4 >= store.shape[0]:
                acc = np.zeros_like(store)
                np.add.at(acc, ids, mat)
                counts = np.bincount(ids, minlength=store.shape[0])
                touched = counts > 0
                store[touched] = acc[touched] / counts[touched, None]
            else:
                uniq, inv = np.unique(ids, return_inverse=True)
                acc = np.zeros((uniq.size, dim), dtype=store.dtype)
                np.add.at(acc, inv, mat)
                counts = np.bincount(inv, minlength=uniq.size)
                store[uniq] = acc / counts[:, None]
    return loss


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("ab_merge")
    V, L, N, K = 14541, 237, 483142, 50
    rng = np.random.default_rng(42)
    pdf = pd.DataFrame({
        "h": rng.integers(0, V, N), "l": rng.integers(0, L, N),
        "t": rng.integers(0, V, N),
    })
    triples = spark.createDataFrame(pdf).repartition(32)
    triples.count()  # warm

    # ---- identity: capture real updates frames from one fit, replay both
    captured: list[pd.DataFrame] = []

    def capturing_merge(updates, entity, label, merge):
        captured.append(updates)
        return NEW_MERGE(updates, entity, label, merge)

    # try/finally (ADVICE r15): an exception mid-capture must not leave
    # the module patched with the capturing shim
    T._merge_updates = capturing_merge
    try:
        tr = T.TransETrainer(k=K, n_epochs=2, n_batches=2, learning_rate=0.01, seed=1)
        tr.fit(spark, triples, n_entities=V, n_labels=L)
    finally:
        T._merge_updates = NEW_MERGE
    base_e = np.asarray(
        np.random.default_rng(5).standard_normal((V, K)), dtype=np.float64)
    base_l = np.asarray(
        np.random.default_rng(6).standard_normal((L, K)), dtype=np.float64)
    for i, upd in enumerate(captured):
        for mode in ("mean", "last"):
            e_o, l_o = base_e.copy(), base_l.copy()
            e_n, l_n = base_e.copy(), base_l.copy()
            loss_o = old_merge(upd, e_o, l_o, mode)
            loss_n = NEW_MERGE(upd, e_n, l_n, mode)
            assert loss_o == loss_n, f"loss mismatch frame {i} {mode}"
            assert np.array_equal(e_o, e_n), f"entity drift frame {i} {mode}"
            assert np.array_equal(l_o, l_n), f"label drift frame {i} {mode}"
    print(f"IDENTITY OK: {len(captured)} real updates frames, "
          "old/new bitwise equal (mean and last)", flush=True)

    # ---- timing: ABBA fits, merge phase only
    # try/finally (ADVICE r15): a failed timing fit must restore the
    # real merge before the module is reused
    try:
        for r in range(rounds):
            order = ("old", "new") if r % 2 == 0 else ("new", "old")
            for variant in order:
                T._merge_updates = old_merge if variant == "old" else NEW_MERGE
                tr = T.TransETrainer(k=K, n_epochs=4, n_batches=2,
                                     learning_rate=0.01, seed=1)
                t0 = time.time()
                tr.fit(spark, triples, n_entities=V, n_labels=L)
                wall = time.time() - t0
                ph = {k: round(v, 3) for k, v in tr.phase_times.items()}
                n_merges = 4 * 2
                print(f"round {r} {variant}: merge/call="
                      f"{ph['merge'] / n_merges:.4f}s phases={ph} "
                      f"epochs={[round(t, 3) for t in tr.epoch_times]} "
                      f"wall={wall:.2f}", flush=True)
    finally:
        T._merge_updates = NEW_MERGE
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
