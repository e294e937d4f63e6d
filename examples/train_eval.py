"""End-to-end TransE workflow — the rebuild of the reference's
``example.py`` + ``test.py`` entry points (reference
``example.py:20-43``, ``test.py:100-126``).

Reference flow: load TSV → build vocab (driver dicts) → TransE.fit →
pickle checkpoints → separate eval run restoring pickles. Here: one
DataFrame pipeline, parquet checkpoints, shared vocabulary (which
removes the reference's O(V) test-id remap, ``utils.py:31-32``).

Usage:
    python examples/train_eval.py <train.tsv> [test.tsv] [--distance L1|L2]
                                  [--epochs N] [--k D] [--checkpoint DIR]

With no arguments, generates a small synthetic KG so the script is
runnable out of the box.
"""

from __future__ import annotations

import argparse
import sys
import tempfile

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("train_tsv", nargs="?", default=None)
    ap.add_argument("test_tsv", nargs="?", default=None)
    ap.add_argument("--distance", choices=["L1", "L2"], default="L2")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batches", type=int, default=2)  # example.py:33 n_batches=2
    ap.add_argument("--k", type=int, default=50)  # example.py:36 latent dim
    ap.add_argument("--lr", type=float, default=0.01)  # example.py:35
    ap.add_argument("--margin", type=float, default=1.0)  # example.py:34
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()

    from transe_pyspark_spark.session import get_spark
    from transe_pyspark_spark.transe.data import build_vocab, encode_triples, filter_seen, load_triples
    from transe_pyspark_spark.transe.evaluate import evaluate_link_prediction
    from transe_pyspark_spark.transe.model import TransEModel
    from transe_pyspark_spark.transe.train import TransETrainer

    spark = get_spark("transe-example")

    if args.train_tsv is None:
        import numpy as np

        rng = np.random.default_rng(args.seed)
        lines = sorted(
            {
                f"e{rng.integers(0, 80)}\tr{rng.integers(0, 8)}\te{rng.integers(0, 80)}"
                for _ in range(1200)
            }
        )
        tmp = tempfile.mkdtemp(prefix="kg_")
        args.train_tsv = f"{tmp}/train.tsv"
        with open(args.train_tsv, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"[example] synthetic KG: {len(lines)} triples -> {args.train_tsv}")

    # --- ingestion & encoding (reference utils.load_dataset, zero collects)
    raw = load_triples(spark, args.train_tsv)
    entity_vocab, label_vocab = build_vocab(raw)
    train = encode_triples(raw, entity_vocab, label_vocab).cache()
    n_ent, n_lab = entity_vocab.count(), label_vocab.count()
    print(f"[example] {train.count()} train triples, V={n_ent} entities, L={n_lab} labels")

    # --- training (reference TransE.fit)
    trainer = TransETrainer(
        k=args.k,
        n_epochs=args.epochs,
        n_batches=args.batches,
        learning_rate=args.lr,
        margin=args.margin,
        distance=args.distance,
        seed=args.seed,
        checkpoint_dir=args.checkpoint,
    )
    model = trainer.fit(spark, train, n_ent, n_lab)
    print(f"[example] loss first->last: {trainer.loss_history[0]:.1f} -> {trainer.loss_history[-1]:.1f}")

    if args.checkpoint:
        model.checkpoint(spark, f"{args.checkpoint}/final")
        model = TransEModel.restore(spark, f"{args.checkpoint}/final")  # warm-start parity

    # --- evaluation (reference test.py; raw protocol, 0-based ranks)
    if args.test_tsv:
        test_raw = filter_seen(load_triples(spark, args.test_tsv), entity_vocab, label_vocab)
        test = encode_triples(test_raw, entity_vocab, label_vocab)
    else:
        test = train.sample(False, min(1.0, 200 / max(train.count(), 1)), seed=args.seed)
    metrics = evaluate_link_prediction(spark, model, test, distance=args.distance)
    print(f"[example] Mean Rank = {metrics['mean_rank']:.2f}  Hits@10 = {metrics['hits_at_10'] * 100:.2f}%")


if __name__ == "__main__":
    main()
