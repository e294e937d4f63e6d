"""Relational TransE trainer — the beyond-broadcastable-model path
(SURVEY §7 "scale posture").

The broadcast trainer (``transe.train``) holds the model as driver
NumPy and broadcasts it per batch — correct while V×k doubles fit in
RAM (GBs). Past that, the model itself must be distributed. Here the
embedding tables are DataFrames ``[id, vec: array<double>]`` and each
reference dataflow becomes its relational form:

* embedding gather (ref ``TransE.py:190-206``, a broadcast-dict
  lookup)            → equi-joins triples ⨝ embeddings on id
* negative-sample rejection (``TransE.py:237-244``, a loop over a
  broadcast set)     → left-anti join against the trainset, iterated
* gradient kernel (``TransE.py:313-369``)
                     → Catalyst higher-order-function expressions
* update merge (``TransE.py:159-170``, driver dict overwrite)
                     → explode per-triple contributions → groupBy(id)
                       grouped-agg SUM (order-free, distributed —
                       exact minibatch SGD; a mean would shrink the
                       effective learning rate by each id's degree)
* entity renorm (``TransE.py:214-217``) → HOF normalize on update

No driver round-trip of model state anywhere in the loop; per-batch
lineage is truncated with ``localCheckpoint`` so the plan doesn't grow
with epochs. The five per-role embedding gathers are FUSED into one
join: each triple row melts to five ``(role, kind, id)`` rows, joins
the union-of-embedding-tables once on ``(kind, id)``, and pivots back
to one row per triple via ``map_from_entries(collect_list(...))``.
Shuffle per batch = 1 melted gather join + 1 pivot-back aggregation +
1 delta aggregation + 1 update join, all hash-partitioned on id —
exactly the joins a 1000-executor cluster distributes; nothing is
sized by V on any single node, and the shuffled vector volume is ~5N
vectors per batch versus ~9N for the unfused five-join chain (each
successive join re-shuffled every vector already attached).

Trade-off: per-epoch latency is much higher than the broadcast path at
small V (joins vs one broadcast), so selection is by model size; the
API mirrors ``TransETrainer`` and small models can ``to_local()`` the
result for the evaluator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transe_pyspark_spark.functions import vector as V
from transe_pyspark_spark.transe.model import TransEModel, l2_normalize_rows


class RelationalTransETrainer:
    """Same hyperparameter surface as ``TransETrainer``; model state is
    a pair of DataFrames instead of driver ndarrays."""

    def __init__(
        self,
        k: int = 50,
        n_epochs: int = 5,
        n_batches: int = 1,
        learning_rate: float = 0.01,
        margin: float = 1.0,
        distance: str = "L2",
        seed: int = 42,
        reject_rounds: int = 3,
    ):
        assert distance in ("L1", "L2")
        self.k = k
        self.n_epochs = n_epochs
        self.n_batches = n_batches
        self.learning_rate = learning_rate
        self.margin = margin
        self.distance = distance
        self.seed = seed
        #: corruption rejection is an anti-join loop; after this many
        #: rounds the still-colliding triples (P ≈ (N/V²)^rounds) are
        #: dropped from the batch rather than looping unboundedly.
        self.reject_rounds = reject_rounds
        self.loss_history: list[float] = []
        self.epoch_times: list[float] = []

    # ------------------------------------------------------------------
    def _init_embeddings(
        self, spark: SparkSession, n: int, k: int, seed: int, normalize: bool
    ) -> DataFrame:
        """Seeded Xavier init, distributed end-to-end: ``spark.range(n)``
        partitions the id space across executors and a ``mapInPandas``
        pass draws each row's U(−6/√k, 6/√k) vector from
        ``default_rng([seed, id])`` — the per-row SeedSequence makes
        the draw a pure function of (seed, id), so the table is
        IDENTICAL under any partitioning, task retry, or executor
        count (``test_relational_init_deterministic``), and no V×k
        matrix ever materializes on the driver (the round-1 init built
        the full matrix driver-side; at V=10⁹, k=100 that's 800 GB)."""
        bound = 6.0 / np.sqrt(k)

        def gen(batches):
            for pdf in batches:
                ids = pdf["id"].to_numpy(dtype=np.int64)
                mat = np.empty((len(ids), k), dtype=np.float64)
                for i, ident in enumerate(ids):
                    rng = np.random.default_rng([seed, int(ident)])
                    mat[i] = rng.uniform(-bound, bound, k)
                if normalize:
                    mat = l2_normalize_rows(mat)
                yield pd.DataFrame({"id": ids, "vec": list(map(list, mat))})

        return (
            spark.range(n)
            .repartition(8, "id")
            .mapInPandas(gen, "id long, vec array<double>")
        )

    def _corrupt(self, batch: DataFrame, train: DataFrame, n_entities: int, seed: int) -> DataFrame:
        """Head-or-tail corruption with anti-join rejection (relational
        F2). Each round: sample replacements for the still-colliding
        triples, anti-join against the trainset.

        The loop is fully LAZY — no per-round ``isEmpty()`` driver job
        (r03 profile: each one forced the whole semi-join chain eagerly,
        3 extra jobs per batch). After ``reject_rounds`` rounds the
        still-colliding remainder is dropped from the batch: at
        collision probability p ≈ N/V² per candidate, the dropped
        fraction is p^rounds (FB15k shape: (2.3e-3)³ ≈ 1e-8 of rows)."""
        good = None
        pending = batch
        t2 = train.select(
            F.col("h").alias("__th"), F.col("l").alias("__tl"), F.col("t").alias("__tt")
        )
        for rnd in range(self.reject_rounds):
            s = seed * 7919 + rnd
            cand = (F.rand(s + 1) * n_entities).cast("long")
            c = (
                pending.withColumn("__head", F.rand(s) < 0.5)
                .withColumn("ch", F.when(F.col("__head"), cand).otherwise(F.col("h")))
                .withColumn("ct", F.when(F.col("__head"), F.col("t")).otherwise(cand))
                .drop("__head")
            )
            cond = (
                (F.col("ch") == F.col("__th"))
                & (F.col("l") == F.col("__tl"))
                & (F.col("ct") == F.col("__tt"))
            )
            ok = c.join(t2, cond, "left_anti")
            good = ok if good is None else good.unionByName(ok)
            if rnd < self.reject_rounds - 1:
                pending = c.join(t2, cond, "left_semi").select("h", "l", "t")
        return good

    def fit(
        self,
        spark: SparkSession,
        triples: DataFrame,
        n_entities: int,
        n_labels: int,
    ) -> tuple[DataFrame, DataFrame]:
        """Returns (entity_df, label_df) as [id, vec] DataFrames."""
        import time as _time

        lr, margin = self.learning_rate, self.margin
        dist_fn = V.l1 if self.distance == "L1" else V.l2_sq

        train = triples.select("h", "l", "t").cache()
        ent = self._init_embeddings(spark, n_entities, self.k, self.seed, normalize=True)
        lab = self._init_embeddings(spark, n_labels, self.k, self.seed + 1, normalize=True)
        ent = ent.localCheckpoint()
        lab = lab.localCheckpoint()

        fraction = 1.0 / self.n_batches
        for epoch in range(self.n_epochs):
            _t0 = _time.time()
            epoch_loss = 0.0
            for batch_i in range(self.n_batches):
                step_seed = self.seed * 1_000_003 + epoch * self.n_batches + batch_i
                batch = train.sample(False, fraction, seed=step_seed)
                c = self._corrupt(batch, train, n_entities, step_seed)

                # Fused gather (J2 relational): melt each triple to five
                # (role, kind, id) rows, join the union of both embedding
                # tables ONCE on (kind, id), pivot back per triple. One
                # gather shuffle instead of five; __rid preserves
                # duplicate-triple multiplicity through the pivot groupBy.
                roles = [("__hv", "e", "h"), ("__tv", "e", "t"),
                         ("__chv", "e", "ch"), ("__ctv", "e", "ct"),
                         ("__lv", "l", "l")]
                melted = (
                    c.withColumn("__rid", F.monotonically_increasing_id())
                    .select(
                        "__rid", "h", "l", "t", "ch", "ct",
                        F.explode(F.array(*[
                            F.struct(
                                F.lit(role).alias("__role"),
                                F.lit(kind).alias("__kind"),
                                F.col(src).alias("__id"),
                            )
                            for role, kind, src in roles
                        ])).alias("__r"),
                    )
                    .select("__rid", "h", "l", "t", "ch", "ct",
                            "__r.__role", "__r.__kind", "__r.__id")
                )
                emb = ent.select(
                    F.lit("e").alias("__kind"), F.col("id").alias("__id"), "vec"
                ).unionByName(
                    lab.select(F.lit("l").alias("__kind"), F.col("id").alias("__id"), "vec")
                )
                g = (
                    melted.join(emb, ["__kind", "__id"])
                    .groupBy("__rid", "h", "l", "t", "ch", "ct")
                    .agg(F.map_from_entries(
                        F.collect_list(F.struct("__role", "vec"))
                    ).alias("__m"))
                    .select(
                        "h", "l", "t", "ch", "ct",
                        *[F.col("__m")[role].alias(role) for role, _, _ in roles],
                    )
                )

                pos = V.add("__hv", "__lv")
                scored = g.select(
                    "h", "l", "t", "ch", "ct", "__hv", "__lv", "__tv", "__chv", "__ctv",
                    dist_fn(pos, F.col("__tv")).alias("__dp"),
                    dist_fn(V.add("__chv", "__lv"), F.col("__ctv")).alias("__dn"),
                ).withColumn("__viol", margin + F.col("__dp") - F.col("__dn") > 0)

                # One gather per batch: the violating rows feed both the
                # loss scalar and the gradient pass, so persist them
                # instead of recomputing the melt-join-pivot twice.
                viol = scored.filter("__viol").persist()
                loss_row = viol.agg(
                    F.sum(margin + F.col("__dp") - F.col("__dn")).alias("loss")
                ).collect()[0]
                epoch_loss += float(loss_row.loss or 0.0)
                # gradient g = 2(t−h−l) (or sign for L1); corrupted uses −g' (M5)
                grad = V.sub(V.sub("__tv", "__hv"), F.col("__lv"))
                gradc = V.sub(V.sub("__ctv", "__chv"), F.col("__lv"))
                if self.distance == "L1":
                    sgn = lambda col: F.transform(col, lambda x: F.when(x >= 0, 1.0).otherwise(-1.0))
                    gpos, gneg = sgn(grad), sgn(gradc)
                else:
                    gpos = F.transform(grad, lambda x: 2.0 * x)
                    gneg = F.transform(gradc, lambda x: 2.0 * x)

                scale = lambda col, s: F.transform(col, lambda x: x * s)
                contrib = viol.select(
                    F.explode(
                        F.array(
                            F.struct(F.col("h").alias("id"), F.lit("e").alias("kind"), scale(gpos, lr).alias("delta")),
                            F.struct(F.col("t").alias("id"), F.lit("e").alias("kind"), scale(gpos, -lr).alias("delta")),
                            F.struct(F.col("ch").alias("id"), F.lit("e").alias("kind"), scale(gneg, -lr).alias("delta")),
                            F.struct(F.col("ct").alias("id"), F.lit("e").alias("kind"), scale(gneg, lr).alias("delta")),
                            F.struct(F.col("l").alias("id"), F.lit("l").alias("kind"), F.zip_with(scale(gpos, lr), scale(gneg, -lr), lambda a, b: a + b).alias("delta")),
                        )
                    ).alias("c")
                ).select("c.id", "c.kind", "c.delta")

                # X3 relational: order-free grouped SUM of deltas —
                # minibatch SGD exactly (the per-partition kernel also
                # accumulates, not averages, within a partition).
                # The sum runs SCALAR-WISE: posexplode each delta to
                # (id, kind, pos, val) and hash-agg the doubles. Unlike
                # a grouped-agg pandas UDF over array cells (the r03
                # shape: no partial aggregation, every raw vector row
                # shuffles, then Arrow → Python per group), scalar SUM
                # gets whole-stage codegen + map-side combine, so each
                # task ships at most |touched ids|×k partial sums
                # regardless of batch size — the same reduction a
                # 1000-executor cluster relies on. Vectors re-assemble
                # with array_sort(collect_list(struct(pos,val))).
                flat = contrib.select(
                    "id", "kind", F.posexplode("delta").alias("pos", "val")
                )
                deltas = (
                    flat.groupBy("id", "kind", "pos")
                    .agg(F.sum("val").alias("val"))
                    .groupBy("id", "kind")
                    .agg(
                        F.transform(
                            F.array_sort(F.collect_list(F.struct("pos", "val"))),
                            lambda s: s["val"],
                        ).alias("delta")
                    )
                    .persist()
                )

                e_delta = deltas.filter(F.col("kind") == "e").select("id", "delta")
                l_delta = deltas.filter(F.col("kind") == "l").select("id", "delta")
                upd = V.add  # elementwise add
                new_ent = (
                    ent.join(e_delta, "id", "left")
                    .select(
                        "id",
                        F.when(F.col("delta").isNull(), F.col("vec"))
                        .otherwise(V.normalize(upd("vec", "delta")))  # per-touch renorm, M2
                        .alias("vec"),
                    )
                )
                new_lab = (
                    lab.join(l_delta, "id", "left")
                    .select(
                        "id",
                        F.when(F.col("delta").isNull(), F.col("vec"))
                        .otherwise(upd("vec", "delta"))  # labels: no renorm (quirk 3)
                        .alias("vec"),
                    )
                )
                # truncate lineage: the loop must not grow the plan
                ent = new_ent.localCheckpoint()
                lab = new_lab.localCheckpoint()
                viol.unpersist()
                deltas.unpersist()
            self.loss_history.append(epoch_loss)
            self.epoch_times.append(_time.time() - _t0)
        train.unpersist()
        return ent, lab

    @staticmethod
    def to_local(ent: DataFrame, lab: DataFrame) -> TransEModel:
        """Materialize a (small) distributed model for the evaluator."""
        e = {r["id"]: r["vec"] for r in ent.collect()}
        l = {r["id"]: r["vec"] for r in lab.collect()}
        entity = np.array([e[i] for i in range(len(e))], dtype=np.float64)
        label = np.array([l[i] for i in range(len(l))], dtype=np.float64)
        return TransEModel(entity, label)
