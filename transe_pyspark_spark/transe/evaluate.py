"""Link-prediction evaluator (SURVEY §2B R22) — the reference's
``test.py`` rebuilt: Mean Rank & Hits@10 under the paper's *raw*
protocol.

Semantics parity (SURVEY §4 quirks 4-5): ranks are **0-based** (the
position in the distance argsort — so ``hits@10`` effectively counts
top-11) and candidates are **not** filtered against known-true triples.
Both head and tail are ranked per triple (``test.py:49-62``).

Execution: the entity/label matrices are broadcast once (vs 6
broadcasts in the reference, ``test.py:79-84``); test triples stream
through ``mapInPandas`` where a whole Arrow batch of triples is scored
against all V candidates in one BLAS call — the reference scores one
triple at a time (``test.py:49-58``). Metrics are a relational
aggregation over the returned rank column (SURVEY §2A A2/A3).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transe_pyspark_spark.transe.model import TransEModel

_RANK_SCHEMA = "h long, l long, t long, rank_head long, rank_tail long"


def rank_triples(
    spark: SparkSession,
    model: TransEModel,
    test_triples: DataFrame,
    distance: str = "L2",
    known_triples: DataFrame | None = None,
    filter_method: str = "relational",
) -> DataFrame:
    """Per-triple 0-based head/tail ranks against the full entity vocab.

    ``known_triples`` switches to the paper's **filtered** protocol
    (Bordes et al. §4, not implemented by the reference — it is
    raw-only, ``test.py:49-62``): candidate corruptions that are
    themselves known-true triples are excluded from the ranking, so a
    model isn't penalized for ranking another correct answer above the
    test one. Pass the union of train+valid+test triples.

    ``filter_method`` picks how the exclusion is applied:

    * ``"relational"`` (default, scale path): raw ranks from the
      broadcast kernel, then a per-(h,l)/(l,t) JOIN against
      ``known_triples`` computes how many known-true corruptions
      out-ranked the test triple and subtracts them. ``known_triples``
      is never collected — it stays a DataFrame however large the KG.
    * ``"broadcast"``: collect ``known_triples`` into driver-side
      dicts shipped with the model (fast for model-scale KGs like
      FB15k, unusable when the triple set is much larger than the
      model).
    """
    if known_triples is not None and filter_method == "relational":
        raw = rank_triples(spark, model, test_triples, distance)
        return _filtered_ranks_relational(spark, model, raw, known_triples, distance)

    sc = spark.sparkContext
    b_ent = sc.broadcast(model.entity)
    b_lab = sc.broadcast(model.label)
    use_l1 = distance == "L1"

    known_tails: dict[tuple[int, int], np.ndarray] = {}
    known_heads: dict[tuple[int, int], np.ndarray] = {}
    if known_triples is not None:
        tails_acc: dict[tuple[int, int], list[int]] = {}
        heads_acc: dict[tuple[int, int], list[int]] = {}
        for r in known_triples.select("h", "l", "t").collect():  # model-scale by contract
            tails_acc.setdefault((r.h, r.l), []).append(r.t)
            heads_acc.setdefault((r.l, r.t), []).append(r.h)
        known_tails = {k: np.asarray(v, np.int64) for k, v in tails_acc.items()}
        known_heads = {k: np.asarray(v, np.int64) for k, v in heads_acc.items()}
    b_ktails = sc.broadcast(known_tails)
    b_kheads = sc.broadcast(known_heads)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        E = b_ent.value  # (V, k)
        L = b_lab.value
        e_sq = (E * E).sum(axis=1)
        # bound peak memory: the B×V distance matrix (B×V×k for L1)
        # must stay ~hundreds of MB however large V or the Arrow batch
        V = E.shape[0]
        budget = 30_000_000 if not use_l1 else max(1, 30_000_000 // E.shape[1])
        rows_per_chunk = max(1, budget // max(V, 1))
        for whole in batches:
          for start in range(0, len(whole), rows_per_chunk):
            pdf = whole.iloc[start : start + rows_per_chunk]
            h = pdf["h"].to_numpy(np.int64)
            l = pdf["l"].to_numpy(np.int64)
            t = pdf["t"].to_numpy(np.int64)
            # tail ranking: d(h + l, e) for every candidate e
            q_tail = E[h] + L[l]  # (B, k)
            # head ranking: d(e + l, t) = d(e, t - l)
            q_head = E[t] - L[l]
            if use_l1:
                d_tail = np.abs(q_tail[:, None, :] - E[None, :, :]).sum(axis=2)
                d_head = np.abs(E[None, :, :] - q_head[:, None, :]).sum(axis=2)
            else:
                # squared L2 via ||q||² − 2qEᵀ + ||e||² (no sqrt — TransE.py:304-309)
                d_tail = (q_tail * q_tail).sum(axis=1)[:, None] - 2.0 * (q_tail @ E.T) + e_sq[None, :]
                d_head = (q_head * q_head).sum(axis=1)[:, None] - 2.0 * (q_head @ E.T) + e_sq[None, :]
            ktails, kheads = b_ktails.value, b_kheads.value
            if ktails or kheads:
                # filtered protocol: known-true corruptions (other than
                # the test triple itself) never outrank it
                for i in range(len(h)):
                    kt = ktails.get((int(h[i]), int(l[i])))
                    if kt is not None:
                        excl = kt[kt != t[i]]
                        d_tail[i, excl] = np.inf
                    kh = kheads.get((int(l[i]), int(t[i])))
                    if kh is not None:
                        excl = kh[kh != h[i]]
                        d_head[i, excl] = np.inf
            # 0-based rank = #candidates strictly closer (ties: stable
            # argsort order == candidate id order, so count equal-dist
            # candidates with smaller id)
            rows = np.arange(len(h))
            dt_true = d_tail[rows, t]
            dh_true = d_head[rows, h]
            rank_tail = (d_tail < dt_true[:, None]).sum(axis=1) + (
                (d_tail == dt_true[:, None]) & (np.arange(E.shape[0])[None, :] < t[:, None])
            ).sum(axis=1)
            rank_head = (d_head < dh_true[:, None]).sum(axis=1) + (
                (d_head == dh_true[:, None]) & (np.arange(E.shape[0])[None, :] < h[:, None])
            ).sum(axis=1)
            yield pd.DataFrame(
                {"h": h, "l": l, "t": t, "rank_head": rank_head, "rank_tail": rank_tail}
            )

    return test_triples.select("h", "l", "t").mapInPandas(score, schema=_RANK_SCHEMA)


def _model_vector_dfs(spark: SparkSession, model: TransEModel) -> tuple[DataFrame, DataFrame]:
    """Model matrices as (id, vec) DataFrames — model-sized (V·k, L·k),
    so they broadcast in the joins below."""
    ent = spark.createDataFrame(
        pd.DataFrame({"__eid": np.arange(model.entity.shape[0], dtype=np.int64),
                      "__evec": list(model.entity)})
    )
    lab = spark.createDataFrame(
        pd.DataFrame({"__lid": np.arange(model.label.shape[0], dtype=np.int64),
                      "__lvec": list(model.label)})
    )
    return ent, lab


def _filtered_ranks_relational(
    spark: SparkSession,
    model: TransEModel,
    raw_ranks: DataFrame,
    known_triples: DataFrame,
    distance: str,
) -> DataFrame:
    """Filtered-protocol ranks without collecting ``known_triples``.

    filtered_rank = raw_rank − #{known-true corruptions that out-rank
    the test triple}. The subtrahend is a join: test triples match
    known triples on (h,l) for tail corruption / (l,t) for head
    corruption, the corruption's distance comes from a broadcast join
    against the model-sized vector tables, and "out-ranks" uses the raw
    kernel's tie RULE (strictly closer, or equal-distance with a
    smaller candidate id) — but not its exact ROUNDING: raw ranks come
    from the kernel's expanded BLAS form (‖q‖²−2qEᵀ+‖e‖²) while this
    path computes distances elementwise, and the two can disagree
    within ~1 ulp of d_true. This path is therefore TIE-APPROXIMATE
    relative to ``filter_method="broadcast"``: a corruption landing
    exactly on the float boundary may shift a filtered rank by ±1
    (head-to-head equivalence on non-adversarial models is pytest-
    gated by ``test_filtered_relational_matches_broadcast``). Bit-exact parity
    across the two formulas is not achievable anyway — BLAS block
    summation order differs from any per-element fold.
    One shuffle per side (the groupBy), and the
    known-triple table is only ever shuffled on its join keys — this is
    the 100 TB-KG shape; the driver-dict path is the model-scale
    shortcut."""
    from transe_pyspark_spark.functions import vector as V

    dist_fn = V.l1 if distance == "L1" else V.l2_sq
    ent, lab = _model_vector_dfs(spark, model)
    known = known_triples.select("h", "l", "t").distinct()

    # one row per test triple with the true triple's distance
    test = (
        raw_ranks.select("h", "l", "t")
        .join(F.broadcast(ent.select(F.col("__eid").alias("h"), F.col("__evec").alias("__hv"))), "h")
        .join(F.broadcast(lab.select(F.col("__lid").alias("l"), F.col("__lvec").alias("__lv"))), "l")
        .join(F.broadcast(ent.select(F.col("__eid").alias("t"), F.col("__evec").alias("__tv"))), "t")
        .select("h", "l", "t", dist_fn(V.add("__hv", "__lv"), F.col("__tv")).alias("__d_true"),
                "__hv", "__lv", "__tv")
    )

    # tail side: known (h, l, t') with t' ≠ t that out-rank the true tail
    kt = known.select("h", "l", F.col("t").alias("__cand"))
    adj_tail = (
        test.join(kt, ["h", "l"])
        .filter(F.col("__cand") != F.col("t"))
        .join(F.broadcast(ent.select(F.col("__eid").alias("__cand"), F.col("__evec").alias("__cv"))), "__cand")
        .withColumn("__d", dist_fn(V.add("__hv", "__lv"), F.col("__cv")))
        .filter(
            (F.col("__d") < F.col("__d_true"))
            | ((F.col("__d") == F.col("__d_true")) & (F.col("__cand") < F.col("t")))
        )
        .groupBy("h", "l", "t")
        .agg(F.count(F.lit(1)).alias("__adj_tail"))
    )

    # head side: known (h', l, t) with h' ≠ h; d(e_h' + l, t)
    kh = known.select(F.col("h").alias("__cand"), "l", "t")
    adj_head = (
        test.join(kh, ["l", "t"])
        .filter(F.col("__cand") != F.col("h"))
        .join(F.broadcast(ent.select(F.col("__eid").alias("__cand"), F.col("__evec").alias("__cv"))), "__cand")
        .withColumn("__d", dist_fn(V.add("__cv", "__lv"), F.col("__tv")))
        .filter(
            (F.col("__d") < F.col("__d_true"))
            | ((F.col("__d") == F.col("__d_true")) & (F.col("__cand") < F.col("h")))
        )
        .groupBy("h", "l", "t")
        .agg(F.count(F.lit(1)).alias("__adj_head"))
    )

    return (
        raw_ranks.join(adj_tail, ["h", "l", "t"], "left")
        .join(adj_head, ["h", "l", "t"], "left")
        .select(
            "h", "l", "t",
            (F.col("rank_head") - F.coalesce("__adj_head", F.lit(0))).cast("long").alias("rank_head"),
            (F.col("rank_tail") - F.coalesce("__adj_tail", F.lit(0))).cast("long").alias("rank_tail"),
        )
    )


def _replay_progress(ranks: DataFrame, every: int, hits_k: int, emit) -> np.ndarray:
    """Driver-side replay of the reference's progress loop
    (``test.py:64-68``): per test triple append head then tail rank;
    after triples 1, ``every``+1, 2·``every``+1, … print the running
    mean, hits·100, and the 0-based triple index. Returns the full
    flat rank array (head, tail interleaved) for final metrics."""
    # test-set-sized by CONTRACT (r12 verdict watch item): the link-
    # prediction protocol evaluates a held-out test set, which is
    # thousands-to-millions of (h,l,t) rows — two doubles each — never
    # corpus-sized. If a caller ever feeds a corpus-scale frame here,
    # the right fix is aggregating the running means distributively,
    # not raising this collect's ceiling.
    rows = ranks.orderBy("h", "l", "t").collect()
    flat = np.empty(2 * len(rows), dtype=np.float64)
    for i, r in enumerate(rows):
        flat[2 * i] = r.rank_head
        flat[2 * i + 1] = r.rank_tail
        if i % every == 0:
            so_far = flat[: 2 * (i + 1)]
            emit(f"Mean: {so_far.mean()}")
            emit(f"Hit: {(so_far <= hits_k).mean() * 100}")
            emit(f"{i}")
    return flat


def evaluate_link_prediction(
    spark: SparkSession,
    model: TransEModel,
    test_triples: DataFrame,
    distance: str = "L2",
    hits_k: int = 10,
    known_triples: DataFrame | None = None,
    filter_method: str = "relational",
    progress_every: int | None = None,
    progress_fn=None,
) -> dict[str, float]:
    """Mean Rank + Hits@k over head and tail ranks combined — the
    reference's ``calculate_rankings`` (``test.py:14-25``) as one
    aggregation (``rank <= k``: the 0-based top-(k+1) quirk, preserved).
    ``known_triples`` selects the paper's filtered protocol.

    ``progress_every`` reproduces the reference's live running metrics
    (``test.py:64-68``: running Mean / Hit·100 / triple index every 50
    triples). Ranks are still computed distributed; the replay is a
    driver-side pass over the (test-set-sized) result in deterministic
    (h, l, t) order — the reference's sequential-scan UX without
    serializing the scoring. ``progress_fn`` overrides ``print``."""
    ranks = rank_triples(spark, model, test_triples, distance, known_triples, filter_method)
    if progress_every:
        # the replay collects the ranks anyway, so final metrics come
        # from the same collected array instead of re-running the kernel
        r = _replay_progress(ranks, progress_every, hits_k, progress_fn or print)
        return {
            "mean_rank": float(r.mean()),
            f"hits_at_{hits_k}": float((r <= hits_k).mean()),
            "mrr": float((1.0 / (r + 1)).mean()),
            "hits_at_1": float((r <= 1).mean()),
            "hits_at_3": float((r <= 3).mean()),
        }
    both = ranks.select(F.col("rank_head").alias("rank")).unionAll(
        ranks.select(F.col("rank_tail").alias("rank"))
    )
    row = both.agg(
        F.avg("rank").alias("mean_rank"),
        F.avg(F.when(F.col("rank") <= hits_k, 1.0).otherwise(0.0)).alias("hits"),
        # standard KG-completion extras (beyond the reference's two):
        # MRR over 1-based ranks, hits@1/@3 with the same 0-based quirk
        F.avg(1.0 / (F.col("rank") + 1)).alias("mrr"),
        F.avg(F.when(F.col("rank") <= 1, 1.0).otherwise(0.0)).alias("h1"),
        F.avg(F.when(F.col("rank") <= 3, 1.0).otherwise(0.0)).alias("h3"),
    ).collect()[0]
    return {
        "mean_rank": float(row.mean_rank),
        f"hits_at_{hits_k}": float(row.hits),
        "mrr": float(row.mrr),
        "hits_at_1": float(row.h1),
        "hits_at_3": float(row.h3),
    }
