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
) -> DataFrame:
    """Per-triple 0-based head/tail ranks against the full entity vocab."""
    sc = spark.sparkContext
    b_ent = sc.broadcast(model.entity)
    b_lab = sc.broadcast(model.label)
    use_l1 = distance == "L1"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        E = b_ent.value  # (V, k)
        L = b_lab.value
        e_sq = (E * E).sum(axis=1)
        for pdf in batches:
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


def evaluate_link_prediction(
    spark: SparkSession,
    model: TransEModel,
    test_triples: DataFrame,
    distance: str = "L2",
    hits_k: int = 10,
) -> dict[str, float]:
    """Mean Rank + Hits@k over head and tail ranks combined — the
    reference's ``calculate_rankings`` (``test.py:14-25``) as one
    aggregation (``rank <= k``: the 0-based top-(k+1) quirk, preserved)."""
    ranks = rank_triples(spark, model, test_triples, distance)
    both = ranks.select(F.col("rank_head").alias("rank")).unionAll(
        ranks.select(F.col("rank_tail").alias("rank"))
    )
    row = both.agg(
        F.avg("rank").alias("mean_rank"),
        F.avg(F.when(F.col("rank") <= hits_k, 1.0).otherwise(0.0)).alias("hits"),
    ).collect()[0]
    return {"mean_rank": float(row.mean_rank), f"hits_at_{hits_k}": float(row.hits)}
