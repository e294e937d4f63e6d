"""Model state: entity/label embedding matrices.

The reference wraps a dense float64 ndarray in an ``Embedding`` class
(``TransEmodule/Embedding.py:3-27``) held on the driver (parameter-
server pattern, ``TransE.py:30-39``). We keep the driver-held ndarray —
it is the correct representation while V×k doubles fit in memory
(FB15k-237: ~6 MB) — plus Parquet (de)serialization to a
``[id, kind, vec]`` DataFrame for checkpoints (replacing the pickle
sink at ``utils.py:44-49``) and for the relational scale-out path.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBEDDING_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("vec", T.ArrayType(T.DoubleType()), False),
    ]
)


def xavier_uniform(n: int, k: int, rng: np.random.Generator) -> np.ndarray:
    """U(−6/√k, +6/√k) init per the TransE paper (reference
    ``Embedding.py:9``, bounds at ``TransE.py:45-57``)."""
    bound = 6.0 / np.sqrt(k)
    return rng.uniform(-bound, bound, size=(n, k))


def l2_normalize_rows(mat: np.ndarray) -> np.ndarray:
    """Row-wise v/‖v‖₂ (reference ``Embedding.py:21-27``)."""
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


class TransEModel:
    """Driver-held embedding matrices + checkpoint IO.

    Renorm schedule parity (SURVEY §4 quirk 3): labels are L2-normalized
    exactly once at init (``TransE.py:60``); entities are renormalized
    on every touch during training and once pre-loop (``TransE.py:97,
    214-217``).
    """

    def __init__(self, entity: np.ndarray, label: np.ndarray):
        self.entity = entity
        self.label = label

    @classmethod
    def init_random(cls, n_entities: int, n_labels: int, k: int, seed: int = 42) -> "TransEModel":
        rng = np.random.default_rng(seed)
        entity = xavier_uniform(n_entities, k, rng)
        label = l2_normalize_rows(xavier_uniform(n_labels, k, rng))
        return cls(entity, label)

    @property
    def k(self) -> int:
        return self.entity.shape[1]

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [(int(i), "entity", v.tolist()) for i, v in enumerate(self.entity)] + [
            (int(i), "label", v.tolist()) for i, v in enumerate(self.label)
        ]
        return spark.createDataFrame(rows, EMBEDDING_SCHEMA)

    @classmethod
    def from_df(cls, df: DataFrame) -> "TransEModel":
        rows = df.select("id", "kind", "vec").collect()  # model-sized by contract
        ent = {r["id"]: r["vec"] for r in rows if r["kind"] == "entity"}
        lab = {r["id"]: r["vec"] for r in rows if r["kind"] == "label"}
        entity = np.array([ent[i] for i in range(len(ent))], dtype=np.float64)
        label = np.array([lab[i] for i in range(len(lab))], dtype=np.float64)
        return cls(entity, label)

    def checkpoint(self, spark: SparkSession, path: str) -> None:
        """Parquet checkpoint (replaces pickle backup, ``utils.py:44-49``)."""
        self.to_df(spark).write.mode("overwrite").parquet(path)

    @classmethod
    def restore(cls, spark: SparkSession, path: str) -> "TransEModel":
        """Warm start (reference ``utils.py:52-59``, ``TransE.py:73-76``)."""
        return cls.from_df(spark.read.parquet(path))
