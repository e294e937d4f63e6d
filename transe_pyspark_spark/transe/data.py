"""Triples ingestion & dictionary encoding — the reference's ETL
(``TransEmodule/utils.py:5-28``) rebuilt as a single declarative
pipeline with zero driver round-trips.

Reference dataflow: textFile → split → 3 per-column passes → distinct →
zipWithIndex → collectAsMap → closure-dict re-map → collect. Ours:
one CSV scan → one distinct per vocab → window row_number →
broadcast joins. The dataset never touches the driver (the reference's
``collect()`` at ``utils.py:28`` caps dataset size at driver RAM; a
100 TB triple set flows through this pipeline unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from transe_pyspark_spark.operators.relational import dict_encode, encode_with_vocab
from transe_pyspark_spark.sources.readers import read_triples_tsv


def load_triples(spark: SparkSession, path: str) -> DataFrame:
    """Scan a TSV of (head, label, tail) string triples (R1)."""
    return read_triples_tsv(spark, path)


def build_vocab(triples: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(entity_vocab, label_vocab) as ``[token, id]`` DataFrames.

    Entity vocab = distinct(head ∪ tail) (reference ``utils.py:13``);
    ids are dense 0..V−1 ordered by token — deterministic, unlike the
    reference's partition-order ``zipWithIndex`` (``utils.py:18-19``,
    SURVEY §4 quirk 6).
    """
    entities = triples.select(F.col("head").alias("token")).unionAll(
        triples.select(F.col("tail").alias("token"))
    )
    entity_vocab = dict_encode(entities, "token")
    label_vocab = dict_encode(triples.select(F.col("label").alias("token")), "token")
    return entity_vocab, label_vocab


def encode_triples(triples: DataFrame, entity_vocab: DataFrame, label_vocab: DataFrame) -> DataFrame:
    """String triples → ``[h: long, l: long, t: long]`` via three
    broadcast hash joins (the declarative form of the reference's
    closure-captured dicts, ``utils.py:26``)."""
    df = triples
    df = encode_with_vocab(df.withColumnRenamed("head", "__tok"), entity_vocab, "__tok", "h")
    df = encode_with_vocab(df.withColumnRenamed("label", "__tok"), label_vocab, "__tok", "l")
    df = encode_with_vocab(df.withColumnRenamed("tail", "__tok"), entity_vocab, "__tok", "t")
    return df.select("h", "l", "t")


def filter_seen(test_triples: DataFrame, entity_vocab: DataFrame, label_vocab: DataFrame) -> DataFrame:
    """Drop test triples containing tokens unseen in training — the
    reference's skip-unseen check (``test.py:7-11,45-46``) as three
    left-semi joins instead of per-row dict probes."""
    df = test_triples
    ev = entity_vocab.select("token")
    lv = label_vocab.select("token")
    df = df.join(F.broadcast(ev.withColumnRenamed("token", "head")), "head", "left_semi")
    df = df.join(F.broadcast(lv.withColumnRenamed("token", "label")), "label", "left_semi")
    df = df.join(F.broadcast(ev.withColumnRenamed("token", "tail")), "tail", "left_semi")
    return df
