"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship deterministic query (the TransE link-
prediction ranking spine, SURVEY §7 M0) at sf0.001; ``queries`` /
``oracle_sql`` expose the full declared operator contract from
``transe_pyspark_spark.plans.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# NB: import the symbols straight from the submodule — the package
# __init__ re-exports a *function* named ``queries`` that shadows the
# submodule attribute on ``transe_pyspark_spark.plans``.
from transe_pyspark_spark.plans.queries import REGISTRY
from transe_pyspark_spark.plans.queries import oracle_sql as _oracle_sql
from transe_pyspark_spark.plans.queries import queries as _queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["transe_rank_eval"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every oracle-checkable query."""
    return _oracle_sql()
