from transe_pyspark_spark.plans.queries import REGISTRY, oracle_sql, queries  # noqa: F401
