from transe_pyspark_spark.functions import text, vector  # noqa: F401
