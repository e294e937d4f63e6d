"""transe_pyspark_spark — a PySpark-native analytics engine.

A from-scratch, DataFrame-first rebuild of the capabilities of the
reference repo ``conema/TransE-pyspark`` (see SURVEY.md): text/parquet
ingestion, dictionary encoding, relational operators, vector distance /
ranking kernels, a distributed TransE trainer + link-prediction
evaluator, plus the large-scale training-data-pipeline operators the
north star calls for (dedup, similarity search, text analysis,
streaming).

Design stance (SURVEY.md §7): declarative DataFrame/SQL plans so
Catalyst + Tungsten choose physical strategies; Arrow-vectorized
``mapInPandas``/``applyInPandas`` only where built-ins can't express
the semantics (SGD kernel, brute-force ranking against a broadcast
matrix); zero ``collect()`` in data paths.
"""

__version__ = "0.1.0"

from transe_pyspark_spark.session import get_spark  # noqa: F401
