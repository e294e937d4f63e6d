from transe_pyspark_spark.transe.data import build_vocab, encode_triples, load_triples  # noqa: F401
from transe_pyspark_spark.transe.evaluate import evaluate_link_prediction  # noqa: F401
from transe_pyspark_spark.transe.model import TransEModel  # noqa: F401
from transe_pyspark_spark.transe.train import TransETrainer  # noqa: F401
