from transe_pyspark_spark.sources.readers import (  # noqa: F401
    TABLES,
    load_all,
    load_table,
    read_json,
    read_triples_tsv,
    register_views,
    write_parquet,
)
