from giranking_spark.functions import hashing, stats, text, urls  # noqa: F401
