from countrymaam_spark.functions import geo, text, vector  # noqa: F401
