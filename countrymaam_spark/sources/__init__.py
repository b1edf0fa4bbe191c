from countrymaam_spark.sources import pages  # noqa: F401
