from cityfinder_spark.geo import cells, distance  # noqa: F401
