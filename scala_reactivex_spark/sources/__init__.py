from scala_reactivex_spark.sources.catalog import TABLES, load, table  # noqa: F401
