from sdp_spark.sources.fixtures import TABLES, load_tables, table  # noqa: F401
