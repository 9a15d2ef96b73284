from datalakefoundation_spark.tables.lake_table import LakeTable  # noqa: F401
