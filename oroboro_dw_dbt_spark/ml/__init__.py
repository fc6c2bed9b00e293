from oroboro_dw_dbt_spark.ml.scoring import batch_score  # noqa: F401
