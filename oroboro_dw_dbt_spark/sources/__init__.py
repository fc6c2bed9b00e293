from oroboro_dw_dbt_spark.sources.testdata import TABLES, load_table, load_tables, register_views  # noqa: F401
