from oroboro_dw_dbt_spark.sources.testdata import TABLES, load_table, load_tables, register_views  # noqa: F401
from oroboro_dw_dbt_spark.sources.bucketing import colocated_join, write_bucketed  # noqa: F401
