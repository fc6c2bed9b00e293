"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator catalog
(oroboro_dw_dbt_spark.operators) for the sf0.01 DuckDB comparison.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from oroboro_dw_dbt_spark.operators import oracle_sql_map, queries_map  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from oroboro_dw_dbt_spark.operators import QUERIES

    return QUERIES["q1_pricing_summary"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return queries_map()


def oracle_sql() -> dict[str, str]:
    """Matching ANSI SQL per query for the DuckDB oracle."""
    return oracle_sql_map()
