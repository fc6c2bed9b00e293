from oroboro_dw_dbt_spark.models.fixtures import FIXTURE_SQL, fixture_cte_prefix, register_fixture_views
from oroboro_dw_dbt_spark.models.reference_models import build_reference_graph

__all__ = [
    "FIXTURE_SQL",
    "fixture_cte_prefix",
    "register_fixture_views",
    "build_reference_graph",
]
