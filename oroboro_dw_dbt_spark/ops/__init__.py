from oroboro_dw_dbt_spark.ops.sketches import (
    approx_distinct_by,
    approx_quantiles_by,
)
from oroboro_dw_dbt_spark.ops.skew import (
    salted_join,
    two_phase_distinct_agg,
)

__all__ = [
    "approx_distinct_by",
    "approx_quantiles_by",
    "salted_join",
    "two_phase_distinct_agg",
]
