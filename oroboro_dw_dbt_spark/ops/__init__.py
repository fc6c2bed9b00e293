from oroboro_dw_dbt_spark.ops.graph import connected_components
from oroboro_dw_dbt_spark.ops.history import merge_upsert, scd2_from_events
from oroboro_dw_dbt_spark.ops.ranking import ranking_family, two_phase_rank
from oroboro_dw_dbt_spark.ops.sampling import hash_split, ring_negatives, stratified_sample, weighted_mix
from oroboro_dw_dbt_spark.ops.sketches import (
    approx_distinct_by,
    approx_quantiles_by,
)
from oroboro_dw_dbt_spark.ops.skew import (
    salted_join,
    two_phase_distinct_agg,
)
from oroboro_dw_dbt_spark.ops.temporal import (
    asof_join,
    bucketed_range_join,
)

__all__ = [
    "approx_distinct_by",
    "approx_quantiles_by",
    "asof_join",
    "bucketed_range_join",
    "connected_components",
    "hash_split",
    "ring_negatives",
    "merge_upsert",
    "ranking_family",
    "salted_join",
    "scd2_from_events",
    "stratified_sample",
    "two_phase_rank",
    "two_phase_distinct_agg",
    "weighted_mix",
]
