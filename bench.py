"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-to-count) after
a warm-up action that absorbs session/JVM startup noise.
"""

from __future__ import annotations

import json
import os
import time

from oroboro_dw_dbt_spark.operators import QUERIES
from oroboro_dw_dbt_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "j1_left_fanout",
    "j7_computed_key_join",
    "j9_dim_chain_rollup",
    "a1_having_count_distinct",
    "w1_top1_per_group",
    "u2_union_typed_nulls",
    "f_string_suite",
    "d_date_suite",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # warm up: JVM + parquet footer reads
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        t0 = time.monotonic()
        df = QUERIES[name].builder(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.monotonic() - t0, 3)
        assert n >= 0

    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
