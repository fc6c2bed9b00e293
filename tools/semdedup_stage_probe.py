"""Semantic-stage-only scale probe: the greedy SemDeDup operating
point (cells ∝ N, d-level descent, occupancy-capped dominance) timed
end-to-end on one sf dir's embeddings.

This is the reusable spelling of the r09 ad-hoc sf1000 run
(BENCH_r9_sem_sf1000.json) so the d-level descent's fix for the
N·√C = N^1.5 coarse term (VERDICT r09 Next #1) can be measured
against the same rung: the done-bar is per-vector cost at sf1000
within ~1.3× of sf100's, victims bit-stable across re-runs.

Usage: python tools/semdedup_stage_probe.py OUT.json [SF_DIR] [repeat]
Env: SPARK_GRAFT_SEMDEDUP_OCC (128), SPARK_GRAFT_SEMDEDUP_NPROBE (1).
Prints one JSON line; full record to OUT.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bench import _host_load  # noqa: E402
from oroboro_dw_dbt_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_sem_stage.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf10"
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from oroboro_dw_dbt_spark.operators.round7_suite import (
        _IVF_FP,
        _descent_level_sizes,
        ivf_cells_capped,
        semdedup_ivf_core,
    )
    from oroboro_dw_dbt_spark.similarity.search import _as_double

    occ = int(os.environ.get("SPARK_GRAFT_SEMDEDUP_OCC", "128"))
    nprobe = int(os.environ.get("SPARK_GRAFT_SEMDEDUP_NPROBE", "1"))
    # compact storage (default ON): v as array<float>, vi as array<int>
    # — halves the corpus checkpoint (the r09 sf1000 run pinned ~22 GB
    # against a 24 g heap and logged GCLocker retries; the r10 rerun
    # OOMed outright). Kernels upcast to f64/i64 at compute time, so
    # results stay deterministic; micro coords |vi| ≤ ~3e7 fit int32
    # by construction. SPARK_GRAFT_SEMDEDUP_COMPACT=0 restores the
    # double/long storage of the certified catalog entries.
    compact = os.environ.get("SPARK_GRAFT_SEMDEDUP_COMPACT", "1") == "1"

    spark = get_spark("sem_stage_probe")
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vec = emb.count()
    n_cells = ivf_cells_capped(n_vec, occ)
    sizes = _descent_level_sizes(n_cells)

    runs = []
    victims_first = None
    for r in range(repeat):
        load0 = _host_load()
        t0 = time.monotonic()
        v = emb.select("vec_id", _as_double("embedding").alias("v")).withColumn(
            "vi",
            F.transform(F.col("v"), lambda x: F.floor(x * _IVF_FP).cast("long")),
        )
        if compact:
            v = v.select(
                "vec_id",
                F.transform("v", lambda x: x.cast("float")).alias("v"),
                F.transform("vi", lambda x: x.cast("int")).alias("vi"),
            )
        sem = semdedup_ivf_core(
            v, n_cells, assign="greedy", occupancy_cap=8 * occ, nprobe=nprobe
        )
        victims = sem.where("keep = 0").count()
        wall = round(time.monotonic() - t0, 3)
        load1 = _host_load()
        runs.append(
            {
                "wall": wall,
                "victims": victims,
                "us_per_vector": round(1e6 * wall / max(1, n_vec), 2),
                "steal_jiffies_delta": (
                    load1.get("steal_jiffies", 0) - load0.get("steal_jiffies", 0)
                ),
                "loadavg_1m_start": load0.get("loadavg_1m"),
            }
        )
        if victims_first is None:
            victims_first = victims
        print(json.dumps(runs[-1]))

    out = {
        "metric": "semdedup_stage_greedy",
        "unit": "sec",
        "sf_dir": sf_dir,
        "n_vectors": n_vec,
        "cells": n_cells,
        "descent_level_sizes": sizes,
        "descent_depth": len(sizes) + 1,
        "nprobe": nprobe,
        "occupancy": occ,
        "compact_storage": compact,
        "victims_stable": all(r["victims"] == victims_first for r in runs),
        "runs": runs,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
