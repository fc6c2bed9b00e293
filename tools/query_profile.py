"""Per-query profile: wall seconds, Spark job count, stage/task counts.

Optimization-round triage (guide §1): for sub-second catalog entries at
sf0.1, per-job fixed overhead competes with real work — a query's job
count is the first thing to know before optimizing its plan.

Usage:
    python tools/query_profile.py OUT.json QUERY[,QUERY...] [SF_DIR]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from oroboro_dw_dbt_spark.operators.catalog import QUERIES  # noqa: E402
from oroboro_dw_dbt_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path, names_arg = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = names_arg.split(",")
    spark = get_spark("query_profile")
    sc = spark.sparkContext
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()

    tracker = sc.statusTracker()
    out: dict = {}
    for name in names:
        prof_best: dict | None = None
        for _pass in range(2):
            group = f"profile_{name}_{_pass}"
            sc.setJobGroup(group, name)
            t0 = time.monotonic()
            df = QUERIES[name].builder(spark, sf_dir)
            df.count()
            wall = round(time.monotonic() - t0, 3)
            sc.setJobGroup(None, None)
            job_ids = tracker.getJobIdsForGroup(group)
            n_stages = 0
            n_tasks = 0
            for jid in job_ids:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None and si.numTasks > 0:
                        n_stages += 1
                        n_tasks += si.numTasks
            prof = {
                "wall_sec": wall,
                "jobs": len(job_ids),
                "stages_run": n_stages,
                "tasks_run": n_tasks,
            }
            if prof_best is None or wall < prof_best["wall_sec"]:
                prof_best = prof
        out[name] = prof_best
        print(name, json.dumps(prof_best))
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
