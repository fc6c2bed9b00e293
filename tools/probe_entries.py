"""Scale-probe arbitrary catalog entries across sf dirs.

Mirrors bench.py's timing discipline (warm-up, min-of-N passes, host
load + steal snapshot) but takes any catalog names — used for the
per-round empirical scale probes (SCALE.md "Measured sf1") without
growing the driver-facing HEADLINE list.

Usage:
    python tools/probe_entries.py OUT.json QUERY[,QUERY...] SF_DIR[,SF_DIR...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from bench import _host_load  # noqa: E402

from oroboro_dw_dbt_spark.operators.catalog import QUERIES  # noqa: E402
from oroboro_dw_dbt_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path, names_arg, dirs_arg = sys.argv[1], sys.argv[2], sys.argv[3]
    names = names_arg.split(",")
    sf_dirs = dirs_arg.split(",")
    passes = 2
    spark = get_spark("probe")
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()

    out: dict = {"metric": "entry_scale_probe", "passes": passes, "dirs": {}}
    for sf_dir in sf_dirs:
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm footers
        load_before = _host_load()
        timings: dict[str, float] = {}
        raw: dict[str, list[float]] = {}
        for _ in range(passes):
            for name in names:
                t0 = time.monotonic()
                df = QUERIES[name].builder(spark, sf_dir)
                # noop sink, NOT count(): count lets ColumnPruning drop
                # unused window/project expressions, which would make
                # window-heavy entries look scale-free
                df.write.format("noop").mode("overwrite").save()
                t = round(time.monotonic() - t0, 3)
                raw.setdefault(name, []).append(t)
                timings[name] = min(t, timings.get(name, t))
        out["dirs"][sf_dir] = {
            "queries": timings,
            "passes_raw": raw,
            "load_before": load_before,
            "load_after": _host_load(),
        }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({d: v["queries"] for d, v in out["dirs"].items()}, indent=1))


if __name__ == "__main__":
    main()
