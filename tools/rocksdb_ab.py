"""RocksDB vs HDFS-backed state store A/B for the two streaming bench
entries (VERDICT r12 Next #3). Runs each variant alternately N times in
ONE session and reports per-variant minima — the state-store provider is
set around the stream start only, exactly as a production conf would be.

Usage: python tools/rocksdb_ab.py OUT.json [SF_DIR] [ROUNDS]
"""
import json
import sys
import time

sys.path.insert(0, ".")

from bench import _host_load  # noqa: E402

from oroboro_dw_dbt_spark.operators.catalog import QUERIES  # noqa: E402
from oroboro_dw_dbt_spark.session import get_spark  # noqa: E402

ROCKS = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
KEY = "spark.sql.streaming.stateStore.providerClass"


def main():
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("rocksdb_ab")
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()
    names = ["st_stream_windowed", "st_drift_monitor"]
    # warm: one run of each so the stream dir shim is materialized
    for n in names:
        QUERIES[n].builder(spark, sf_dir).count()

    res = {"hdfs": {}, "rocksdb": {}, "raw": {"hdfs": {}, "rocksdb": {}}}
    res["load_before"] = _host_load()
    for _ in range(rounds):
        for variant in ("hdfs", "rocksdb"):
            prev = spark.conf.get(KEY, None)
            if variant == "rocksdb":
                spark.conf.set(KEY, ROCKS)
            try:
                for n in names:
                    t0 = time.monotonic()
                    QUERIES[n].builder(spark, sf_dir).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    t = round(time.monotonic() - t0, 3)
                    res["raw"][variant].setdefault(n, []).append(t)
                    res[variant][n] = min(t, res[variant].get(n, t))
            finally:
                if variant == "rocksdb":
                    if prev is None:
                        spark.conf.unset(KEY)
                    else:
                        spark.conf.set(KEY, prev)
    res["load_after"] = _host_load()
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: res[k] for k in ("hdfs", "rocksdb")}, indent=1))


if __name__ == "__main__":
    main()
