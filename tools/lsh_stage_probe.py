"""LSH-dedup-stage-only probe (VERDICT r11 Next #6).

The r11 sf1000 e2e artifact recorded 56.0 µs per corpus doc for the
minhash_lsh_dedup stage vs 43.5 at sf100 — but the run accumulated
188 k steal jiffies over 51 minutes, so the uptick is unadjudicated:
contention noise, or the first visible superlinear term. This probe
re-runs stages 1–2 ONLY (quality filter to reproduce the identical
corpus, then the timed LSH victim removal) under the quiet gate, with
the same session confs the disk rung uses, so the LSH wall is measured
without the semantic stage's 10 minutes of GC pressure behind it.

Usage: python tools/lsh_stage_probe.py OUT.json [SF_DIR]
Defaults to the sf1000 dir. Prints one JSON line; record to OUT.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bench import _await_quiet_host, _host_load  # noqa: E402
from oroboro_dw_dbt_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_lsh_stage.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1000"

    # THE pipeline's own conf resolution + stage builders (shared with
    # pipeline_e2e main() and the chain plan audit): the probe honors
    # SPARK_GRAFT_PIPE_CKPT_LEVEL exactly like a rung run would, so it
    # cannot measure a different spelling than the rung it adjudicates.
    from tools.pipeline_e2e import (
        corpus_frame,
        neardup_frame,
        resolve_lsh_spelling,
        resolve_stage_confs,
    )

    ckpt_level, extra, n_shuffle = resolve_stage_confs(sf_dir)
    spark = get_spark(
        "lsh_stage_probe", shuffle_partitions=n_shuffle, extra_conf=extra
    )
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()

    from pyspark.storagelevel import StorageLevel

    def ckpt(df):
        if ckpt_level == "disk":
            return df.localCheckpoint(
                eager=True, storageLevel=StorageLevel.DISK_ONLY
            )
        return df.localCheckpoint(eager=True)

    gate = _await_quiet_host()
    load_before = _host_load()

    # stage 1 (untimed headline; must run to reproduce the corpus)
    t0 = time.monotonic()
    corpus = ckpt(corpus_frame(spark, sf_dir))
    n_corpus = corpus.count()
    quality_wall = round(time.monotonic() - t0, 3)
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass

    # stage 2, timed exactly as pipeline_e2e times it. The start gate
    # can pass and a steal window open mid-run (the exact ambiguity
    # this probe exists to resolve), so a stolen attempt re-gates and
    # re-runs once (bounded), keeping every attempt in the artifact.
    verify, lsh_ckpt, decision = resolve_lsh_spelling(
        corpus, n_corpus, ckpt_level
    )
    steal_rate_max = float(
        os.environ.get("SPARK_GRAFT_BENCH_STEAL_RATE_MAX", "8")
    )
    max_attempts = 1 + int(os.environ.get("SPARK_GRAFT_LSH_PROBE_RETRIES", "1"))
    attempts = []
    for att in range(max_attempts):
        if att:
            gate = _await_quiet_host()
        load_stage = _host_load()
        t0 = time.monotonic()
        deduped = ckpt(neardup_frame(corpus, n_corpus, verify, lsh_ckpt))
        n_after = deduped.count()
        lsh_wall = round(time.monotonic() - t0, 3)
        load_after = _host_load()
        steal_d = load_after.get("steal_jiffies", 0) - load_stage.get(
            "steal_jiffies", 0
        )
        attempts.append(
            {
                "wall": lsh_wall,
                "us_per_corpus_doc": round(lsh_wall / n_corpus * 1e6, 2),
                "steal_jiffies_delta": steal_d,
                "steal_rate": round(steal_d / max(lsh_wall, 1e-9), 1),
                "at_stage_start": load_stage,
                "after": load_after,
            }
        )
        deduped = None
        if steal_d / max(lsh_wall, 1e-9) <= steal_rate_max:
            break

    best = min(attempts, key=lambda a: a["wall"])
    out = {
        "metric": "lsh_stage_wall",
        "value": best["wall"],
        "unit": "sec",
        "sf_dir": sf_dir,
        "us_per_corpus_doc": best["us_per_corpus_doc"],
        "counts": {"corpus": n_corpus, "after_near_dup": n_after},
        "quality_filter_wall": quality_wall,
        "attempts": attempts,
        "lsh_spelling": {
            "verify": verify,
            "checkpoint_level": lsh_ckpt,
            "decision": decision,
        },
        "session": {
            "ckpt_level": ckpt_level,
            "n_shuffle": n_shuffle,
            "extra_conf": extra,
        },
        "quiet_gate": gate,
        "load": {"before": load_before},
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
