"""Greedy-vs-exact victim census at the cells ∝ N operating point,
with the multiprobe middle points (VERDICT r09 Next #4).

Reusable spelling of the r09 ad-hoc sf10 census
(BENCH_r9_greedy_recall.json): same corpus, same C = ⌈N/128⌉ cells,
four assignment modes — exact argmin, greedy nprobe=1/2/4 — victim
sets compared by Jaccard against exact. No occupancy cap (pure
assignment comparison; the cap is orthogonal and pytest-pinned as a
victims-subset). Uniform synthetic embeddings are the adversarial
no-structure case: cell membership rides last-ulp distances, so this
is the floor of the recall curve, not its typical value (clustered
geometry agrees ≥93% at nprobe=1 — test-pinned).

Usage: python tools/greedy_recall_census.py OUT.json [SF_DIR] [NPROBES]
NPROBES: comma list (default "1,2,4"). SPARK_GRAFT_CENSUS_GEOMETRY=
clustered snaps the embeddings onto 64 planted centers (+small jitter)
first — the hierarchically-clustered case real corpora exhibit, where
assignment agreement (not last-ulp boundary noise) drives the score.
Prints one JSON line; full record to OUT.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bench import _host_load  # noqa: E402
from oroboro_dw_dbt_spark.session import get_spark  # noqa: E402


def main() -> None:
    import os

    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_greedy_recall.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf10"
    # tokens: "4" = fixed nprobe 4; "m0.1:16" = adaptive margin 0.1
    # with width cap 16 (VERDICT r10 Next #6); an ":sX" suffix adds
    # cell-side spill margin X (SOAR-style multi-assignment), e.g.
    # "1:s0.1" = np1 with spill 0.1, "m0.1:8:s0.2" = both knobs
    probes: list[tuple[int, float | None, float | None]] = []
    for tok in (sys.argv[3] if len(sys.argv) > 3 else "1,2,4").split(","):
        spill = None
        if ":s" in tok:
            tok, _, sp = tok.rpartition(":s")
            spill = float(sp)
        if tok.startswith("m"):
            m_s, _, cap_s = tok[1:].partition(":")
            probes.append((int(cap_s or 16), float(m_s), spill))
        else:
            probes.append((int(tok), None, spill))
    geometry = os.environ.get("SPARK_GRAFT_CENSUS_GEOMETRY", "uniform")

    from oroboro_dw_dbt_spark.operators.round7_suite import (
        _IVF_FP,
        ivf_cells_capped,
        semdedup_ivf_core,
    )
    from oroboro_dw_dbt_spark.similarity.search import _as_double

    spark = get_spark("greedy_recall_census")
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if geometry == "clustered":
        # Snap each vector toward one of 64 md5-chosen anchor vectors:
        # out = anchor*0.9 + own*0.1. Deterministic, norm-bounded, and
        # hierarchically lumpy — the geometry real embedding corpora
        # show, where the greedy descent's pivot regions align with
        # actual structure instead of last-ulp boundaries.
        anchors = (
            emb.orderBy(F.md5(F.concat(F.lit("an|"), F.col("vec_id").cast("string"))))
            .limit(64)
            .select(F.col("vec_id").alias("aid"), F.col("embedding").alias("av"))
        )
        assign = F.pmod(
            F.conv(F.substring(F.md5(F.concat(F.lit("as|"), F.col("vec_id").cast("string"))), 1, 15), 16, 10).cast("bigint"),
            F.lit(64),
        )
        from pyspark.sql.window import Window

        ar = anchors.withColumn("rk", F.row_number().over(Window.orderBy("aid")) - 1)
        emb = (
            emb.withColumn("slot", assign)
            .join(F.broadcast(ar), F.col("slot") == F.col("rk"))
            .select(
                "vec_id",
                F.zip_with(
                    "av", "embedding", lambda a, x: a * 0.9 + x * 0.1
                ).alias("embedding"),
            )
        )
    n = emb.count()
    n_cells = ivf_cells_capped(n)

    def build_v():
        return emb.select(
            "vec_id", _as_double("embedding").alias("v")
        ).withColumn(
            "vi",
            F.transform(F.col("v"), lambda x: F.floor(x * _IVF_FP).cast("long")),
        )

    def run(
        assign: str, nprobe: int, margin: float | None = None,
        spill: float | None = None,
    ) -> tuple[float, set]:
        load0 = _host_load()
        t0 = time.monotonic()
        sem = semdedup_ivf_core(
            build_v(), n_cells, assign=assign, nprobe=nprobe,
            probe_margin=margin, group_spill=spill,
        )
        victims = {
            r["vec_id"] for r in sem.where("keep = 0").select("vec_id").collect()
        }
        wall = round(time.monotonic() - t0, 3)
        load1 = _host_load()
        steal = load1.get("steal_jiffies", 0) - load0.get("steal_jiffies", 0)
        return wall, victims, steal

    out = {
        "metric": "greedy_recall_census", "sf_dir": sf_dir, "n": n,
        "cells": n_cells, "geometry": geometry, "modes": {},
    }
    exact_wall, exact_v, steal = run("exact", 1)
    out["modes"]["exact"] = {
        "wall": exact_wall, "victims": len(exact_v), "steal": steal,
    }
    greedy_wall = None
    for p, margin, spill in probes:
        wall, vic, steal = run("greedy", p, margin, spill)
        if p == 1 and margin is None and spill is None:
            greedy_wall = wall
        key = f"greedy_np{p}" if margin is None else f"greedy_m{margin}x{p}"
        if spill is not None:
            key += f"_s{spill}"
        inter = len(exact_v & vic)
        union = len(exact_v | vic)
        out["modes"][key] = {
            "wall": wall,
            "victims": len(vic),
            "steal": steal,
            "victim_jaccard_vs_exact": round(inter / union, 4) if union else 1.0,
            "only_exact": len(exact_v - vic),
            "only_greedy": len(vic - exact_v),
            "speedup_vs_exact": round(exact_wall / wall, 2) if wall else None,
            "wall_vs_np1": round(wall / greedy_wall, 2) if greedy_wall else None,
        }
        print(json.dumps({key: out["modes"][key]}))

    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
