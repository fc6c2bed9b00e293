"""End-to-end LLM training-data pipeline probe: ONE chained run.

The per-entry probes certify stages in isolation; a real 100 TB user
runs them as a chain where each stage consumes the previous stage's
survivors. This tool runs that chain at any sf dir and records the
per-stage wall + survivor counts (VERDICT r07 Next #7):

  1. corpus build  — quality_filter over documents (scan-speed Column
                     tree), keep-set joined back to the corpus
  2. near-dup      — MinHash-LSH star edges (each doc vs its buckets'
                     min-id reps — linear in bucket size), exact-
                     Jaccard verified; verified members removed
  3. semantic      — trained-cell SemDeDup at the cells ∝ N operating
                     point (greedy two-level assignment, occupancy-
                     capped per-cell GEMM dominance) over the
                     embeddings of surviving docs; dominated vectors'
                     docs removed
  4. pack shards   — per-source token-budget shard assignment of the
                     final corpus

Stage boundaries are materialized with localCheckpoint so each stage's
wall is its own (no lazy-evaluation bleed into the next timer).

Usage: python tools/pipeline_e2e.py OUT.json [SF_DIR]
                [--margin M] [--spill S] [--nprobe N]
Prints one JSON line; full record written to OUT.json.

The recall knobs are CLI args (VERDICT r11 Next #7 — env strings are
typo-silent; the artifact must say what a rung ran with). The old env
vars (SPARK_GRAFT_SEMDEDUP_MARGIN/SPILL/NPROBE) still work as
defaults; an explicit flag wins, and the resolved values plus their
source land in the artifact's ``recall_knobs`` field either way.
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


def _parse_args(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("out_path", nargs="?", default="BENCH_pipeline_e2e.json")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--margin", type=float, default=None,
        help="semantic-stage probe_margin (adaptive vector-side "
        "multiprobe; default: SPARK_GRAFT_SEMDEDUP_MARGIN env or off)",
    )
    ap.add_argument(
        "--spill", type=float, default=None,
        help="semantic-stage group_spill (cell-side multi-assignment; "
        "default: SPARK_GRAFT_SEMDEDUP_SPILL env or off)",
    )
    ap.add_argument(
        "--nprobe", type=int, default=None,
        help="pivots probed per descent level (margin makes this a "
        "width cap; default: SPARK_GRAFT_SEMDEDUP_NPROBE env or 1)",
    )
    return ap.parse_args(argv)


def _resolve_knob(cli_val, env_name, cast):
    """(value, source) — explicit CLI wins, env is the fallback."""
    if cli_val is not None:
        return cli_val, "cli"
    env_s = os.environ.get(env_name)
    if env_s:
        return cast(env_s), "env"
    return None, "default"


def main(argv=None) -> None:
    args = _parse_args(argv)
    out_path = args.out_path
    sf_dir = args.sf_dir

    from oroboro_dw_dbt_spark.dedup.dedup import minhash_lsh_victims
    from oroboro_dw_dbt_spark.operators.round7_suite import (
        _IVF_FP,
        ivf_cells_capped,
        ivf_cells_for,
        semdedup_ivf_core,
    )
    from oroboro_dw_dbt_spark.similarity.search import _as_double
    from oroboro_dw_dbt_spark.text.pipeline import pack_shards, quality_filter

    # SPARK_GRAFT_PIPE_CKPT_LEVEL=disk routes every corpus-sized
    # stage-boundary checkpoint (and the LSH stage's per-doc frame) to
    # DISK_ONLY: at the sf1000 rung the cumulative pinned state
    # (corpus + deduped + LSH base + semantic vectors) overran a 64 g
    # heap; from disk the same chain runs clean. A cluster spreads
    # these bytes thin and the default (memory+disk) is right there.
    # Unset = AUTO (VERDICT r10 Next #4): estimate the doc count from
    # the parquet footers (no JVM needed) and go DISK_ONLY when ~2
    # live text checkpoints (~1.2 KB/doc) would overrun 25% of the
    # driver heap — the same sizing rule the LSH spelling uses.
    ckpt_level = os.environ.get("SPARK_GRAFT_PIPE_CKPT_LEVEL")
    if ckpt_level is None:
        import glob

        import pyarrow.parquet as pq

        paths = glob.glob(f"{sf_dir}/documents.parquet/*.parquet") or glob.glob(
            f"{sf_dir}/documents.parquet"
        )
        est_docs = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
        heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
        from oroboro_dw_dbt_spark.dedup.dedup import _parse_mem

        ckpt_level = "disk" if est_docs * 1200 > 0.25 * _parse_mem(heap) else None
    # DISK_ONLY blocks are serialized but UNcompressed by default
    # (spark.rdd.compress=false); a corpus-text checkpoint that is
    # 6.7 GB as snappy parquet re-expands to ~20 GB raw on the block
    # store — more than half the single box's free disk at the sf1000
    # rung. lz4-compressing serialized blocks trades a little CPU in a
    # stage that is md5-bound anyway for ~3-4× disk. Executor-local
    # disks on a cluster see the same ratio.
    extra = None
    n_shuffle = None
    if ckpt_level == "disk":
        extra = {
            "spark.rdd.compress": "true",
            # shuffle files of a truncated lineage (everything behind
            # an eager checkpoint) are garbage the cleaner only
            # reclaims after a JVM GC; the default 30 min periodicGC
            # let ~15 GB of dead shuffle files coexist with the live
            # stage at the first sf1000 attempt (disk-full abort).
            "spark.cleaner.periodicGC.interval": "2min",
        }
        # ≥ 2× defaultParallelism shuffle partitions: (a) ~75 MB not
        # ~600 MB per reduce partition at 50 M docs, (b) the corpus
        # checkpoint inherits enough partitions that the LSH stage's
        # "too few splits" guard never pays a 19 GB corpus-text
        # repartition shuffle just to widen parallelism.
        n_shuffle = 256
    spark = get_spark("pipeline_e2e", shuffle_partitions=n_shuffle, extra_conf=extra)
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()

    def free_dead_state():
        """Stage boundaries are eager checkpoints, so a finished
        stage's inputs (prior checkpoint + the stage's internal
        checkpoints) are dead weight the moment the boundary
        materializes. On the single box every retained block competes
        for the SAME free disk the next stage's shuffle needs, so the
        caller dels/rebinds the dead refs and this nudges both GCs —
        Spark's ContextCleaner then unpersists the unreferenced RDD
        blocks. (A cluster wants this too: it is the difference
        between peak disk ∝ whole-chain state and ∝ two stages.)"""
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    def ckpt(df):
        if ckpt_level == "disk":
            from pyspark.storagelevel import StorageLevel

            return df.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
        return df.localCheckpoint(eager=True)

    # Quiet-host gate (VERDICT r10 Next #2): the sf30 e2e artifact
    # regressed 116→136 s under 9.5 k steal jiffies while the isolated
    # A/B probe on the same corpus improved — pipeline numbers need
    # the same steal/loadavg gate bench.py timings get.
    gate = _await_quiet_host()
    load_before = _host_load()
    stages: dict[str, float] = {}
    counts: dict[str, int] = {}
    t_all = time.monotonic()

    # -- 1. corpus build ---------------------------------------------------
    t0 = time.monotonic()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    q = quality_filter(docs)
    corpus = ckpt(docs.join(q.where("keep").select("doc_id"), "doc_id"))
    counts["corpus"] = corpus.count()
    stages["quality_filter"] = round(time.monotonic() - t0, 3)
    # the checkpoint truncated the lineage: the quality join's corpus
    # shuffle is dead NOW — reclaim it before the LSH stage needs the
    # same disk, not at the next stage boundary
    docs = q = None
    free_dead_state()

    # -- 2. near-dup removal ----------------------------------------------
    # star spelling, lean materialization: the pair spelling measured
    # 10.9× wall at 3.33× docs (sf30→sf100) — profiling showed the
    # corpus-wide shingle-array checkpoint (~3× the text) thrashing
    # the block manager, not the pair count (SCALE.md "sf100 rung")
    t0 = time.monotonic()
    # Spelling selection is AUTO by default (VERDICT r10 Next #4):
    # carry+memory when ~0.7 KB/doc of verify state fits 25% of
    # executor storage (sf30), reshingle+disk when it doesn't
    # (the single-box sf1000 rung). Env overrides for A/B probes.
    lsh_verify = os.environ.get("SPARK_GRAFT_LSH_VERIFY", "auto")
    if lsh_verify == "auto":
        from oroboro_dw_dbt_spark.dedup.dedup import _auto_lsh_spelling

        lsh_verify, auto_ckpt, lsh_decision = _auto_lsh_spelling(
            corpus, counts["corpus"]
        )
        lsh_ckpt = "disk" if ckpt_level == "disk" else auto_ckpt
    else:
        lsh_decision = {"choice": lsh_verify, "source": "env-override"}
        lsh_ckpt = "disk" if ckpt_level == "disk" else None
    victims = minhash_lsh_victims(
        corpus,
        checkpoint_level=lsh_ckpt,
        verify=lsh_verify,
        approx_docs=counts["corpus"],
    )
    deduped = ckpt(corpus.join(victims, "doc_id", "left_anti"))
    counts["after_near_dup"] = deduped.count()
    stages["minhash_lsh_dedup"] = round(time.monotonic() - t0, 3)
    # corpus ckpt + the LSH stage's internal checkpoints (index/edges/
    # vh) are dead once `deduped` is materialized
    corpus = q = victims = None
    free_dead_state()

    # -- 3. semantic dedup -------------------------------------------------
    # over the embeddings OF THE SURVIVORS only (vec_id keys doc_id):
    # a doc removed upstream must not dominate anyone downstream —
    # that is what "chained" means.
    # Operating point (VERDICT r08 Next #2): occupancy-capped cells
    # (C = ceil(N/occ), cells ∝ N) + the greedy two-level descent —
    # dominance work N·occ and assignment ~2√C GEMM dots per vector,
    # replacing the √-scaled exact point whose N^1.5 dominance term
    # was 72% of the sf100 wall. SPARK_GRAFT_SEMDEDUP_MODE=sqrt
    # restores the r08 exact operating point for A/B probes.
    t0 = time.monotonic()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").join(
        deduped.select(F.col("doc_id").alias("vec_id")), "vec_id"
    )
    v = (
        emb.select("vec_id", _as_double("embedding").alias("v"))
        .withColumn(
            "vi",
            F.transform(
                F.col("v"), lambda x: F.floor(x * _IVF_FP).cast("long")
            ),
        )
    )
    mode = os.environ.get("SPARK_GRAFT_SEMDEDUP_MODE", "linear")
    recall_knobs = None  # sqrt mode has no descent knobs
    n_vec = v.count()
    if mode == "sqrt":
        n_cells = ivf_cells_for(n_vec)
        sem = semdedup_ivf_core(v, n_cells, assign="exact")
    else:
        occ = int(os.environ.get("SPARK_GRAFT_SEMDEDUP_OCC", "128"))
        # nprobe > 1 = the recall middle point (VERDICT r09 Next #4):
        # probe the best nprobe pivots per descent level at ~nprobe×
        # the probe cost, still ≪ the exact path's C dots per vector.
        # recall knobs (SCALE.md r11 census): adaptive vector-side
        # margin and cell-side spill; unset = the certified np1 point.
        # CLI flags override the env vars (VERDICT r11 Next #7);
        # resolved values + source recorded in the artifact below.
        nprobe, nprobe_src = _resolve_knob(
            args.nprobe, "SPARK_GRAFT_SEMDEDUP_NPROBE", int
        )
        nprobe = nprobe or 1
        probe_margin, margin_src = _resolve_knob(
            args.margin, "SPARK_GRAFT_SEMDEDUP_MARGIN", float
        )
        group_spill, spill_src = _resolve_knob(
            args.spill, "SPARK_GRAFT_SEMDEDUP_SPILL", float
        )
        recall_knobs = {
            "nprobe": nprobe,
            "probe_margin": probe_margin,
            "group_spill": group_spill,
            "source": {
                "nprobe": nprobe_src,
                "probe_margin": margin_src,
                "group_spill": spill_src,
            },
        }
        n_cells = ivf_cells_capped(n_vec, occ)
        # compact storage (default ON): v as array<float>, vi as
        # array<int> — halves the corpus checkpoint the stage pins
        # (the r09 sf1000 probe hit GCLocker retries at ~22 GB on a
        # 24 g heap; the full-width r10 rerun OOMed). Kernels upcast
        # to f64/i64 at compute time so victims are unchanged; micro
        # coords |vi| ≤ ~3e7 fit int32 by construction.
        if os.environ.get("SPARK_GRAFT_SEMDEDUP_COMPACT", "1") == "1":
            v = v.select(
                "vec_id",
                F.transform("v", lambda x: x.cast("float")).alias("v"),
                F.transform("vi", lambda x: x.cast("int")).alias("vi"),
            )
        # occupancy cap at 8× the target: greedy cells skew (measured
        # p99 ≈ 9× average at sf10), and Σ occ² — the dominance GEMM —
        # is what the cap bounds to N·cap
        sem = semdedup_ivf_core(
            v, n_cells, assign="greedy", occupancy_cap=8 * occ,
            nprobe=nprobe, probe_margin=probe_margin,
            group_spill=group_spill,
        )
    sem_victims = sem.where("keep = 0").select(
        F.col("vec_id").alias("doc_id")
    )
    final = ckpt(deduped.join(sem_victims, "doc_id", "left_anti"))
    counts["after_semantic"] = final.count()
    stages["semdedup_ivf"] = round(time.monotonic() - t0, 3)
    deduped = emb = v = sem = sem_victims = None
    free_dead_state()

    # -- 4. pack shards ----------------------------------------------------
    t0 = time.monotonic()
    shards = pack_shards(final, budget=2000)
    summary = shards.agg(
        F.countDistinct("source", "shard_id").alias("n_shards"),
        F.sum("n_tokens").alias("total_tokens"),
    ).collect()[0]
    counts["n_shards"] = int(summary["n_shards"])
    counts["total_tokens"] = int(summary["total_tokens"])
    stages["pack_shards"] = round(time.monotonic() - t0, 3)

    total = round(time.monotonic() - t_all, 3)
    load_after = _host_load()
    out = {
        "metric": "pipeline_e2e_wall",
        "value": total,
        "unit": "sec",
        "sf_dir": sf_dir,
        "stages": stages,
        "counts": counts,
        "n_cells": n_cells,
        "semdedup_mode": mode,
        "recall_knobs": recall_knobs,
        "quiet_gate": gate,
        "lsh_spelling": {
            "verify": lsh_verify,
            "checkpoint_level": lsh_ckpt,
            "decision": lsh_decision,
        },
        "stage_checkpoint_level": ckpt_level or "memory_and_disk",
        "load": {
            "before": load_before,
            "after": load_after,
            "steal_jiffies_delta": (
                load_after.get("steal_jiffies", 0)
                - load_before.get("steal_jiffies", 0)
            ),
        },
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
