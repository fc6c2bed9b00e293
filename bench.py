"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-to-count) after
a warm-up action that absorbs session/JVM startup noise. This box shows
intermittent multi-minute CPU-steal windows (the same query measured
6s and 367s in back-to-back sessions with zero code change, load avg ~2
throughout), so any query slower than RETRY_ABOVE_SEC is re-run once and
the MIN is reported — the steady-state cost, not the noise spike.
"""

from __future__ import annotations

import json
import os
import re
import time

from oroboro_dw_dbt_spark.operators import QUERIES
from oroboro_dw_dbt_spark.session import get_spark


def _host_load() -> dict:
    """Contention snapshot: loadavg + cumulative steal jiffies. Judged
    cross-round comparisons discard runs whose load/steal say the box
    was busy (BASELINE.md documents 6 s vs 367 s for identical code)."""
    snap: dict = {}
    try:
        with open("/proc/loadavg") as f:
            snap["loadavg_1m"], snap["loadavg_5m"], snap["loadavg_15m"] = [
                float(x) for x in f.read().split()[:3]
            ]
    except OSError:
        pass
    try:
        with open("/proc/stat") as f:
            cpu = f.readline().split()  # cpu user nice system idle iowait irq softirq steal ...
        if len(cpu) > 8:
            snap["steal_jiffies"] = int(cpu[8])
            snap["iowait_jiffies"] = int(cpu[5])
    except (OSError, ValueError):
        pass
    # Disk I/O cumulative sectors (512 B each), whole physical devices
    # only (skip partitions/loop/ram): lets per-stage artifact deltas
    # separate CPU-bound from I/O-saturated walls — the r12 width A/B
    # left the sf300→sf1000 in-chain per-doc uptick attributed to
    # neither width nor steal, and single-box disk saturation is the
    # leading open hypothesis.
    try:
        rd = wr = 0
        with open("/proc/diskstats") as f:
            for line in f:
                p = line.split()
                name = p[2]
                if name.startswith(("loop", "ram", "dm-")):
                    continue
                # partitions: vda1, sda2, nvme0n1p3 — but nvme0n1 and
                # mmcblk0 are whole devices despite the trailing digit
                if re.search(r"p\d+$", name) if name.startswith(
                    ("nvme", "mmcblk")
                ) else name[-1].isdigit():
                    continue
                rd += int(p[5])
                wr += int(p[9])
        snap["disk_sectors_read"] = rd
        snap["disk_sectors_written"] = wr
    except (OSError, ValueError, IndexError):
        pass
    return snap

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "j7_computed_key_join",
    "j9_dim_chain_rollup",
    "w1_top1_per_group",
    # the reference pipeline end-to-end (fixtures + 3-model DAG)
    "ref_user_base",
    # training-data ops
    "t_text_profile",
    "t_dedup_paragraphs",  # C4-style chunk dedup + reassembly (round 5)
    "dd_minhash_lsh",
    "ss_bruteforce_topk",
    "ss_matmul_topk",  # BLAS wide-vector path (added round 4)
    "mm_sample_frames",
    # event analytics + streaming
    "st_sessionize",
    "st_stream_windowed",
    # temporal joins + scale patterns
    "tj_asof_join",
    "tj_range_join",
    "skew_two_phase_agg",
    "pivot_wide",
    # iterative graph algorithm (round 5)
    "gr_pagerank",
    # TPC-H completion suite stress shapes (round 5): two-level count
    # histogram and the double-self-subquery census decorrelation
    "q13_order_count_distribution",
    "q21_sole_supplier_delays",
    # round 6: grid interpolation (two window sorts over one user_id
    # partitioning) and the Bellman-Ford relaxation loop
    "ts_interpolate",
    "gr_sssp_weighted",
    # round 6 second wave: packed-argmax attribution and the
    # max_by-struct changelog fold
    "ev_last_touch",
    "eng_cdc_apply",
    # round 6 close: histogram-route exact AUC (eval family) and the
    # streaming drift monitor (real stream + settled-state PSI)
    "ml_auc_rank",
    "st_drift_monitor",
    # round 6 sixth wave: MATCH_RECOGNIZE-shape sequence detection
    # (two stacked RANGE windows over one per-user sort)
    "ev_sequence_match",
    # round 6 continuation: distributed BPE training (one corpus
    # shuffle + the type-table merge loop) and SemDeDup semantic dedup
    # (LSH-cell dominance anti-join)
    "t_bpe_train",
    "dd_semdedup",
    # round 7: trained-cell SemDeDup (fixed-point Lloyd + per-cell GEMM)
    "dd_semdedup_ivf",
    # round 9: the star-edge LSH dedup spelling and the cells ∝ N
    # greedy SemDeDup — the chained pipeline's production dedup paths
    "dd_minhash_lsh_star",
    "dd_semdedup_ivf_greedy",
]


def _await_quiet_host() -> dict:
    """Quiet-host gate (VERDICT r06 Next #4 + r08 What's-wrong #2):
    wait (bounded) for BOTH contention signals to go quiet before
    timing anything.

    - steal rate: hypervisor-side contention (r05 clean ≈ 0.3
      jiffies/s; r06 contaminated ≈ 15/s);
    - loadavg_1m: VM-INTERNAL contention the steal counter cannot
      see — BENCH_r08 started at loadavg 19.96 with steal 7.0 and the
      first third of the run measured 2-3x its r07 walls with zero
      code change. Threshold 0.25 x nproc (8 on the 32-core box).

    Returns the gate record for the artifact so the judge can see
    what the box looked like."""
    rate_max = float(os.environ.get("SPARK_GRAFT_BENCH_STEAL_RATE_MAX", "8"))
    # Default tightened 0.25×nproc → 2.0 (VERDICT r11 Wrong #1): the
    # r11 driver bench started at loadavg 5.24 — under the old 8.0
    # threshold — and every one of 33 sub-second queries inflated a
    # uniform 1.0–1.7× vs r10 with zero code cause. For sub-second
    # queries on this box, "quiet" means low single digits of runnable
    # threads; anything above competes for the same 32 cores every
    # local[32] stage wants all of.
    load_max = float(os.environ.get("SPARK_GRAFT_BENCH_LOADAVG_MAX", "2.0"))
    max_waits = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAITS", "10"))
    gate = {
        "waits": 0,
        "rate_max": rate_max,
        "steal_rate": None,
        "load_max": load_max,
        "loadavg_1m": None,
    }
    for attempt in range(max_waits + 1):
        if attempt:  # sleep FIRST so every sleep is followed by a
            time.sleep(28.0)  # re-measurement (the recorded rate is
            # always from the most recent sample, ADVICE r07)
        a = _host_load()
        time.sleep(2.0)
        b = _host_load()
        gate["loadavg_1m"] = b.get("loadavg_1m")
        # ADVICE r09: the load signal used to fail open silently — an
        # unreadable /proc/loadavg recorded loadavg_1m: null exactly
        # like a measured-quiet run. Flag it so judged artifacts can
        # tell fail-open from measured-quiet.
        gate["loadavg_unavailable"] = "loadavg_1m" not in b
        quiet_load = b.get("loadavg_1m", 0.0) <= load_max
        if "steal_jiffies" not in a or "steal_jiffies" not in b:
            if quiet_load:
                break
            gate["waits"] += 1
            continue
        rate = (b["steal_jiffies"] - a["steal_jiffies"]) / 2.0
        gate["steal_rate"] = rate
        if rate <= rate_max and quiet_load:
            break
        gate["waits"] += 1
    return gate


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # scale-probe hooks (tools/gen_scale.py + SCALE.md "Measured sf1"):
    # subset the headline list / pass count without touching the
    # driver-facing defaults
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    headline = [q for q in HEADLINE if q in only.split(",")] if only else HEADLINE
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    gate = _await_quiet_host()
    load_before = _host_load()
    spark = get_spark("bench")

    # warm up: JVM + parquet footer reads, and the Python worker pool
    # (first Arrow-batched query otherwise pays worker startup — a
    # session fixed cost, not a per-query cost)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()

    RETRY_ABOVE_SEC = 20.0

    def run_once(name: str) -> tuple[float, int | None]:
        """(wall seconds, steal-jiffies landed DURING this query).

        The start-of-run gate can pass while a steal window opens
        mid-run (r07: gate said 0.0, 3393 jiffies arrived during the
        46 s run), so per-query deltas are the only way to tell a
        quiet measurement from a stolen one across rounds."""
        s0 = _host_load().get("steal_jiffies")
        t0 = time.monotonic()
        df = QUERIES[name].builder(spark, sf_dir)
        assert df.count() >= 0
        t = round(time.monotonic() - t0, 3)
        s1 = _host_load().get("steal_jiffies")
        return t, (s1 - s0 if s0 is not None and s1 is not None else None)

    # two full passes, min per query: this box shows intermittent CPU
    # steal (BASELINE.md: identical code 6 s vs 367 s), and a steal
    # window rarely spans both passes of the same query — min-of-2 is
    # the steady-state cost. A third attempt covers >20 s outliers.
    # NOTE (metric discontinuity): min-of-2 started in round 5; BENCH_r01–r04
    # are single-pass and systematically higher for reasons unrelated to
    # code performance. Per-pass raw times are recorded in "passes_raw" so
    # cross-round analysis can tell steal spikes from real drift without
    # re-running.
    timings: dict[str, float] = {}
    steal_of_min: dict[str, int | None] = {}
    passes_raw: dict[str, list[float]] = {}
    steal_raw: dict[str, list[int | None]] = {}
    for _pass in range(n_passes):
        for name in headline:
            if name not in QUERIES:
                continue
            t, st = run_once(name)
            passes_raw.setdefault(name, []).append(t)
            steal_raw.setdefault(name, []).append(st)
            if t > RETRY_ABOVE_SEC:
                t2, st2 = run_once(name)
                passes_raw[name].append(t2)
                steal_raw[name].append(st2)
                if t2 < t:
                    t, st = t2, st2
            if name not in timings or t < timings[name]:
                timings[name] = t
                steal_of_min[name] = st

    # Relative-inflation tripwire (VERDICT r11 Next #2): the start
    # gate can pass and contention still arrive mid-run — r11's 33
    # shared queries drifted a uniform 1.0–1.7× vs r10 with zero code
    # cause. Compare this run's minima against the previous same-SF
    # artifact; a median drift past the threshold re-waits for quiet
    # and runs ONE more full pass (min-folded), so a stolen run
    # self-corrects instead of polluting the cross-round series. A
    # genuine repo-wide regression still shows: the extra pass records
    # honest times and the artifact says the tripwire fired.
    trip: dict = {"median_ratio": None, "retriggered": False}
    trip_ratio = float(os.environ.get("SPARK_GRAFT_BENCH_TRIP_RATIO", "1.25"))
    ref_timings = None
    here = os.path.dirname(__file__) or "."
    # per-SF snapshot first (probes at other SFs overwrite the plain
    # BENCH_LAST.json between rounds), then the plain file if its SF
    # matches this run's
    for ref_name in (f"BENCH_LAST_sf{sf}.json", "BENCH_LAST.json"):
        try:
            with open(os.path.join(here, ref_name)) as f:
                prior = json.load(f)
        except (OSError, ValueError):
            continue
        if str(prior.get("sf")) == str(
            float(sf) if sf.replace(".", "").isdigit() else sf
        ):
            ref_timings = prior.get("queries") or None
            trip["reference"] = ref_name
            break
    shared = (
        [q for q in timings if q in ref_timings and ref_timings[q] > 0]
        if ref_timings
        else []
    )
    if len(shared) >= 8:  # too few shared queries = no stable median
        import statistics

        med = statistics.median(timings[q] / ref_timings[q] for q in shared)
        trip["median_ratio"] = round(med, 3)
        trip["shared_queries"] = len(shared)
        if med > trip_ratio:
            trip["retriggered"] = True
            trip["regate"] = _await_quiet_host()
            for name in headline:
                if name not in QUERIES:
                    continue
                t, st = run_once(name)
                passes_raw.setdefault(name, []).append(t)
                steal_raw.setdefault(name, []).append(st)
                if t < timings.get(name, float("inf")):
                    timings[name] = t
                    steal_of_min[name] = st
            trip["median_ratio_after"] = round(
                statistics.median(
                    timings[q] / ref_timings[q] for q in shared
                ),
                3,
            )
    # A run that tripped and STAYED inflated must not become the next
    # run's reference — overwriting would rebase the series on the
    # contaminated numbers and suppress the very detection that just
    # fired. Keep the old per-SF snapshot in that case.
    trip["reference_updated"] = not (
        trip["retriggered"]
        and trip.get("median_ratio_after", 0.0) > trip_ratio
    )

    load_after = _host_load()
    steal_delta = (
        load_after.get("steal_jiffies", 0) - load_before.get("steal_jiffies", 0)
        if "steal_jiffies" in load_after and "steal_jiffies" in load_before
        else None
    )
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "passes": n_passes,  # min-of-2 since round 5: steady-state, not steal spikes
        # metric changed r04→r05 (single pass → min-of-2); compare raw
        # passes, not headline minima, across that boundary
        "metric_note": "min-of-2 since r05; r01-r04 artifacts are single-pass",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "steal_gate": gate,
        "inflation_tripwire": trip,
        "load": {
            "before": load_before,
            "after": load_after,
            "steal_jiffies_delta": steal_delta,
        },
    }
    # Full artifact (per-pass raw times, per-query steal deltas) goes
    # to a file: the driver captures only a bounded stdout TAIL, and
    # both r06 and r08 ended with "parsed": null when extra per-query
    # maps pushed the line past that window. The printed line carries
    # only the headline map, compact separators, no per-query steal —
    # BENCH_LAST.json keeps the full record for drift analysis.
    # steal_of_min semantics: jiffies landed during the pass each
    # recorded minimum came from — 0 means trust the number.
    full = dict(
        out, queries_steal=steal_of_min, passes_raw=passes_raw, steal_raw=steal_raw
    )
    try:
        with open(os.path.join(os.path.dirname(__file__) or ".", "BENCH_LAST.json"), "w") as f:
            json.dump(full, f, indent=1)
        # per-SF snapshot: the tripwire's reference for the NEXT run
        # at this SF, immune to interleaved probes at other SFs —
        # NOT updated by a run that tripped and stayed inflated
        if trip["reference_updated"]:
            with open(
                os.path.join(os.path.dirname(__file__) or ".", f"BENCH_LAST_sf{sf}.json"),
                "w",
            ) as f:
                json.dump(full, f, indent=1)
    except OSError:
        pass
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
