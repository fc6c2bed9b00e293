"""Round-6 lifecycle certifications: streaming restart-recovery and the
full time-travel + vacuum table lifecycle.

Both entries certify FAILURE/maintenance semantics through the driver's
value-hash gate, the same way `eng_acid_commit` certified the commit
protocol (operators/extended_suite.py): the builder drives the engine
through the lifecycle — including an injected mid-stream crash — and
returns what a READER observes at each phase; the oracle recomputes
every phase independently from the raw source table. A hash match
therefore proves the recovery/maintenance machinery, not just a happy
path.

Reference parity note: the reference (dbt→BigQuery) delegates restart
semantics to BigQuery jobs and has no streaming at all (SURVEY §2.12);
these are beyond-reference scale surfaces for the same pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oroboro_dw_dbt_spark.operators.catalog import query
from oroboro_dw_dbt_spark.sources.testdata import load_table


@query(
    "st_restart_recovery",
    # the oracle is the plain batch latest-row-per-user argmax over the
    # SOURCE events — the streamed, crashed, and restarted CDC upsert
    # must land on exactly this table for the hash to match
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM events
    QUALIFY row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
    survey_ref="beyond-reference: Structured Streaming kill-and-restart "
    "recovery — checkpointed CDC upsert crashes mid-feed, resumes from "
    "the offset log, exactly-once result vs the batch argmax oracle "
    "(streaming/jobs.py stream_upsert_latest)",
)
def st_restart_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the checkpointed CDC upsert, CRASH it before batch 1's merge,
    then restart from the same checkpoint directory and let it finish.

    The builder itself asserts the recovery contract (so a green driver
    record certifies recovery, not merely final values):

    - run 1 dies at the injected batch and processes nothing after it;
    - run 2's FIRST batch is the crashed one (offset-log replay — the
      feed is not reprocessed from batch 0);
    - the final table equals the batch argmax oracle (exactly-once:
      replaying the in-doubt batch is idempotent because the merge is
      newer-wins over identical rows).

    Scale: recovery cost is O(one micro-batch), independent of history
    length — the checkpoint pins offsets, not data. At 100 TB the same
    topology recovers in seconds after an executor/driver loss.
    """
    import tempfile

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from oroboro_dw_dbt_spark.streaming import stream_upsert_latest

    base = tempfile.mkdtemp(prefix="restart_recovery_")
    crash_at = 1
    run1: list[int] = []

    def chaos(_batch: DataFrame, batch_id: int) -> None:
        run1.append(batch_id)
        if batch_id == crash_at:
            raise RuntimeError("injected mid-stream crash")

    try:
        stream_upsert_latest(
            spark, sf_dir, files_per_trigger=2, base_dir=base, before_batch=chaos
        )
        raise AssertionError("chaos hook did not kill the stream")
    except StreamingQueryException:
        pass
    if max(run1) != crash_at:
        raise AssertionError(f"run 1 processed past the crash point: {run1}")

    run2: list[int] = []
    final = stream_upsert_latest(
        spark,
        sf_dir,
        files_per_trigger=2,
        base_dir=base,
        before_batch=lambda _b, bid: run2.append(bid),
    )
    if min(run2) != crash_at:
        raise AssertionError(
            f"restart did not resume at the failed batch: {run2} "
            "(expected offset-log replay, got feed reprocessing)"
        )
    return final


@query(
    "eng_time_travel",
    # every phase recomputed by the oracle from the source table:
    #   v1            — full table committed
    #   v2_mor_delete — equality-delete of even keys (merge-on-read)
    #   v3_compacted  — copy-on-write fold of the vectors
    #   tt_v2         — version 2 read AFTER v3 exists: historical reads
    #                   still apply that version's delete vectors
    #   after_vacuum  — vacuum(keep_last=1) never touches the current
    #                   snapshot: the same rows remain readable
    #   reclaimed     — exactly the two superseded artifacts (v1's data
    #                   dir + v2's delete-vector file) are deleted;
    #                   deterministic because the lifecycle is
    oracle="""
    WITH ev AS (SELECT event_id, value FROM events),
    full_t AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE)
               AS value_sum
      FROM ev
    ),
    odd AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(12,4))), 2) AS DOUBLE)
               AS value_sum
      FROM ev WHERE event_id % 2 = 1
    )
    SELECT 'v1' AS phase, n, value_sum FROM full_t
    UNION ALL SELECT 'v2_mor_delete', n, value_sum FROM odd
    UNION ALL SELECT 'v3_compacted', n, value_sum FROM odd
    UNION ALL SELECT 'tt_v2', n, value_sum FROM odd
    UNION ALL SELECT 'after_vacuum', n, value_sum FROM odd
    UNION ALL SELECT 'reclaimed', CAST(2 AS BIGINT), CAST(NULL AS DOUBLE)
    """,
    survey_ref="engine storage: read-at-version time travel + vacuum "
    "reclaim through the full delete/compact lifecycle "
    "(engine/table_format.py read(version=)/vacuum) — completes the "
    "ACID family's driver record (eng_acid_commit, eng_delete_vectors)",
)
def eng_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive commit → merge-on-read delete → compaction → time travel →
    vacuum, aggregating what a reader sees at each phase.

    The two claims beyond `eng_delete_vectors`: (a) a HISTORICAL version
    read after later versions exist still applies ITS delete vectors
    (tt_v2 — version pinning covers the whole read path, vectors
    included); (b) vacuum reclaims exactly the unreferenced artifacts
    and nothing the current snapshot needs (after_vacuum re-reads the
    same rows; `reclaimed` counts the deleted dirs). At 100 TB vacuum
    is the storage-cost control loop: without it every rewritten file
    is retained forever; with it retention is an explicit keep_last
    policy, and the phase list proves it cannot eat live data.
    """
    import tempfile
    from pathlib import Path

    from oroboro_dw_dbt_spark.engine import ManifestParquetFormat

    table = Path(tempfile.mkdtemp(prefix="tt_wh_")) / "events_tt"
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    val = F.col("value").cast("decimal(12,4)")

    def agg(df: DataFrame, phase: str) -> DataFrame:
        return df.agg(
            F.lit(phase).alias("phase"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum(val), 2).cast("double").alias("value_sum"),
        ).select("phase", "n", "value_sum")

    fmt = ManifestParquetFormat()
    fmt.write(ev, table)  # v1
    phases = [agg(fmt.read(spark, table), "v1")]
    fmt.delete_keys(
        spark, table, ev.filter(F.col("event_id") % 2 == 0), "event_id"
    )  # v2
    phases.append(agg(fmt.read(spark, table), "v2_mor_delete"))
    fmt.compact_deletes(spark, table)  # v3
    phases.append(agg(fmt.read(spark, table), "v3_compacted"))
    phases.append(agg(fmt.read(spark, table, version=2), "tt_v2"))
    # materialize the pre-vacuum phases NOW: vacuum deletes the very
    # dirs those lazy plans point at (localCheckpoint pins the rows)
    phases = [p.localCheckpoint(eager=True) for p in phases]
    reclaimed = fmt.vacuum(table, keep_last=1)
    phases.append(agg(fmt.read(spark, table), "after_vacuum"))
    phases.append(
        spark.createDataFrame(
            [("reclaimed", len(reclaimed), None)],
            "phase string, n bigint, value_sum double",
        )
    )
    out = phases[0]
    for p in phases[1:]:
        out = out.unionByName(p)
    return out
