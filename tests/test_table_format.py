"""ManifestParquetFormat: the ACID commit protocol under fire.

The invariant under test (the whole point of the pointer design): after
ANY prefix of operations in which some writes crash before the pointer
swap, a reader sees exactly the data of the last SUCCESSFUL commit —
never a torn mix, never the orphan — and every committed version stays
readable until vacuumed.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from oroboro_dw_dbt_spark.engine import ManifestParquetFormat


class Killed(RuntimeError):
    pass


def _kill(path, version):
    raise Killed(str(version))


def _ids(spark, fmt, table, version=None):
    df = fmt.read(spark, table, version=version)
    return sorted(r.x for r in df.collect())


class TestAcidCommit:
    def test_crash_before_commit_leaves_reader_on_previous(self, spark, tmp_path):
        fmt = ManifestParquetFormat()
        chaos = ManifestParquetFormat(before_commit=_kill)
        table = tmp_path / "t"
        fmt.write(spark.range(3).select(F.col("id").alias("x")), table)
        with pytest.raises(Killed):
            chaos.write(spark.range(100, 105).select(F.col("id").alias("x")), table)
        assert _ids(spark, fmt, table) == [0, 1, 2]
        assert fmt.current_version(table) == 1
        assert fmt.versions(table) == [1]  # the orphan json is not a version

    def test_randomized_commit_crash_sequence(self, spark, tmp_path):
        """30 operations, seeded shuffle of commit/crash: after each op
        the reader must see the last committed payload exactly."""
        rng = random.Random(5)
        fmt = ManifestParquetFormat()
        chaos = ManifestParquetFormat(before_commit=_kill)
        table = tmp_path / "t"
        committed: list[int] | None = None
        for step in range(30):
            payload = [step * 10 + i for i in range(3)]
            df = spark.createDataFrame([(x,) for x in payload], "x long")
            if rng.random() < 0.4:
                with pytest.raises(Killed):
                    chaos.write(df, table)
            else:
                fmt.write(df, table)
                committed = payload
            if committed is None:
                with pytest.raises(FileNotFoundError):
                    fmt.read(spark, table)
            else:
                assert _ids(spark, fmt, table) == committed, f"step {step}"

    def test_time_travel_and_vacuum(self, spark, tmp_path):
        fmt = ManifestParquetFormat()
        table = tmp_path / "t"
        for v, base in ((1, 0), (2, 10), (3, 20)):
            df = spark.createDataFrame([(base + i,) for i in range(2)], "x long")
            fmt.write(df, table)
        assert fmt.versions(table) == [1, 2, 3]
        assert _ids(spark, fmt, table, version=1) == [0, 1]
        assert _ids(spark, fmt, table, version=2) == [10, 11]
        assert _ids(spark, fmt, table) == [20, 21]
        deleted = fmt.vacuum(table, keep_last=2)
        assert deleted == ["data-000001"]
        assert fmt.versions(table) == [2, 3]
        assert _ids(spark, fmt, table, version=2) == [10, 11]  # kept
        assert _ids(spark, fmt, table) == [20, 21]

    def test_vacuum_reclaims_crash_orphans(self, spark, tmp_path):
        fmt = ManifestParquetFormat()
        chaos = ManifestParquetFormat(before_commit=_kill)
        table = tmp_path / "t"
        fmt.write(spark.range(2).select(F.col("id").alias("x")), table)
        with pytest.raises(Killed):
            chaos.write(spark.range(5).select(F.col("id").alias("x")), table)
        assert (table / "data-000002").exists()  # orphan data landed
        deleted = fmt.vacuum(table)
        assert deleted == ["data-000002"]
        assert _ids(spark, fmt, table) == [0, 1]

    def test_incremental_dag_on_manifest_format(self, spark, tmp_path):
        """The DAG's staged-swap path (write staging, replace into final)
        must run unchanged on the ACID format — the seam's promise."""
        from oroboro_dw_dbt_spark.engine import ModelGraph, SourceRegistry, model

        fmt = ManifestParquetFormat()
        sources = SourceRegistry()
        state = {"rows": [(1, "a"), (2, "b")]}
        sources.add_provider(
            "feed", lambda s: s.createDataFrame(state["rows"], "k long, v string")
        )

        @model(name="inc", materialized="incremental", unique_key=("k",))
        def inc(feed):
            return feed

        graph = ModelGraph(sources, warehouse_dir=str(tmp_path), table_format=fmt).add(inc)
        graph.run(spark, run_tests=False)
        assert {(r.k, r.v) for r in graph.frame("inc").collect()} == {(1, "a"), (2, "b")}

        state["rows"] = [(2, "B"), (3, "c")]  # update 2, insert 3
        graph.run(spark, run_tests=False)
        assert {(r.k, r.v) for r in graph.frame("inc").collect()} == {
            (1, "a"), (2, "B"), (3, "c"),
        }
        # both merge generations remain as committed versions
        assert len(fmt.versions(tmp_path / "inc")) == 2

class TestMergeOnReadDeletes:
    """delete_keys/compact_deletes: the Iceberg-equality-delete contract —
    deletes never touch data files, readers apply vectors, compaction
    folds them, vacuum reclaims superseded vectors."""

    def _file_set(self, data_dir):
        return sorted(p.name for p in data_dir.glob("*.parquet"))

    def test_delete_is_merge_on_read(self, spark, tmp_path):
        fmt = ManifestParquetFormat()
        table = tmp_path / "t"
        fmt.write(spark.range(10).select(F.col("id").alias("x")), table)
        data_dir = table / fmt._snapshot_meta(table, 1)["data_dir"]
        files_before = self._file_set(data_dir)
        mtimes_before = {p.name: p.stat().st_mtime_ns for p in data_dir.glob("*.parquet")}

        fmt.delete_keys(
            spark, table, spark.range(3).select(F.col("id").alias("x")), "x"
        )
        assert _ids(spark, fmt, table) == [3, 4, 5, 6, 7, 8, 9]
        # data files byte-untouched: same names, same mtimes
        assert self._file_set(data_dir) == files_before
        assert {
            p.name: p.stat().st_mtime_ns for p in data_dir.glob("*.parquet")
        } == mtimes_before
        # history: v1 still shows everything
        assert _ids(spark, fmt, table, version=1) == list(range(10))

    def test_deletes_accumulate_and_compact(self, spark, tmp_path):
        fmt = ManifestParquetFormat()
        table = tmp_path / "t"
        fmt.write(spark.range(10).select(F.col("id").alias("x")), table)
        fmt.delete_keys(spark, table, spark.range(2).select(F.col("id").alias("x")), "x")
        fmt.delete_keys(
            spark, table, spark.range(8, 10).select(F.col("id").alias("x")), "x"
        )
        assert _ids(spark, fmt, table) == [2, 3, 4, 5, 6, 7]
        assert len(fmt._snapshot_meta(table, 3)["delete_files"]) == 2

        v = fmt.compact_deletes(spark, table)
        meta = fmt._snapshot_meta(table, v)
        assert meta.get("delete_files", []) == []  # vectors folded in
        assert _ids(spark, fmt, table) == [2, 3, 4, 5, 6, 7]
        # compacting again is a no-op
        assert fmt.compact_deletes(spark, table) == v

    def test_vacuum_reclaims_superseded_vectors(self, spark, tmp_path):
        fmt = ManifestParquetFormat()
        table = tmp_path / "t"
        fmt.write(spark.range(6).select(F.col("id").alias("x")), table)
        fmt.delete_keys(spark, table, spark.range(2).select(F.col("id").alias("x")), "x")
        fmt.compact_deletes(spark, table)
        deleted = fmt.vacuum(table, keep_last=1)
        assert any(d.startswith("deletes-") for d in deleted)
        assert any(d.startswith("data-") for d in deleted)
        assert _ids(spark, fmt, table) == [2, 3, 4, 5]

    def test_mixed_delete_key_rejected(self, spark, tmp_path):
        fmt = ManifestParquetFormat()
        table = tmp_path / "t"
        fmt.write(
            spark.range(4).select(F.col("id").alias("x"), (F.col("id") * 2).alias("y")),
            table,
        )
        fmt.delete_keys(spark, table, spark.range(1).select(F.col("id").alias("x")), "x")
        with pytest.raises(ValueError):
            fmt.delete_keys(
                spark, table, spark.range(1).select(F.col("id").alias("y")), "y"
            )

    def test_replace_preserves_delete_vectors(self, spark, tmp_path):
        """The atomic-swap verb must carry merge-on-read deletes: a
        staging table with vectors adopted into final must NOT
        resurrect the deleted rows (review finding, session 3)."""
        fmt = ManifestParquetFormat()
        staging, final = tmp_path / "staging", tmp_path / "final"
        fmt.write(spark.range(1).select(F.col("id").alias("x")), final)
        fmt.write(spark.range(10).select(F.col("id").alias("x")), staging)
        fmt.delete_keys(
            spark, staging, spark.range(3).select(F.col("id").alias("x")), "x"
        )
        fmt.replace(staging, final)
        assert _ids(spark, fmt, final) == [3, 4, 5, 6, 7, 8, 9]
        meta = fmt._snapshot_meta(final, fmt.current_version(final))
        assert meta["delete_key"] == "x" and meta["delete_files"]
        # and compaction still folds them after the move
        fmt.compact_deletes(spark, final)
        assert _ids(spark, fmt, final) == [3, 4, 5, 6, 7, 8, 9]


class TestStatsSkipping:
    """Zone maps: write(stats_cols=) + prune_files/read_pruned.

    Contract: pruning drops only files PROVEN irrelevant (min/max
    disjoint from the range), so a pruned read + residual filter equals
    the full read + the same filter — for any range, any layout."""

    def _table(self, spark, tmp_path, rows=2000, files=8):
        fmt = ManifestParquetFormat()
        table = tmp_path / "zoned"
        df = spark.range(rows).select(F.col("id").alias("k"))
        fmt.write(df.repartitionByRange(files, "k"), table, stats_cols=("k",))
        return fmt, table

    def test_pruned_scan_equals_filtered_full_scan(self, spark, tmp_path):
        fmt, table = self._table(spark, tmp_path)
        for lo, hi in [(0, 10), (500, 1500), (1990, 5000), (-5, -1), (0, 1999)]:
            got = sorted(
                r.k for r in fmt.read_pruned(spark, table, "k", lo, hi).collect()
            )
            want = sorted(
                r.k
                for r in fmt.read(spark, table)
                .filter(F.col("k").between(lo, hi))
                .collect()
            )
            assert got == want, (lo, hi)

    def test_narrow_range_skips_files(self, spark, tmp_path):
        fmt, table = self._table(spark, tmp_path)
        kept, total = fmt.prune_files(table, "k", 0, 10)
        assert total >= 4  # range-clustered layout produced several files
        assert len(kept) < total  # and a narrow range really skipped some
        none, _ = fmt.prune_files(table, "k", 10_000, 20_000)
        assert none == []  # fully out-of-range prunes everything

    def test_unstated_column_keeps_all_files(self, spark, tmp_path):
        fmt, table = self._table(spark, tmp_path)
        kept, total = fmt.prune_files(table, "not_indexed", 0, 1)
        assert len(kept) == total  # conservative: no bounds -> never skip

    def test_snapshot_without_stats_falls_back_to_full_list(self, spark, tmp_path):
        fmt = ManifestParquetFormat()
        table = tmp_path / "plain"
        fmt.write(spark.range(100).select(F.col("id").alias("k")), table)
        kept, total = fmt.prune_files(table, "k", 0, 5)
        assert len(kept) == total
        got = sorted(r.k for r in fmt.read_pruned(spark, table, "k", 0, 5).collect())
        assert got == [0, 1, 2, 3, 4, 5]

    def test_pruned_read_applies_delete_vectors(self, spark, tmp_path):
        fmt, table = self._table(spark, tmp_path, rows=100, files=4)
        dels = spark.createDataFrame([(2,), (3,), (98,)], "k long")
        fmt.delete_keys(spark, table, dels, "k")
        got = sorted(r.k for r in fmt.read_pruned(spark, table, "k", 0, 5).collect())
        assert got == [0, 1, 4, 5]  # 2 and 3 deleted merge-on-read


class TestWriteAuditPublish:
    def test_rejected_publish_leaves_readers_untouched(self, spark, tmp_path):
        from oroboro_dw_dbt_spark.engine import not_null
        from oroboro_dw_dbt_spark.engine.wap import publish_with_audit

        fmt = ManifestParquetFormat()
        table = tmp_path / "wap"
        clean = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
        ok, _ = publish_with_audit(spark, fmt, table, clean, [not_null("k")])
        assert ok and fmt.current_version(table) == 1

        dirty = spark.createDataFrame([(None, "x")], "k long, s string")
        ok, results = publish_with_audit(spark, fmt, table, dirty, [not_null("k")])
        assert not ok and results[0].n_violations == 1
        assert fmt.current_version(table) == 1  # pointer never moved
        assert sorted(r.k for r in fmt.read(spark, table).collect()) == [1, 2]

        # the failed stage is an orphan: vacuum reclaims it
        reclaimed = fmt.vacuum(table, keep_last=1)
        assert any("data-000002" in r for r in reclaimed)
        assert sorted(r.k for r in fmt.read(spark, table).collect()) == [1, 2]

    def test_stale_publish_refused(self, spark, tmp_path):
        fmt = ManifestParquetFormat()
        table = tmp_path / "stale"
        df = spark.range(3).select(F.col("id").alias("k"))
        v = fmt.stage(df, table)
        fmt.write(df, table)  # someone else commits meanwhile (v2... )
        with pytest.raises(ValueError, match="stale publish"):
            fmt.commit_staged(table, v)

    def test_commit_of_never_staged_version_fails(self, spark, tmp_path):
        fmt = ManifestParquetFormat()
        table = tmp_path / "nothing"
        fmt.write(spark.range(1).select(F.col("id").alias("k")), table)
        with pytest.raises(FileNotFoundError):
            fmt.commit_staged(table, 9)


class TestStatsTypes:
    def test_timestamp_stats_survive_json_and_prune(self, spark, tmp_path):
        """Footer stats for TIMESTAMP columns serialize as ISO strings;
        lexical overlap tests on same-format bounds still prune."""
        fmt = ManifestParquetFormat()
        table = tmp_path / "ts_zoned"
        df = spark.sql(
            "SELECT timestampadd(HOUR, CAST(id AS INT),"
            " timestamp'2024-01-01 00:00:00') AS t, id AS k"
            " FROM range(200)"
        )
        fmt.write(df.repartitionByRange(4, "t"), table, stats_cols=("t",))
        kept, total = fmt.prune_files(
            table, "t", "2024-01-01 00:00:00", "2024-01-01 05:00:00"
        )
        assert total == 4 and len(kept) < total
        got = fmt.read_pruned(
            spark, table, "t", "2024-01-01 00:00:00", "2024-01-01 05:00:00"
        )
        assert got.count() == 6  # hours 0..5 inclusive

    def test_timestamp_stats_survive_an_int96_caller_session(
        self, spark, tmp_path
    ):
        """The r07 driver red (`eng_metadata_count`): a caller session
        left at Spark's INT96 default writes timestamp columns with NO
        parquet footer statistics, so the manifest had no ts bounds and
        ``stats_summary`` refused. The write path must pin
        outputTimestampType itself (and restore the caller's value)."""
        fmt = ManifestParquetFormat()
        table = tmp_path / "ts_int96_caller"
        key = "spark.sql.parquet.outputTimestampType"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "INT96")  # the driver's bare-session default
        try:
            df = spark.sql(
                "SELECT timestampadd(HOUR, CAST(id AS INT),"
                " timestamp'2024-01-01 00:00:00') AS t, id AS k"
                " FROM range(48)"
            )
            fmt.write(df.repartition(4), table, stats_cols=("t", "k"))
            # the caller's conf must be untouched after the write
            assert spark.conf.get(key) == "INT96"
            s = fmt.stats_summary(table, cols=("t", "k"))
            assert s["n_rows"] == 48
            assert s["t"][0].startswith("2024-01-01 00:00:00")
            assert s["t"][1].startswith("2024-01-02 23:00:00")
            assert [int(s["k"][0]), int(s["k"][1])] == [0, 47]
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)

    def test_overlapping_writes_keep_the_pin_until_last_exit(self, spark):
        """Two concurrent manifest writers in one session must not race
        the conf set/restore (the WAP/branch API invites overlapping
        writers): the pin holds for the SECOND writer after the first
        exits, and the caller's value is restored only at the end."""
        from oroboro_dw_dbt_spark.engine.table_format import (
            _PIN_KEY,
            _stats_bearing_writes,
        )

        prev = spark.conf.get(_PIN_KEY, None)
        spark.conf.set(_PIN_KEY, "INT96")
        try:
            df = spark.range(1)
            with _stats_bearing_writes(df):
                assert spark.conf.get(_PIN_KEY) == "TIMESTAMP_MICROS"
                with _stats_bearing_writes(df):
                    assert spark.conf.get(_PIN_KEY) == "TIMESTAMP_MICROS"
                # inner exited: the pin must STILL hold for the outer
                assert spark.conf.get(_PIN_KEY) == "TIMESTAMP_MICROS"
            # last exit: the caller's value is restored
            assert spark.conf.get(_PIN_KEY) == "INT96"
        finally:
            if prev is None:
                spark.conf.unset(_PIN_KEY)
            else:
                spark.conf.set(_PIN_KEY, prev)

    def test_metadata_count_entry_under_driver_like_confs(self, spark):
        """End-to-end CI twin of the r08 bare-session sweep for the
        catalog entry that went red at r07: `eng_metadata_count` must
        produce numbers equal to a direct data scan even when the
        session carries the driver's defaults (INT96 parquet
        timestamps) rather than the factory's."""
        from oroboro_dw_dbt_spark.operators import QUERIES

        key = "spark.sql.parquet.outputTimestampType"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "INT96")
        try:
            sf = "/root/testdata/sf0.001"
            got = QUERIES["eng_metadata_count"].builder(spark, sf).collect()[0]
            truth = (
                spark.read.parquet(f"{sf}/events.parquet")
                .agg(
                    F.count("*").alias("n"),
                    F.min("ts").alias("lo"),
                    F.max("ts").alias("hi"),
                    F.min("user_id").alias("ulo"),
                    F.max("user_id").alias("uhi"),
                )
                .collect()[0]
            )
            assert (
                got["n_rows"],
                got["ts_min"],
                got["ts_max"],
                got["user_min"],
                got["user_max"],
            ) == (truth["n"], truth["lo"], truth["hi"], truth["ulo"], truth["uhi"])
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)


class TestBranches:
    def test_branch_isolation_and_fast_forward(self, spark, tmp_path):
        fmt = ManifestParquetFormat()
        table = tmp_path / "br"
        fmt.write(spark.createDataFrame([(1,)], "x long"), table)  # main v1
        v = fmt.write_branch(
            spark.createDataFrame([(10,), (11,)], "x long"), table, "exp"
        )
        # main readers untouched; branch readers see the branch head
        assert _ids(spark, fmt, table) == [1]
        assert sorted(
            r.x for r in fmt.read(spark, table, branch="exp").collect()
        ) == [10, 11]
        assert fmt.branches(table) == {"exp": v}
        # fast-forward publish: main now IS the branch head
        assert fmt.publish_branch(table, "exp") == v
        assert _ids(spark, fmt, table) == [10, 11]

    def test_two_branches_never_share_a_version(self, spark, tmp_path):
        fmt = ManifestParquetFormat()
        table = tmp_path / "br2"
        fmt.write(spark.createDataFrame([(1,)], "x long"), table)
        va = fmt.write_branch(spark.createDataFrame([(2,)], "x long"), table, "a")
        vb = fmt.write_branch(spark.createDataFrame([(3,)], "x long"), table, "b")
        assert va != vb
        assert sorted(r.x for r in fmt.read(spark, table, branch="a").collect()) == [2]
        assert sorted(r.x for r in fmt.read(spark, table, branch="b").collect()) == [3]

    def test_stale_branch_publish_refused(self, spark, tmp_path):
        fmt = ManifestParquetFormat()
        table = tmp_path / "br3"
        fmt.write(spark.createDataFrame([(1,)], "x long"), table)
        fmt.write_branch(spark.createDataFrame([(2,)], "x long"), table, "old")
        fmt.write(spark.createDataFrame([(9,)], "x long"), table)  # main advances
        fmt.write(spark.createDataFrame([(10,)], "x long"), table)  # past branch
        with pytest.raises(ValueError, match="stale publish"):
            fmt.publish_branch(table, "old")

    def test_vacuum_keeps_branch_heads_reclaims_dropped(self, spark, tmp_path):
        fmt = ManifestParquetFormat()
        table = tmp_path / "br4"
        fmt.write(spark.createDataFrame([(1,)], "x long"), table)
        fmt.write_branch(spark.createDataFrame([(2,)], "x long"), table, "keepme")
        v3 = fmt.write_branch(spark.createDataFrame([(3,)], "x long"), table, "gone")
        fmt.drop_branch(table, "gone")
        reclaimed = fmt.vacuum(table, keep_last=1)
        assert any(f"data-{v3:06d}" in r for r in reclaimed)  # dropped branch gone
        assert sorted(
            r.x for r in fmt.read(spark, table, branch="keepme").collect()
        ) == [2]  # live branch survived the vacuum
        assert _ids(spark, fmt, table) == [1]


class TestReviewRegressions:
    """Round-6 self-review findings, pinned."""

    def test_presence_only_diff_with_no_compare_cols(self, spark, tmp_path):
        from oroboro_dw_dbt_spark.engine.diff import snapshot_diff

        fmt = ManifestParquetFormat()
        table = tmp_path / "presence"
        fmt.write(spark.createDataFrame([(1,), (2,)], "k long"), table)
        fmt.write(spark.createDataFrame([(2,), (3,)], "k long"), table)
        d = snapshot_diff(spark, fmt, table, 1, 2, ("k",), ())
        got = {r.k: r.op for r in d.collect()}
        assert got == {1: "D", 3: "I"}  # presence-only: no U possible

    def test_timestamp_prune_accepts_typed_and_fractionless_bounds(
        self, spark, tmp_path
    ):
        from datetime import datetime

        fmt = ManifestParquetFormat()
        table = tmp_path / "ts_bounds"
        df = spark.sql(
            "SELECT timestampadd(HOUR, CAST(id AS INT),"
            " timestamp'2024-01-01 00:00:00') AS t FROM range(100)"
        )
        fmt.write(df.repartitionByRange(4, "t"), table, stats_cols=("t",))
        # typed datetime bounds must not TypeError against string stats
        kept_dt, total = fmt.prune_files(
            table, "t", datetime(2024, 1, 1, 0), datetime(2024, 1, 1, 3)
        )
        assert kept_dt and len(kept_dt) < total
        # a bound equal to a file's max must KEEP that file even though
        # the spellings differ in the fractional part
        got = fmt.read_pruned(
            spark, table, "t", "2024-01-01 03:00:00", "2024-01-01 03:00:00"
        )
        assert got.count() == 1

    def test_crashed_branch_tmp_is_not_a_phantom_branch(self, spark, tmp_path):
        fmt = ManifestParquetFormat()
        table = tmp_path / "phantom"
        fmt.write(spark.createDataFrame([(1,)], "x long"), table)
        # simulate a crash between tmp write and the pointer swap
        (fmt._manifest_dir(table) / ".tmp-BRANCH-exp.7").write_text("7")
        assert fmt.branches(table) == {}
        with pytest.raises(ValueError, match="invalid branch name"):
            fmt._branch_file(table, "a.tmp.3")  # dotted names refused

    def test_vacuum_grace_protects_inflight_stage(self, spark, tmp_path):
        fmt = ManifestParquetFormat()
        table = tmp_path / "grace"
        fmt.write(spark.createDataFrame([(1,)], "x long"), table)
        v = fmt.stage(spark.createDataFrame([(2,)], "x long"), table)
        assert fmt.vacuum(table, keep_last=1, stage_grace_s=3600) == []
        fmt.commit_staged(table, v)  # the audit can still publish
        assert _ids(spark, fmt, table) == [2]
        # without grace the same fresh stage is reclaimed immediately
        fmt.stage(spark.createDataFrame([(3,)], "x long"), table)
        assert fmt.vacuum(table, keep_last=1) != []
