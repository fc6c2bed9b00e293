"""Engine-core tests: source registry, DAG build order, materialization
semantics, and the dbt-style data tests (violating-rows contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oroboro_dw_dbt_spark.engine import (
    ModelGraph,
    SourceRegistry,
    accepted_values,
    model,
    not_null,
    relationship,
    unique_combination_of_columns,
)


@pytest.fixture()
def sources(spark):
    reg = SourceRegistry()
    reg.add_provider(
        "raw_users",
        lambda s: s.createDataFrame(
            [(1, "a@x.com", 10), (2, "b@x.com", None), (3, None, 20)],
            "id long, email string, loc_id long",
        ),
    )
    reg.add_provider(
        "raw_locs",
        lambda s: s.createDataFrame([(10, "NY"), (20, "SF")], "id long, city string"),
    )
    return reg


def build_graph(sources, tmp_path):
    @model(materialized="view", tags=("intermediate",))
    def users_clean(raw_users):
        return raw_users.filter(F.col("email").isNotNull())

    @model(
        materialized="table",
        tags=("marts",),
        tests=(not_null("id"), unique_combination_of_columns("id", "city")),
    )
    def user_mart(users_clean, raw_locs):
        return users_clean.join(
            raw_locs.withColumnRenamed("id", "loc_id"), "loc_id", "left"
        ).select("id", "email", "city")

    g = ModelGraph(sources, warehouse_dir=str(tmp_path), threads=2)
    g.add(users_clean, user_mart)
    return g


def test_topo_order(sources, tmp_path):
    g = build_graph(sources, tmp_path)
    order = g.topo_order()
    assert order.index("users_clean") < order.index("user_mart")


def test_independent_models_run_concurrently(spark, sources, tmp_path):
    """dbt's `threads: 4` behavior (profiles.example.yml:9): independent
    DAG nodes must actually OVERLAP in time on the thread pool — and the
    built frames must be identical to a threads=1 run (determinism under
    concurrency)."""
    import time

    spans: dict[str, tuple[float, float]] = {}

    def instrumented(name):
        def build(raw_users):
            t0 = time.monotonic()
            time.sleep(0.4)  # long enough that overlap is unambiguous
            spans[name] = (t0, time.monotonic())
            return raw_users.filter(F.col("id").isNotNull())

        build.__name__ = name
        return build

    def make_graph(threads):
        g = ModelGraph(sources, warehouse_dir=str(tmp_path), threads=threads)
        g.add(model()(instrumented("left_branch")), model()(instrumented("right_branch")))
        return g

    spans.clear()
    make_graph(2).run(spark)
    (a0, a1), (b0, b1) = spans["left_branch"], spans["right_branch"]
    assert max(a0, b0) < min(a1, b1), "independent models did not overlap"

    spans.clear()
    make_graph(1).run(spark)
    (a0, a1), (b0, b1) = spans["left_branch"], spans["right_branch"]
    assert max(a0, b0) >= min(a1, b1), "threads=1 must serialize"

    # determinism: concurrent and serial runs build identical frames
    g2, g1 = make_graph(2), make_graph(1)
    g2.run(spark)
    out2 = {n: sorted(map(tuple, g2.frame(n).collect())) for n in ("left_branch", "right_branch")}
    g1.run(spark)
    out1 = {n: sorted(map(tuple, g1.frame(n).collect())) for n in ("left_branch", "right_branch")}
    assert out1 == out2


def test_strict_tests_halt_downstream(spark, sources, tmp_path):
    """dbt build semantics: a failed data test under strict_tests=True
    raises and nothing downstream of the failed model is built; the
    default (strict_tests=False) records the failure and continues."""
    from oroboro_dw_dbt_spark.engine.dag import ModelTestsFailed

    built = []

    @model(tests=(not_null("email"),))  # raw_users has a NULL email
    def flaky_int(raw_users):
        built.append("flaky_int")
        return raw_users

    @model()
    def downstream(flaky_int):
        built.append("downstream")
        return flaky_int

    g = ModelGraph(sources, warehouse_dir=str(tmp_path), threads=2)
    g.add(flaky_int, downstream)

    with pytest.raises(ModelTestsFailed, match="flaky_int.*not_null"):
        g.run(spark, strict_tests=True)
    assert built == ["flaky_int"]  # downstream never scheduled

    built.clear()
    results = g.run(spark)  # default: report, don't halt
    assert built == ["flaky_int", "downstream"]
    assert not results["flaky_int"].tests_passed


class TestOnSchemaChange:
    """dbt's on_schema_change contract for incremental models."""

    def _graph(self, spark, tmp_path, policy):
        state = {"v": 1}

        @model(
            name="inc",
            materialized="incremental",
            unique_key=("id",),
            on_schema_change=policy,
        )
        def inc(raw_users):
            df = raw_users.select("id", F.lit(state["v"]).alias("batch"))
            if state["v"] == 2:
                df = df.withColumn("extra", F.lit("new"))
            return df

        reg = SourceRegistry()
        reg.add_provider(
            "raw_users",
            lambda s: s.createDataFrame([(1,), (2,)], "id long"),
        )
        g = ModelGraph(reg, warehouse_dir=str(tmp_path), threads=1)
        g.add(inc)
        return g, state

    def test_ignore_drops_new_columns(self, spark, tmp_path):
        g, state = self._graph(spark, tmp_path, "ignore")
        g.run(spark, run_tests=False)
        state["v"] = 2
        g.run(spark, run_tests=False)
        out = g.frame("inc")
        assert set(out.columns) == {"id", "batch"}  # table schema kept
        assert {r.batch for r in out.collect()} == {2}

    def test_append_new_columns_nulls_history(self, spark, tmp_path):
        g, state = self._graph(spark, tmp_path, "append_new_columns")
        g.run(spark, run_tests=False)
        state["v"] = 2
        g.run(spark, run_tests=False)
        out = g.frame("inc")
        assert set(out.columns) == {"id", "batch", "extra"}
        assert {r.extra for r in out.collect()} == {"new"}  # all keys re-delivered

    def test_fail_policy_raises(self, spark, tmp_path):
        g, state = self._graph(spark, tmp_path, "fail")
        g.run(spark, run_tests=False)
        state["v"] = 2
        with pytest.raises(ValueError, match="on_schema_change='fail'"):
            g.run(spark, run_tests=False)

    def test_removed_column_always_errors(self, spark, tmp_path):
        state = {"v": 1}

        @model(name="inc2", materialized="incremental", unique_key=("id",))
        def inc2(raw_users):
            df = raw_users.select("id", F.lit("x").alias("keep"))
            if state["v"] == 2:
                df = df.select("id")  # drops a promised column
            return df

        reg = SourceRegistry()
        reg.add_provider(
            "raw_users", lambda s: s.createDataFrame([(1,)], "id long")
        )
        g = ModelGraph(reg, warehouse_dir=str(tmp_path), threads=1)
        g.add(inc2)
        g.run(spark, run_tests=False)
        state["v"] = 2
        with pytest.raises(ValueError, match="dropped column"):
            g.run(spark, run_tests=False)

    def test_full_refresh_rebuilds_incremental(self, spark, tmp_path):
        """dbt --full-refresh: the incremental table rebuilds from this
        run's output alone — v1-only keys vanish instead of surviving
        the merge."""
        state = {"rows": [(1, "v1"), (2, "v1")]}

        @model(name="inc3", materialized="incremental", unique_key=("id",))
        def inc3(raw_users):
            return spark.createDataFrame(state["rows"], "id long, batch string")

        reg = SourceRegistry()
        reg.add_provider("raw_users", lambda s: s.createDataFrame([(1,)], "id long"))
        g = ModelGraph(reg, warehouse_dir=str(tmp_path), threads=1)
        g.add(inc3)
        g.run(spark, run_tests=False)
        state["rows"] = [(2, "v2")]
        g.run(spark, run_tests=False)  # normal merge: key 1 survives
        assert {(r.id, r.batch) for r in g.frame("inc3").collect()} == {
            (1, "v1"),
            (2, "v2"),
        }
        state["rows"] = [(3, "v3")]
        g.run(spark, run_tests=False, full_refresh=True)
        assert {(r.id, r.batch) for r in g.frame("inc3").collect()} == {(3, "v3")}

    def test_this_gives_incremental_models_their_own_state(self, spark, tmp_path):
        """dbt's {{ this }} / is_incremental(): the model sees its own
        existing table (None on first build) and self-derives the delta
        cutoff — run 2 must only process rows newer than what the table
        already holds."""
        from pyspark.sql import functions as F2

        seen_inputs = []

        @model(name="inc4", materialized="incremental", unique_key=("id",))
        def inc4(raw_rows, this):
            df = raw_rows
            if this is not None:
                cutoff = this.agg(F2.max("id")).first()[0]
                df = df.filter(F2.col("id") > cutoff)
            seen_inputs.append(df.count())
            return df

        state = {"rows": [(1,), (2,)]}
        reg = SourceRegistry()
        reg.add_provider(
            "raw_rows", lambda s: s.createDataFrame(state["rows"], "id long")
        )
        g = ModelGraph(reg, warehouse_dir=str(tmp_path), threads=1)
        g.add(inc4)
        g.run(spark, run_tests=False)
        assert seen_inputs == [2]  # first build: this is None, full load
        state["rows"] = [(1,), (2,), (3,)]  # one new row arrives
        g.run(spark, run_tests=False)
        assert seen_inputs == [2, 1]  # delta only: the model filtered on this
        assert {r.id for r in g.frame("inc4").collect()} == {1, 2, 3}

    def test_this_rejected_on_non_incremental(self, spark, sources, tmp_path):
        @model(name="v_this")
        def v_this(raw_users, this):
            return raw_users

        g = ModelGraph(sources, warehouse_dir=str(tmp_path))
        g.add(v_this)
        with pytest.raises(ValueError, match="'this'"):
            g.run(spark, run_tests=False)

    def test_invalid_policy_rejected(self):
        with pytest.raises(ValueError, match="on_schema_change"):
            model(
                name="bad",
                materialized="incremental",
                unique_key=("id",),
                on_schema_change="explode",
            )(lambda raw_users: raw_users)


def test_manifest_exports_lineage_and_config(sources, tmp_path):
    """dbt docs-generate parity: the manifest must carry each node's
    config, split model vs source lineage, and a valid build order —
    as pure metadata, without a Spark session."""
    import json

    g = build_graph(sources, tmp_path)
    m = g.manifest()
    assert set(m["nodes"]) == {"users_clean", "user_mart"}
    mart = m["nodes"]["user_mart"]
    assert mart["materialized"] == "table"
    assert mart["depends_on"] == {"models": ["users_clean"], "sources": ["raw_locs"]}
    assert mart["tests"] == [
        "not_null(id)",
        "unique_combination_of_columns(id, city)",
    ]
    assert m["nodes"]["users_clean"]["depends_on"]["sources"] == ["raw_users"]
    order = m["build_order"]
    assert order.index("users_clean") < order.index("user_mart")
    json.dumps(m)  # must be a plain serializable artifact


def test_compact_table_reduces_files_preserves_rows(spark, tmp_path):
    """Compaction must shrink the file count to the computed target and
    leave the table's rows bit-identical (and survive via the staged
    swap, so the dir is never missing)."""
    from oroboro_dw_dbt_spark.engine import compact_table
    from oroboro_dw_dbt_spark.engine.maintenance import data_file_stats

    path = tmp_path / "events_table"
    df = spark.range(50_000).selectExpr(
        "id", "id % 97 AS k", "sha2(cast(id AS string), 256) AS payload"
    )
    df.repartition(32).write.parquet(str(path))
    n_before, total = data_file_stats(path)
    assert n_before >= 32
    before = sorted(map(tuple, spark.read.parquet(str(path)).collect()))

    # target ≈ half the table per file → expect exactly 2 output files
    out = compact_table(spark, path, target_file_bytes=(total + 1) // 2)
    n_after, _ = data_file_stats(path)
    assert n_after == 2, n_after
    after = sorted(map(tuple, out.collect()))
    assert after == before


def test_compact_table_partitioned_one_file_per_value(spark, tmp_path):
    """A hive-partitioned table compacts to one data file per partition
    value (the layout is the size policy), rows intact."""
    from oroboro_dw_dbt_spark.engine import compact_table
    from oroboro_dw_dbt_spark.engine.maintenance import data_file_stats

    path = tmp_path / "part_table"
    df = spark.range(10_000).selectExpr("id", "id % 4 AS bucket")
    df.repartition(8).write.partitionBy("bucket").parquet(str(path))
    n_before, _ = data_file_stats(path)
    assert n_before > 4  # several small files per partition value
    before = sorted(map(tuple, spark.read.parquet(str(path)).collect()))

    out = compact_table(spark, path, partition_by=("bucket",))
    n_after, _ = data_file_stats(path)
    assert n_after == 4, n_after  # exactly one file per bucket value
    assert sorted(map(tuple, out.collect())) == before


def test_compact_table_empty_dir_fails_loudly(spark, tmp_path):
    from oroboro_dw_dbt_spark.engine import compact_table

    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError):
        compact_table(spark, tmp_path / "empty")


def test_scheduler_is_work_queue_not_wave(spark, sources, tmp_path):
    """A finished node must release its dependents immediately — the
    child of the FAST branch starts while the slow independent sibling
    is still building (wave scheduling would block it)."""
    import time

    from oroboro_dw_dbt_spark.engine.dag import Model

    spans: dict[str, tuple[float, float]] = {}

    def timed(name, secs):
        def build(**deps):  # called with dep-name kwargs by the engine
            t0 = time.monotonic()
            time.sleep(secs)
            spans[name] = (t0, time.monotonic())
            return next(iter(deps.values()))

        return build

    g = ModelGraph(sources, warehouse_dir=str(tmp_path), threads=4)
    g.add(
        Model(name="fast", fn=timed("fast", 0.1), deps=("raw_users",)),
        Model(name="slow", fn=timed("slow", 0.8), deps=("raw_users",)),
        Model(name="fast_child", fn=timed("fast_child", 0.1), deps=("fast",)),
    )
    g.run(spark)
    assert spans["fast_child"][0] < spans["slow"][1], (
        "fast_child waited for the slow sibling — wave barrier is back"
    )


def test_run_builds_and_tests_pass(spark, sources, tmp_path):
    g = build_graph(sources, tmp_path)
    results = g.run(spark)
    assert set(results) == {"users_clean", "user_mart"}
    assert all(r.tests_passed for r in results.values())
    mart = g.frame("user_mart")
    rows = {r["id"]: r["city"] for r in mart.collect()}
    assert rows == {1: "NY", 2: None}  # user 3 dropped (null email)
    # table materialization persisted to the warehouse
    assert (tmp_path / "user_mart").exists()
    # temp views registered
    assert spark.sql("select count(*) c from user_mart").first()["c"] == 2


def test_select_subset_pulls_upstream_closure(spark, sources, tmp_path):
    g = build_graph(sources, tmp_path)
    results = g.run(spark, select=["user_mart"])
    assert set(results) == {"users_clean", "user_mart"}


def test_missing_dep_raises(sources, tmp_path):
    @model()
    def broken(nonexistent_table):
        return None

    g = ModelGraph(sources).add(broken)
    with pytest.raises(KeyError, match="nonexistent_table"):
        g.topo_order()


def test_data_test_failures_reported(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (None, "y")], "id long, v string"
    )
    r = not_null("id").run(df)
    assert not r.passed and r.n_violations == 1
    r = unique_combination_of_columns("id", "v").run(df)
    assert not r.passed and r.n_violations == 1
    r = accepted_values("v", ("x", "y")).run(df)
    assert r.passed
    r = accepted_values("v", ("x",)).run(df)
    assert not r.passed


def test_relationship_test(spark):
    dim = spark.createDataFrame([(10,), (20,)], "id long")
    fact = spark.createDataFrame([(1, 10), (2, 99), (3, None)], "k long, id long")
    r = relationship("id", dim, "id").run(fact)
    assert not r.passed and r.n_violations == 1  # only the 99; NULL FK allowed


def test_ephemeral_inlined_not_registered(spark, sources, tmp_path):
    @model(materialized="ephemeral")
    def users_eph(raw_users):
        return raw_users.filter(F.col("email").isNotNull())

    @model(materialized="table")
    def mart(users_eph):
        return users_eph.select("id", "email")

    g = ModelGraph(sources, warehouse_dir=str(tmp_path), threads=1)
    g.add(users_eph, mart)
    g.run(spark, run_tests=False)
    assert g.frame("mart").count() == 2
    assert not spark.catalog.tableExists("users_eph")
    assert not (tmp_path / "users_eph").exists()


def test_partitioned_table_write(spark, sources, tmp_path):
    @model(materialized="table", partition_by=("city",))
    def by_city(raw_locs):
        return raw_locs

    g = ModelGraph(sources, warehouse_dir=str(tmp_path), threads=1)
    g.add(by_city)
    g.run(spark, run_tests=False)
    # hive-style partition dirs on disk → downstream filters prune
    assert (tmp_path / "by_city" / "city=NY").exists()
    assert g.frame("by_city").filter(F.col("city") == "SF").count() == 1


def test_incremental_merge_by_key(spark, tmp_path):
    batches = {
        "n": 1,
        1: [(1, "a", "2024-01-01"), (2, "b", "2024-01-01")],
        2: [(2, "B2", "2024-01-02"), (3, "c", "2024-01-02")],
    }
    reg = SourceRegistry()
    reg.add_provider(
        "raw_batch",
        lambda s: s.createDataFrame(
            batches[batches["n"]], "id long, val string, day string"
        ),
    )

    @model(materialized="incremental", unique_key=("id",))
    def inc(raw_batch):
        return raw_batch

    g = ModelGraph(reg, warehouse_dir=str(tmp_path), threads=1)
    g.add(inc)
    g.run(spark, run_tests=False)
    assert g.frame("inc").count() == 2

    batches["n"] = 2
    g.run(spark, run_tests=False)
    rows = {r.id: (r.val, r.day) for r in g.frame("inc").collect()}
    # key 1 kept from batch 1; key 2 replaced; key 3 inserted
    assert rows == {
        1: ("a", "2024-01-01"),
        2: ("B2", "2024-01-02"),
        3: ("c", "2024-01-02"),
    }


def test_incremental_requires_unique_key():
    with pytest.raises(ValueError, match="unique_key"):
        @model(materialized="incremental")
        def bad(raw_batch):  # pragma: no cover
            return raw_batch


def test_csv_json_sources(spark, tmp_path):
    (tmp_path / "u.csv").write_text("id,name\n1,ann\n2,bo\n")
    (tmp_path / "v.json").write_text('{"id": 1, "score": 0.5}\n{"id": 2, "score": 0.9}\n')
    reg = SourceRegistry()
    reg.add_path(
        "u", str(tmp_path / "u.csv"), schema="id long, name string",
        format="csv", options={"header": "true"},
    )
    reg.add_path("v", str(tmp_path / "v.json"), schema="id long, score double", format="json")
    u, v = reg.load(spark, "u"), reg.load(spark, "v")
    joined = u.join(v, "id")
    assert joined.count() == 2
    assert {r.name for r in joined.collect()} == {"ann", "bo"}


def test_tag_selection(spark, sources, tmp_path):
    g = build_graph(sources, tmp_path)
    # tag:marts selects user_mart; its upstream closure comes along
    results = g.run(spark, select=["tag:marts"])
    assert set(results) == {"users_clean", "user_mart"}
    results = g.run(spark, select=["tag:intermediate"])
    assert set(results) == {"users_clean"}
    with pytest.raises(KeyError, match="no model carries tag"):
        g.run(spark, select=["tag:nope"])
    with pytest.raises(KeyError, match="unknown model"):
        g.run(spark, select=["not_a_model"])


def test_replace_restores_backup_on_failed_swap(tmp_path):
    """A failed staging→final rename must put the ORIGINAL table back —
    the crash window of a naive rmtree+rename loses the table."""
    from oroboro_dw_dbt_spark.engine.table_format import LocalParquetFormat

    fmt = LocalParquetFormat()
    final = tmp_path / "t"
    final.mkdir()
    (final / "part-0.parquet").write_text("original")
    with pytest.raises(OSError):
        fmt.replace(tmp_path / "missing_staging", final)
    assert (final / "part-0.parquet").read_text() == "original"
