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
