"""PageRank invariants (ops/graph.py): conservation, dangling mass,
known closed forms."""

from __future__ import annotations

import pytest

from oroboro_dw_dbt_spark.ops.graph import SCALE, pagerank


def _pr(spark, edges, iterations=5):
    df = spark.createDataFrame(edges, "src string, dst string, w bigint")
    return {
        r["node"]: r["r"] for r in pagerank(df, iterations=iterations).collect()
    }


def test_rank_mass_conserved(spark):
    """Total rank stays ~1.0: dangling redistribution means no mass
    leaks (up to integer-floor quantization, << 1e-6 of total)."""
    edges = [("a", "b", 3), ("b", "c", 1), ("c", "a", 2), ("a", "c", 1)]
    ranks = _pr(spark, edges)
    assert abs(sum(ranks.values()) - SCALE) < 100  # a few floor ops of loss


def test_symmetric_cycle_is_uniform(spark):
    """A 3-cycle with equal weights has the uniform stationary
    distribution — each node exactly 1/3 at any iteration count."""
    edges = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)]
    ranks = _pr(spark, edges, iterations=7)
    third = SCALE // 3
    for v in ranks.values():
        assert abs(v - third) < 100


def test_sink_accumulates_rank(spark):
    """star -> hub: the hub (everyone's target, itself dangling) must
    out-rank the leaves."""
    edges = [("a", "hub", 1), ("b", "hub", 1), ("c", "hub", 1)]
    ranks = _pr(spark, edges)
    assert ranks["hub"] > ranks["a"] == ranks["b"] == ranks["c"]


def test_weights_matter(spark):
    """Heavier edge => more rank at its target (b gets 3/4 of a's
    out-mass vs c's 1/4)."""
    edges = [("a", "b", 3), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)]
    ranks = _pr(spark, edges)
    assert ranks["b"] > ranks["c"]


def test_deterministic_across_partitionings(spark):
    """Fixed-point arithmetic: the same graph under a different
    partition count yields bit-identical ranks."""
    edges = [(f"n{i}", f"n{(i * 7 + 1) % 13}", i % 3 + 1) for i in range(13)]
    df1 = spark.createDataFrame(edges, "src string, dst string, w bigint")
    df2 = df1.repartition(17, "dst")
    r1 = {r["node"]: r["r"] for r in pagerank(df1, 4).collect()}
    r2 = {r["node"]: r["r"] for r in pagerank(df2, 4).collect()}
    assert r1 == r2


def test_label_propagation_recovers_regions(spark):
    """On the intra-region trade graph the ground-truth communities are
    the region cliques: after convergence every nation in a connected
    intra-region component shares one label, and labels never cross
    regions."""
    from oroboro_dw_dbt_spark.operators.analytics_suite import gr_label_propagation
    from tests.conftest import SF_SMOKE

    labels = {r["node"]: r["label"] for r in gr_label_propagation(spark, SF_SMOKE).collect()}
    nation = {
        r["n_nationkey"]: r["n_regionkey"]
        for r in spark.read.parquet(f"{SF_SMOKE}/nation.parquet").collect()
    }
    assert labels, "graph must be non-empty"
    # a label is itself a nation id; its region must match the node's
    for node, label in labels.items():
        assert nation[node] == nation[label], "label crossed a region boundary"


def test_label_propagation_deterministic_rerun(spark):
    """Two runs over a differently-partitioned copy of the same edges
    produce identical labels (the determinism contract)."""
    from pyspark.sql import functions as F

    from oroboro_dw_dbt_spark.ops.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 5), (3, 1, 1), (10, 11, 2), (11, 12, 2)],
        "src int, dst int, w int",
    )
    a = sorted(map(tuple, label_propagation(edges, iterations=4).collect()))
    b = sorted(
        map(tuple, label_propagation(edges.repartition(7), iterations=4).collect())
    )
    assert a == b


class TestSssp:
    def test_known_graph_distances(self, spark):
        """Hand-checkable graph: the relaxation must find the cheap
        2-hop route over the expensive direct edge, and leave the
        disconnected node NULL."""
        from oroboro_dw_dbt_spark.ops.graph import sssp

        edges = spark.createDataFrame(
            [(0, 1, 10), (0, 2, 1), (2, 1, 2), (1, 3, 1), (4, 5, 1)],
            "src long, dst long, w long",
        )
        got = {r.node: r.dist for r in sssp(edges, source=0, rounds=5).collect()}
        assert got == {0: 0, 1: 3, 2: 1, 3: 4, 4: None, 5: None}

    def test_rounds_bound_hop_depth(self, spark):
        """With rounds < path length the tail stays NULL — the bounded
        contract the oracle unrolls round-for-round."""
        from oroboro_dw_dbt_spark.ops.graph import sssp

        chain = spark.createDataFrame(
            [(i, i + 1, 1) for i in range(4)], "src long, dst long, w long"
        )
        got = {r.node: r.dist for r in sssp(chain, source=0, rounds=2).collect()}
        assert got == {0: 0, 1: 1, 2: 2, 3: None, 4: None}
