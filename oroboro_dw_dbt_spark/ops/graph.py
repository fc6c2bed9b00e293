"""Distributed connected components — the dedup-clustering step.

Near-dup detection (MinHash-LSH, SimHash, embedding-cosine) emits PAIRS;
a training-data pipeline needs GROUPS ("keep one doc per duplicate
cluster"), i.e. connected components of the pair graph. Spark has no
built-in, so this is iterative min-label propagation on DataFrames
(the simple variant of Kiveris et al. 2014 "Connected Components in
MapReduce and Beyond"):

    comp(v) ← min(comp(v), min over neighbors u of comp(u))

repeated to fixpoint. Each sweep is one shuffle (join + groupBy-min);
the iteration count is the graph diameter, which for near-dup clusters
is tiny (dup clusters are dense, diameters of 1-3). Lineage is
truncated per sweep with an eager localCheckpoint — without it the plan
doubles every iteration and the job dies on plan explosion long before
data size matters (cluster substitute: persist/checkpoint dir, same as
the MinHash index note in SCALE.md).

The result is deterministic (min over an unordered set), so the DuckDB
oracle is a recursive-CTE transitive closure taking min(reachable ∪
self) — same answer by a different, driver-checkable route.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = the minimum node id reachable from the node. Raises if
    not converged within ``max_iter`` sweeps (diameter bound)."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        sym.unionByName(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .dropDuplicates()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["a"] == labels["node"])
            .select(F.col("b").alias("node"), "comp")
            .groupBy("node")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components: not converged after {max_iter} sweeps")
