"""The corpus-build DAG: the training-data pipeline AS an engine model
graph.

The reference demonstrates the engine's lifecycle on a BI mart
(models/reference_models.py); this graph demonstrates the same
lifecycle — views, a partitioned table mart, data tests, tag selection
— on the OTHER domain this engine exists for: turning raw documents
into training shards. Four models, each one operator deep:

    documents (source)
      └─ docs_clean     (view)  quality_filter keep-rows only
           └─ docs_dedup (view)  exact dedup, first doc_id per fingerprint
                └─ docs_mixed (view)  per-source weighted keep rates
                     └─ corpus_shards (table, partitioned by source)
                          token-budget shard assignment + data tests

Scale: the three views fuse into one scan-shaped plan (filters are
row-local, dedup is one shuffle on fingerprint, mix is row-local); the
only other shuffle is the per-source packing window. The mart writes
partitioned by source, so shard readers prune to their source, and the
write goes through the engine's backup-first swap (table_format.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oroboro_dw_dbt_spark.engine.dag import ModelGraph, SourceRegistry, model
from oroboro_dw_dbt_spark.engine.tests import not_null, unique_combination_of_columns
from oroboro_dw_dbt_spark.ops import weighted_mix
from oroboro_dw_dbt_spark.text.analysis import doc_fingerprint
from oroboro_dw_dbt_spark.text.pipeline import pack_shards, quality_filter

MIX_WEIGHTS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.0}
MIX_DEFAULT = 0.1
SHARD_BUDGET = 2000


def build_corpus_graph(
    sources: SourceRegistry, warehouse_dir: str | None = None
) -> ModelGraph:
    @model(name="docs_clean", materialized="view", tags=("corpus",))
    def docs_clean(documents):
        kept = quality_filter(documents).filter(F.col("keep")).select("doc_id")
        return documents.join(kept, "doc_id")

    @model(name="docs_dedup", materialized="view", tags=("corpus",))
    def docs_dedup(docs_clean):
        w = Window.partitionBy("fingerprint").orderBy(F.col("doc_id").asc())
        return (
            docs_clean.withColumn("fingerprint", doc_fingerprint("text"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "fingerprint")
        )

    @model(name="docs_mixed", materialized="view", tags=("corpus",))
    def docs_mixed(docs_dedup):
        return weighted_mix(
            docs_dedup, "source", MIX_WEIGHTS, ["doc_id"], default_weight=MIX_DEFAULT
        )

    @model(
        name="corpus_shards",
        materialized="table" if warehouse_dir else "view",
        tags=("corpus", "marts"),
        partition_by=("source",) if warehouse_dir else (),
        tests=(
            not_null("doc_id"),
            unique_combination_of_columns("source", "shard_id", "doc_id"),
        ),
    )
    def corpus_shards(docs_mixed):
        return pack_shards(docs_mixed, budget=SHARD_BUDGET)

    graph = ModelGraph(sources, warehouse_dir=warehouse_dir)
    graph.add(docs_clean, docs_dedup, docs_mixed, corpus_shards)
    return graph
