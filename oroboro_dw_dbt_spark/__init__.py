"""oroboro_dw_dbt_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference dbt
project ``moizbukhari1996/oroboro-dw-dbt`` (a declarative SQL model DAG
over 14 raw tables producing a ``user_base`` mart), built Spark-first:

- ``engine``    — the dbt-equivalent: source registry, @model decorator,
                  DAG topo-sort executor, view/table materialization,
                  declarative data tests (ref: dbt_project.yml:1-17,
                  models/sources.yml:1-20, models/marts/marts_schema.yml:1-16).
- ``functions`` — BigQuery-dialect compatibility shims (SAFE.PARSE_DATE,
                  date_diff-year, st_distance, format_date) as native
                  Column expressions (no Python UDFs in the hot path).
- ``models``    — the three reference models re-implemented on DataFrames
                  (ref: models/intermediate/*.sql, models/marts/user_base.sql).
- ``operators`` — the relational operator surface (joins, windows, aggs,
                  set ops) exercised as standalone queries for the
                  correctness harness.
- ``ops``       — large-scale training-data pipeline operators beyond the
                  reference: dedup (exact/MinHash-LSH/SimHash/Jaccard),
                  similarity search, text analysis, multimodal columns.
- ``streaming`` — Structured Streaming equivalents for the event table.

Everything here derives from the public Apache Spark API and the
reference's observable behavior only.
"""

__version__ = "0.1.0"

from oroboro_dw_dbt_spark.session import get_spark  # noqa: F401
