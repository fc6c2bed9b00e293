"""Readers for the driver-generated synthetic tables (TESTDATA.md).

TPC-H-ish star schema plus ``events`` (event stream), ``documents``
(text corpus) and ``embeddings`` (vector table). Parquet only — the
reference's one connector is its warehouse adapter
(ref: profiles.example.yml:5); ours is the columnar Parquet scan, which
gives Catalyst filter pushdown + column pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet has shipped with either TIMESTAMP(NANOS) — which
    Spark's vectorized parquet reader rejects — or plain µs timestamps.
    Read ns as long (legacy conf, runtime-settable) and truncate to
    microseconds — byte-identical to DuckDB's own ns→µs truncation
    (verified on this data)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Naive parquet timestamps (isAdjustedToUTC=false) arrive as
    TIMESTAMP_NTZ under Spark 4's inferTimestampNTZ default. The whole
    repo — and the DuckDB oracle comparison — treats event time as
    UTC-instant TIMESTAMP, so cast NTZ columns up front; the session
    timezone is pinned to UTC (session.py), making the cast
    value-preserving. One choke point here beats NTZ-guarding every
    downstream timestamp subtraction/window."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; available: {TABLES}")
    if name == "events":
        return _normalize_ntz(_load_events(spark, sf_dir))
    return _normalize_ntz(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() queries."""
    for n in TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
