"""SparkSession factory.

One place to pin every config that affects correctness or scale:

- ANSI mode stays ON (Spark 4 default). All BigQuery ``SAFE.*``
  semantics are expressed through ``try_*`` functions instead of
  globally disabling ANSI (SURVEY §7.2 decision).
- UTC session timezone so timestamp comparisons against the DuckDB
  oracle (UTC-naive) are stable.
- AQE on: runtime shuffle-partition coalescing, skew-join splitting,
  and broadcast-join demotion/promotion — the scale story for joins
  on skewed keys (NULL-heavy FKs, hot partners) is delegated here
  rather than hand-salted, matching how the reference delegated the
  same concerns to BigQuery (SURVEY §4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "oroboro_dw_dbt_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session with scale-aware defaults.

    ``shuffle_partitions`` defaults to the local core count — right for
    local runs; on a real cluster, set it to 2-3× total executor cores
    (or rely on AQE coalescing from a higher initial value).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    n_shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # INT96 (the legacy default) carries NO parquet footer statistics,
        # which silently disables zone-map file skipping on timestamp
        # columns (table_format.py read_pruned); TIMESTAMP_MICROS is the
        # modern physical type and round-trips µs-precision data exactly
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    # Session-conf A/B hook (optimization r13, guide §9): semicolon-
    # separated k=v pairs, applied last. The driver never sets this —
    # defaults above are the product config; the hook exists so config
    # candidates (shuffle codec, join strategy) can be benched with the
    # IDENTICAL harness instead of hand-edited session code.
    for pair in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in pair:
            k, _, v = pair.partition("=")
            builder = builder.config(k.strip(), v.strip())

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
