"""Scalar-function operator suites (SURVEY §2.8 strings, §2.9 dates/
conditionals, §2.11 macro) over the testdata tables.

Dialect notes encoded here (each verified against DuckDB 1.0):

- DuckDB ``regexp_replace`` replaces the FIRST match unless given the
  ``'g'`` flag; Spark replaces all → oracle uses ``, 'g'``.
- DuckDB ``concat`` skips NULLs while Spark's propagates → oracle uses
  ``||`` (NULL-propagating) where that matters.
- DuckDB ``year()`` returns BIGINT, Spark INT → cast both to BIGINT.
- ``try_to_date`` (Spark) ≙ ``try_cast(... AS DATE)`` (DuckDB) — both
  NULL on malformed input, reproducing BigQuery ``SAFE.PARSE_DATE``
  (ref: models/marts/user_base.sql:52).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oroboro_dw_dbt_spark.functions import (
    bq_date_diff_year,
    coalesce_trim,
    format_date_mmdd,
    safe_parse_date,
)
from oroboro_dw_dbt_spark.operators.catalog import query
from oroboro_dw_dbt_spark.sources.testdata import load_table

# Fixed anchor so both engines agree regardless of wall clock; the
# reference uses current_date (user_base.sql:51) — injectable in our
# functions layer, pinned here for the correctness harness.
ANCHOR = "1998-06-15"


# ---------------------------------------------------------------------------
# F1-F9: the string-function surface (ref: user_base.sql:13-16, :52-54;
# locations_clean.sql:64-67; stacked_users_partners.sql:57).
# ---------------------------------------------------------------------------
@query(
    "f_string_suite",
    oracle="""
    SELECT
      p_partkey,
      lower(trim(p_name)) AS lname,
      regexp_replace(p_name, '\\s+', '', 'g') AS squished,
      CAST(p_name LIKE '%green%' AS INT) AS has_green,
      CAST(p_name LIKE '%red' AS INT) AS ends_red,
      CAST(p_type LIKE 'STANDARD ANODIZED COPPER' AS INT) AS exact_like,
      CAST(regexp_matches(p_name, '\\b(tan|red|blue)\\b') AS INT) AS rx_color,
      substring(p_name, 1, 8) AS prefix8,
      p_brand || '-' || p_type AS brand_type
    FROM part
    """,
    survey_ref="§2.8 F1-F9",
)
def f_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower(F.trim(F.col("p_name"))).alias("lname"),
        F.regexp_replace("p_name", r"\s+", "").alias("squished"),
        F.col("p_name").like("%green%").cast("int").alias("has_green"),
        F.col("p_name").like("%red").cast("int").alias("ends_red"),
        F.col("p_type").like("STANDARD ANODIZED COPPER").cast("int").alias("exact_like"),
        F.col("p_name").rlike(r"\b(tan|red|blue)\b").cast("int").alias("rx_color"),
        F.substring("p_name", 1, 8).alias("prefix8"),
        F.concat(F.col("p_brand"), F.lit("-"), F.col("p_type")).alias("brand_type"),
    )


# ---------------------------------------------------------------------------
# D1-D5: date surface with BigQuery semantics (ref: user_base.sql:48-54).
# The malformed-date branch exercises the SAFE.PARSE_DATE NULL path; the
# year-diff uses boundary-count semantics; the MMDD compare applies the
# pre-birthday −1 adjustment.
# ---------------------------------------------------------------------------
@query(
    "d_date_suite",
    oracle=f"""
    SELECT
      o_orderkey,
      CAST(o_orderdate AS DATE) AS odate,
      try_cast(
        CAST(year(o_orderdate) AS VARCHAR) || '-' ||
        lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0') || '-' ||
        CASE WHEN o_orderkey % 5 = 0 THEN '40' ELSE '15' END
        AS DATE) AS parsed_mid_month,
      CAST(year(DATE '{ANCHOR}') - year(o_orderdate) AS BIGINT) AS years_since,
      strftime(CAST(o_orderdate AS DATE), '%m%d') AS mmdd,
      CAST(CASE WHEN strftime(DATE '{ANCHOR}', '%m%d')
                     < strftime(CAST(o_orderdate AS DATE), '%m%d')
                THEN year(DATE '{ANCHOR}') - year(o_orderdate) - 1
                ELSE year(DATE '{ANCHOR}') - year(o_orderdate)
           END AS BIGINT) AS adjusted_years
    FROM orders
    """,
    survey_ref="§2.9 D1-D5",
)
def d_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    odate = F.col("o_orderdate").cast("date")
    anchor = F.lit(ANCHOR).cast("date")
    raw_str = F.concat(
        F.year(odate).cast("string"),
        F.lit("-"),
        F.lpad(F.month(odate).cast("string"), 2, "0"),
        F.lit("-"),
        F.when(F.col("o_orderkey") % 5 == 0, "40").otherwise("15"),
    )
    years_since = bq_date_diff_year(anchor, odate).cast("bigint")
    pre = format_date_mmdd(anchor) < format_date_mmdd(odate)
    return orders.select(
        "o_orderkey",
        odate.alias("odate"),
        safe_parse_date(raw_str).alias("parsed_mid_month"),
        years_since.alias("years_since"),
        format_date_mmdd(odate).alias("mmdd"),
        F.when(pre, years_since - 1).otherwise(years_since).cast("bigint").alias("adjusted_years"),
    )


# ---------------------------------------------------------------------------
# C1-C3: CASE chains, additive flag sums, coalesce
# (ref: user_base.sql:9-34 user_type/race logic, :62-65 geo defaults;
# locations_clean.sql:139-146 completeness score).
# ---------------------------------------------------------------------------
@query(
    "c_case_suite",
    oracle="""
    SELECT
      c_custkey,
      CASE c_mktsegment
        WHEN 'BUILDING' THEN 'Construction'
        WHEN 'AUTOMOBILE' THEN 'Auto'
        WHEN 'MACHINERY' THEN 'Industrial'
        ELSE 'Other'
      END AS segment_full_name,
      CAST(
        (CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) +
        (CASE WHEN c_nationkey % 2 = 0 THEN 1 ELSE 0 END) +
        (CASE WHEN c_mktsegment LIKE '%E%' THEN 1 ELSE 0 END)
        AS BIGINT) AS flag_score,
      CASE WHEN
        (CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) +
        (CASE WHEN c_nationkey % 2 = 0 THEN 1 ELSE 0 END) +
        (CASE WHEN c_mktsegment LIKE '%E%' THEN 1 ELSE 0 END) > 1
        THEN 'multi' ELSE 'single' END AS flag_bucket,
      coalesce(trim(nullif(c_name, '')), 'Unknown') AS display_name,
      coalesce(nullif(c_mktsegment, 'FURNITURE'), 'Prefer Not To Say') AS segment_or_default
    FROM customer
    """,
    survey_ref="§2.9 C1-C3, §2.11 coalesce_trim macro",
)
def c_case_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    flag = (
        F.when(F.col("c_acctbal") > 0, 1).otherwise(0)
        + F.when(F.col("c_nationkey") % 2 == 0, 1).otherwise(0)
        + F.when(F.col("c_mktsegment").like("%E%"), 1).otherwise(0)
    )
    return cust.select(
        "c_custkey",
        F.when(F.col("c_mktsegment") == "BUILDING", "Construction")
        .when(F.col("c_mktsegment") == "AUTOMOBILE", "Auto")
        .when(F.col("c_mktsegment") == "MACHINERY", "Industrial")
        .otherwise("Other")
        .alias("segment_full_name"),
        flag.cast("bigint").alias("flag_score"),
        F.when(flag > 1, "multi").otherwise("single").alias("flag_bucket"),
        coalesce_trim(F.nullif(F.col("c_name"), F.lit("")), F.lit("Unknown")).alias("display_name"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("FURNITURE")), F.lit("Prefer Not To Say")).alias(
            "segment_or_default"
        ),
    )


# ---------------------------------------------------------------------------
# Cast-semantics compatibility matrix: the conversions engines disagree on.
# ---------------------------------------------------------------------------
@query(
    "m_cast_matrix",
    # each row pins SPARK's (ANSI mode + try_cast) semantics; where
    # DuckDB natively diverges the oracle RESTATES the Spark result and
    # the divergence is documented inline — these are exactly the
    # conversions that silently corrupt a migration:
    #   int_decimal_string: Spark try_cast('3.9'->int) = NULL;
    #     DuckDB TRY_CAST would ROUND to 4
    #   int_from_double:    Spark cast(double->int) TRUNCATES toward 0;
    #     DuckDB CAST rounds half away (2.7 -> 3)
    #   int_hex_string:     Spark NULL; DuckDB parses '0x1A' as 26
    oracle="""
    SELECT * FROM (VALUES
      ('int_ws',             CAST(TRY_CAST(' 42 ' AS INTEGER) AS VARCHAR)),
      ('int_garbage',        CAST(TRY_CAST('42abc' AS INTEGER) AS VARCHAR)),
      ('int_overflow',       CAST(TRY_CAST('9999999999' AS INTEGER) AS VARCHAR)),
      ('int_decimal_string', CAST(NULL AS VARCHAR)),
      ('int_from_double',    CAST(CAST(trunc(2.7) AS INTEGER) AS VARCHAR)),
      ('int_from_double_neg', CAST(CAST(trunc(-2.7) AS INTEGER) AS VARCHAR)),
      ('double_sci',         CAST(TRY_CAST('1e3' AS DOUBLE) AS VARCHAR)),
      ('double_nan',         'NaN'),
      ('double_inf',         'Infinity'),
      ('int_hex_string',     CAST(NULL AS VARCHAR)),
      ('bool_to_int',        CAST(CAST(true AS INTEGER) AS VARCHAR))
    ) AS t("case", val)
    """,
    survey_ref="beyond-reference semantics pins (the D2/D3 ANSI-trap "
    "family): cast compatibility matrix — decimal-string, double "
    "truncation, hex-string, overflow, NaN/Infinity spellings",
)
def m_cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 (ANSI) cast semantics as data, one row per trap.

    SURVEY §7 ranks silent dialect mismatches as hazard #1; dates are
    pinned by d_date_suite and SAFE.* by m_safe_math — this pins the
    numeric casts. The three rows where DuckDB natively disagrees
    (decimal strings round vs NULL, double→int rounds vs truncates,
    hex strings parse vs NULL) are restated on the oracle side and
    documented, so a migrating user hits the matrix, not production."""
    # results ride as STRINGS: NaN/Infinity doubles crash hash
    # canonicalizers (pandas/driver), and the NaN-vs-nan / Infinity-vs-
    # inf SPELLINGS are themselves a pinned divergence
    rows = spark.sql(
        """SELECT * FROM VALUES
      ('int_ws',             CAST(try_cast(' 42 ' AS INT) AS STRING)),
      ('int_garbage',        CAST(try_cast('42abc' AS INT) AS STRING)),
      ('int_overflow',       CAST(try_cast('9999999999' AS INT) AS STRING)),
      ('int_decimal_string', CAST(try_cast('3.9' AS INT) AS STRING)),
      ('int_from_double',    CAST(CAST(2.7d AS INT) AS STRING)),
      ('int_from_double_neg', CAST(CAST(-2.7d AS INT) AS STRING)),
      ('double_sci',         CAST(try_cast('1e3' AS DOUBLE) AS STRING)),
      ('double_nan',         CAST(try_cast('NaN' AS DOUBLE) AS STRING)),
      ('double_inf',         CAST(try_cast('Infinity' AS DOUBLE) AS STRING)),
      ('int_hex_string',     CAST(try_cast('0x1A' AS INT) AS STRING)),
      ('bool_to_int',        CAST(CAST(true AS INT) AS STRING))
      AS t(`case`, val)"""
    )
    return rows


# ---------------------------------------------------------------------------
# Raw SQL surface: the modern-dialect features, certified end-to-end.
# ---------------------------------------------------------------------------
@query(
    "sql_dialect_surface",
    # the SAME modern-SQL text shape on both engines: CTE reuse,
    # lateral column aliases (micro -> bucket), FILTER'd aggregates,
    # GROUP BY ALL, a named WINDOW clause with a pinned total order
    oracle="""
    WITH enriched AS (
      SELECT event_type, event_id,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS micro,
             micro % 1000 AS bucket
      FROM events
    ),
    stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE bucket < 500) AS BIGINT) AS n_low,
             CAST(sum(micro) AS BIGINT) AS micro_sum
      FROM enriched
      GROUP BY ALL
    ),
    ranked AS (
      SELECT event_type, event_id, micro,
             row_number() OVER w AS rn
      FROM enriched
      WINDOW w AS (PARTITION BY event_type ORDER BY micro DESC, event_id)
    )
    SELECT r.event_type, CAST(r.rn AS INT) AS rn, r.event_id, r.micro,
           s.n, s.n_low, s.micro_sum
    FROM ranked r JOIN stats s USING (event_type)
    WHERE r.rn <= 3
    """,
    survey_ref="API surface: raw spark.sql() dialect breadth — CTE "
    "reuse, lateral column aliases, FILTER'd aggregates, GROUP BY ALL, "
    "named WINDOW clause (a user's plain-SQL workload runs unchanged)",
)
def sql_dialect_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's raw-SQL door: one query through spark.sql using the
    modern dialect features a migrating analyst actually writes. Every
    other catalog entry certifies the DataFrame spelling; this one
    certifies that the SQL TEXT path (temp view → spark.sql) produces
    the same certified answers — CTEs are reused not re-expanded,
    lateral aliases resolve left-to-right, FILTER'd aggregates share
    one pass, GROUP BY ALL infers the keys, and the named window
    carries a pinned total order (micro DESC, event_id)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_sql")
    return spark.sql(
        """
    WITH enriched AS (
      SELECT event_type, event_id,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS micro,
             micro % 1000 AS bucket
      FROM events_sql
    ),
    stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE bucket < 500) AS BIGINT) AS n_low,
             CAST(sum(micro) AS BIGINT) AS micro_sum
      FROM enriched
      GROUP BY ALL
    ),
    ranked AS (
      SELECT event_type, event_id, micro,
             row_number() OVER w AS rn
      FROM enriched
      WINDOW w AS (PARTITION BY event_type ORDER BY micro DESC, event_id)
    )
    SELECT r.event_type, CAST(r.rn AS INT) AS rn, r.event_id, r.micro,
           s.n, s.n_low, s.micro_sum
    FROM ranked r JOIN stats s USING (event_type)
    WHERE r.rn <= 3
    """
    )


# ---------------------------------------------------------------------------
# Column profiling: the ANALYZE/docs statistics surface, as data.
# ---------------------------------------------------------------------------
@query(
    "eng_profile_stats",
    # one UNPIVOT-style pass per column family; stats values ride as
    # strings so one schema carries numeric and text columns alike
    oracle="""
    SELECT 'c_custkey' AS col, CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) - count(c_custkey) AS BIGINT) AS n_null,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct,
           CAST(min(c_custkey) AS VARCHAR) AS min_val,
           CAST(max(c_custkey) AS VARCHAR) AS max_val
    FROM customer
    UNION ALL
    SELECT 'c_acctbal', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(c_acctbal) AS BIGINT),
           CAST(count(DISTINCT c_acctbal) AS BIGINT),
           CAST(round(min(CAST(c_acctbal AS DECIMAL(12,4))), 2) AS VARCHAR),
           CAST(round(max(CAST(c_acctbal AS DECIMAL(12,4))), 2) AS VARCHAR)
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(c_mktsegment) AS BIGINT),
           CAST(count(DISTINCT c_mktsegment) AS BIGINT),
           min(c_mktsegment), max(c_mktsegment)
    FROM customer
    """,
    survey_ref="engine lifecycle: column profiling statistics (the "
    "ANALYZE TABLE / dbt docs surface) — n/nulls/distinct/min/max per "
    "column in ONE scan via a multi-aggregate",
)
def eng_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the customer table: counts, null counts,
    distinct cardinalities, min/max — the statistics an optimizer's
    ANALYZE collects and a docs page displays.

    One scan computes EVERY column's aggregates in a single
    multi-aggregate (Catalyst plans the distinct counts via one
    expand), then the wide row unpivots to the (col, stat...) long
    form. At 100 TB this is the profiling pattern: never one scan per
    column, and distinct counts switch to HLL sketches
    (sk_approx_distinct / sk_hll_merge) when exactness isn't needed —
    the exact form here is itself the oracle check."""
    cust = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast("decimal(12,4)")
    wide = cust.agg(
        F.count(F.lit(1)).alias("n"),
        # c_custkey
        (F.count(F.lit(1)) - F.count("c_custkey")).alias("k_null"),
        F.countDistinct("c_custkey").alias("k_dist"),
        F.min("c_custkey").cast("string").alias("k_min"),
        F.max("c_custkey").cast("string").alias("k_max"),
        # c_acctbal
        (F.count(F.lit(1)) - F.count("c_acctbal")).alias("b_null"),
        F.countDistinct("c_acctbal").alias("b_dist"),
        F.round(F.min(bal), 2).cast("string").alias("b_min"),
        F.round(F.max(bal), 2).cast("string").alias("b_max"),
        # c_mktsegment
        (F.count(F.lit(1)) - F.count("c_mktsegment")).alias("s_null"),
        F.countDistinct("c_mktsegment").alias("s_dist"),
        F.min("c_mktsegment").alias("s_min"),
        F.max("c_mktsegment").alias("s_max"),
    )
    long = wide.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("c_custkey").alias("col"),
                    F.col("n").cast("bigint").alias("n"),
                    F.col("k_null").cast("bigint").alias("n_null"),
                    F.col("k_dist").cast("bigint").alias("n_distinct"),
                    F.col("k_min").alias("min_val"),
                    F.col("k_max").alias("max_val"),
                ),
                F.struct(
                    F.lit("c_acctbal").alias("col"),
                    F.col("n").cast("bigint").alias("n"),
                    F.col("b_null").cast("bigint").alias("n_null"),
                    F.col("b_dist").cast("bigint").alias("n_distinct"),
                    F.col("b_min").alias("min_val"),
                    F.col("b_max").alias("max_val"),
                ),
                F.struct(
                    F.lit("c_mktsegment").alias("col"),
                    F.col("n").cast("bigint").alias("n"),
                    F.col("s_null").cast("bigint").alias("n_null"),
                    F.col("s_dist").cast("bigint").alias("n_distinct"),
                    F.col("s_min").alias("min_val"),
                    F.col("s_max").alias("max_val"),
                ),
            )
        ).alias("r")
    )
    return long.select("r.col", "r.n", "r.n_null", "r.n_distinct", "r.min_val", "r.max_val")


# ---------------------------------------------------------------------------
# Declarative data-quality constraints, surfaced as a violations report.
# ---------------------------------------------------------------------------
@query(
    "eng_constraint_report",
    # the dbt-test layer (engine/tests.py) queried as data: one row per
    # declared constraint with its violation count. Constraints chosen
    # so SOME fail by construction (accepted_values excluding two
    # segments; a deliberately-thinned FK reference) — a report whose
    # rows are all zero certifies nothing.
    oracle="""
    SELECT 'not_null(o_custkey)' AS constraint_name, 'orders' AS tbl,
           CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
             AS n_violations
    FROM orders
    UNION ALL
    SELECT 'unique(o_orderkey)', 'orders',
           CAST(COALESCE(sum(n) FILTER (WHERE n > 1), 0) AS BIGINT)
    FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey)
    UNION ALL
    SELECT 'accepted_values(c_mktsegment)', 'customer',
           CAST(count(*) FILTER (WHERE c_mktsegment NOT IN
                ('BUILDING', 'AUTOMOBILE', 'MACHINERY')) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'relationship(o_custkey -> customer)', 'orders',
           CAST(count(*) AS BIGINT)
    FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                            WHERE c_custkey % 10 != 0)
    """,
    survey_ref="engine lifecycle: declarative data tests "
    "(not_null/unique/accepted_values/relationship, engine/tests.py — "
    "the dbt-test layer, marts_schema.yml:6-15) queried as a report",
)
def eng_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per declared constraint with its violation count — the
    data-quality dashboard the engine's test layer feeds.

    Each count comes from the SAME violations() DataFrames `run()`
    uses (anti-join for FKs, grouped HAVING for uniqueness, row-local
    predicates otherwise), so the report certifies the test layer's
    semantics, not a parallel reimplementation. Two constraints fail by
    construction — accepted_values lists only 3 of the 5 segments, and
    the FK reference is thinned to every custkey not divisible by 10 —
    because an all-zeros report would certify nothing. At 100 TB each
    constraint is one scan or one anti-join; dbt's pattern of running
    them per-model after materialization holds unchanged."""
    from oroboro_dw_dbt_spark.engine.tests import (
        accepted_values,
        not_null,
        relationship,
        unique_combination_of_columns,
    )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    thinned = cust.filter(F.col("c_custkey") % 10 != 0)

    def count_row(name: str, tbl: str, violations_df: DataFrame) -> DataFrame:
        return violations_df.agg(
            F.lit(name).alias("constraint_name"),
            F.lit(tbl).alias("tbl"),
            F.count(F.lit(1)).cast("bigint").alias("n_violations"),
        ).select("constraint_name", "tbl", "n_violations")

    uniq = unique_combination_of_columns("o_orderkey").violations(orders)
    rows = [
        count_row(
            "not_null(o_custkey)", "orders", not_null("o_custkey").violations(orders)
        ),
        # uniqueness reports VIOLATING ROWS (sum of oversized groups)
        uniq.agg(
            F.lit("unique(o_orderkey)").alias("constraint_name"),
            F.lit("orders").alias("tbl"),
            F.coalesce(F.sum("n_rows"), F.lit(0)).cast("bigint").alias("n_violations"),
        ).select("constraint_name", "tbl", "n_violations"),
        count_row(
            "accepted_values(c_mktsegment)",
            "customer",
            accepted_values(
                "c_mktsegment", ("BUILDING", "AUTOMOBILE", "MACHINERY")
            ).violations(cust),
        ),
        count_row(
            "relationship(o_custkey -> customer)",
            "orders",
            relationship("o_custkey", thinned, "c_custkey").violations(orders),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
