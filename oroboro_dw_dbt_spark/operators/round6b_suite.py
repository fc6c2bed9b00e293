"""Round-6 second wave: marketing attribution, exact per-group mode,
trailing EWMA, time-weighted averages, CDC changelog apply, the decimal
arithmetic surface, the bitwise function surface, and zone-map file
skipping through the manifest table format.

House rules as ever (operators/catalog.py): identical aliases both
sides, pinned tiebreaks, exact-integer arithmetic up to a single final
IEEE division wherever floats could diverge (memory: floor-div /
HALF_UP / epoch-precision divergences have all broken hashes before).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oroboro_dw_dbt_spark.operators.catalog import query
from oroboro_dw_dbt_spark.operators.training_suite import _SHINGLES_3
from oroboro_dw_dbt_spark.sources.testdata import load_table

_CENTS_SQL = "CAST(round(CAST(value AS DECIMAL(12,4)) * 100, 0) AS BIGINT)"


def _cents(col: str = "value") -> F.Column:
    return F.round(F.col(col).cast("decimal(12,4)") * 100, 0).cast("bigint")


# ---------------------------------------------------------------------------
# Last-touch attribution over the events stream.
# ---------------------------------------------------------------------------
_TOUCH_CODE_SQL = """CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
             WHEN 'signup' THEN 3 WHEN 'view' THEN 4 END"""
_7D_US = 7 * 24 * 3600 * 1_000_000


@query(
    "ev_last_touch",
    # the last preceding touch rides a running max of ONE packed BIGINT
    # (epoch_us * 8 + touch code) over a ROWS frame ending 1 PRECEDING —
    # engine-portable argmax, no IGNORE NULLS, no self-join. All lag
    # arithmetic stays integer µs until a single final division.
    oracle=f"""
    WITH coded AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             {_TOUCH_CODE_SQL} AS code
      FROM events
    ),
    touched AS (
      SELECT *,
             max(CASE WHEN event_type <> 'purchase'
                      THEN us * 8 + code END)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_packed
      FROM coded
    ),
    purchases AS (
      SELECT CASE
               WHEN last_packed IS NULL THEN '(none)'
               WHEN us - last_packed // 8 > {_7D_US} THEN '(stale)'
               ELSE CASE last_packed % 8 WHEN 1 THEN 'click'
                    WHEN 2 THEN 'error' WHEN 3 THEN 'signup'
                    ELSE 'view' END
             END AS touch,
             us - last_packed // 8 AS lag_us
      FROM touched WHERE event_type = 'purchase'
    )
    SELECT touch, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(CAST(sum(lag_us) AS BIGINT) AS DOUBLE)
             / (count(lag_us) * 1000000.0) AS avg_lag_s
    FROM purchases GROUP BY touch
    """,
    survey_ref="beyond-reference: last-touch attribution (each purchase "
    "credited to the user's most recent prior touch within 7 days) — "
    "the marts-layer attribution shape over the events fact",
)
def ev_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credit each purchase to the last non-purchase event before it.

    Scale: one user_id shuffle feeds one sort; the running max carries
    8 bytes of state per row regardless of history length — the same
    packed-argmax trick as ts_interpolate, which a LAST_VALUE IGNORE
    NULLS (engine-specific) or a per-purchase range self-join
    (O(purchases × touches)) would both lose at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "signup", 3)
        .when(F.col("event_type") == "view", 4)
    )
    coded = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        code.alias("code"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = F.when(
        F.col("event_type") != "purchase", F.col("us") * 8 + F.col("code")
    )
    touched = coded.withColumn("last_packed", F.max(packed).over(w))
    lag_us = F.col("us") - F.expr("last_packed div 8")
    touch = (
        F.when(F.col("last_packed").isNull(), "(none)")
        .when(lag_us > _7D_US, "(stale)")
        .otherwise(
            F.when(F.col("last_packed") % 8 == 1, "click")
            .when(F.col("last_packed") % 8 == 2, "error")
            .when(F.col("last_packed") % 8 == 3, "signup")
            .otherwise("view")
        )
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .select(touch.alias("touch"), lag_us.alias("lag_us"))
        .groupBy("touch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            (
                F.sum("lag_us").cast("bigint").cast("double")
                / (F.count("lag_us") * 1000000.0)
            ).alias("avg_lag_s"),
        )
    )


# ---------------------------------------------------------------------------
# Exact per-group mode.
# ---------------------------------------------------------------------------
@query(
    "a_mode_exact",
    # mode = argmax of the (user, type) count with a pinned tiebreak
    # (count DESC, then event_type ASC) — value-deterministic
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rn
      FROM counts
    )
    SELECT user_id, event_type AS mode_event_type,
           CAST(n AS BIGINT) AS n_events
    FROM ranked WHERE rn = 1
    """,
    survey_ref="beyond-reference: exact per-group mode (most frequent "
    "categorical value, deterministic tiebreak) — the exact twin of "
    "sk_countmin_freq's approximate heavy hitters",
)
def a_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's most frequent event_type.

    Scale: the first aggregation combines map-side, so the window's
    input is |users|×|types| rows, not |events| — the top-1 window then
    sorts ≤ |types| rows per user. Never windows the raw fact."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_event_type"),
            F.col("n").cast("bigint").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Trailing EWMA with power-of-two weights: exact integers end to end.
# ---------------------------------------------------------------------------
_EWMA_K = 8  # trailing taps; weight of lag j is 2^(K-1-j)


def _ewma_terms_sql() -> tuple[str, str]:
    def tap(j: int) -> str:
        return "cents" if j == 0 else f"lag(cents, {j}) OVER vu"

    num = " + ".join(
        f"COALESCE({tap(j)}, 0) * {1 << (_EWMA_K - 1 - j)}"
        for j in range(_EWMA_K)
    )
    den = " + ".join(
        f"CASE WHEN {tap(j)} IS NOT NULL"
        f" THEN {1 << (_EWMA_K - 1 - j)} ELSE 0 END"
        for j in range(_EWMA_K)
    )
    return num, den


_EWMA_NUM_SQL, _EWMA_DEN_SQL = _ewma_terms_sql()


@query(
    "ts_ewma_trailing",
    # α=1/2 makes every weight a power of two: numerator and weight-sum
    # are exact BIGINTs, the value appears only after ONE IEEE division
    # — bit-identical across engines, no tolerance, no rounding
    oracle=f"""
    WITH pts AS (
      SELECT user_id, event_id, epoch_us(ts) AS us, {_CENTS_SQL} AS cents
      FROM events
    )
    SELECT user_id, event_id, cents,
           ({_EWMA_NUM_SQL})
             / (({_EWMA_DEN_SQL}) * 100.0) AS ewma_value
    FROM pts
    WINDOW vu AS (PARTITION BY user_id ORDER BY us, event_id)
    """,
    survey_ref="beyond-reference: trailing EWMA (α=1/2, 8 taps) — "
    "exponential smoothing as a fixed-tap window, the streaming-safe "
    "formulation of the classic recursive filter",
)
def ts_ewma_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted trailing average of each user's values.

    The recursive EWMA (y_t = αx_t + (1-α)y_{t-1}) is inherently
    sequential; truncating at K taps (weight 2^-K ≈ 0.4% ignored) turns
    it into K lags over ONE sort — all eight lag() calls share the same
    window spec, so Spark computes them in a single Sort + Window pass.
    Scale: one user_id shuffle; per-row state is K values regardless of
    history; no driver iteration, no sequential dependency."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        _cents().alias("cents"),
    )
    vu = Window.partitionBy("user_id").orderBy("us", "event_id")
    num = None
    den = None
    for j in range(_EWMA_K):
        wgt = 1 << (_EWMA_K - 1 - j)
        lag = F.lag("cents", j).over(vu) if j else F.col("cents")
        term = F.coalesce(lag, F.lit(0)) * wgt
        avail = F.when(lag.isNotNull(), wgt).otherwise(0)
        num = term if num is None else num + term
        den = avail if den is None else den + avail
    return pts.select(
        "user_id",
        "event_id",
        "cents",
        (num / (den * 100.0)).alias("ewma_value"),
    )


# ---------------------------------------------------------------------------
# Time-weighted average: each value weighted by how long it was current.
# ---------------------------------------------------------------------------
@query(
    "ts_time_weighted_avg",
    # durations are integer milliseconds (BIGINT floor-div — DuckDB //
    # on BIGINT and Spark's `div` agree; NEVER // on a double epoch),
    # value×duration sums stay integers; one final division
    oracle=f"""
    WITH pts AS (
      SELECT user_id, epoch_us(ts) AS us, event_id, {_CENTS_SQL} AS cents
      FROM events
    ),
    spans AS (
      SELECT user_id, cents,
             (lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
              - us) // 1000 AS dur_ms
      FROM pts
    )
    SELECT user_id,
           CAST(count(dur_ms) AS BIGINT) AS n_spans,
           CAST(CAST(sum(cents * dur_ms) AS BIGINT) AS DOUBLE)
             / (CAST(CAST(sum(dur_ms) AS BIGINT) AS DOUBLE) * 100.0)
             AS twa_value
    FROM spans WHERE dur_ms IS NOT NULL
    GROUP BY user_id HAVING sum(dur_ms) > 0
    """,
    survey_ref="beyond-reference: time-weighted average (value × "
    "holding-duration / total duration) — the correct mean for "
    "irregularly-sampled series, where the arithmetic mean over-weights "
    "bursts",
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-weighted mean of each user's value series.

    Scale: one user_id shuffle; lead() and the aggregation share the
    partitioning, and the agg combines map-side. Integer ms durations
    keep every sum exact until the single closing division."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        _cents().alias("cents"),
    )
    # window spelled in SQL only because integer `div` has no Column
    # operator; it is the one (user_id, ordering) sort of this plan
    spans = pts.select(
        "user_id",
        "cents",
        F.expr("(lead(us) over (partition by user_id order by us, event_id)"
               " - us) div 1000").alias("dur_ms"),
    ).filter(F.col("dur_ms").isNotNull())
    return (
        spans.groupBy("user_id")
        .agg(
            F.count("dur_ms").cast("bigint").alias("n_spans"),
            (
                F.sum(F.col("cents") * F.col("dur_ms"))
                .cast("bigint")
                .cast("double")
                / (F.sum("dur_ms").cast("bigint").cast("double") * 100.0)
            ).alias("twa_value"),
            F.sum("dur_ms").alias("__den"),
        )
        .filter(F.col("__den") > 0)
        .drop("__den")
    )


# ---------------------------------------------------------------------------
# CDC changelog apply (ops/cdc.py).
# ---------------------------------------------------------------------------
_CDC_OP_SQL = """CASE WHEN o_orderkey % 10 = 0 THEN 'D'
                  WHEN o_orderkey % 10 < 4 THEN 'I' ELSE 'U' END"""


@query(
    "eng_cdc_apply",
    # latest-wins fold certified against arg_max on the same unique seq;
    # the surviving snapshot must agree row-for-row
    oracle=f"""
    WITH ch AS (
      SELECT o_custkey AS key, o_orderkey AS seq, {_CDC_OP_SQL} AS op,
             CAST(round(CAST(o_totalprice AS DECIMAL(14,4)) * 100, 0)
                  AS BIGINT) AS cents
      FROM orders
    )
    SELECT key, CAST(arg_max(seq, seq) AS BIGINT) AS seq,
           arg_max(op, seq) AS op,
           CAST(arg_max(cents, seq) AS BIGINT) AS cents
    FROM ch GROUP BY key
    HAVING arg_max(op, seq) <> 'D'
    """,
    survey_ref="engine: CDC changelog apply (ops/cdc.py apply_changelog "
    "— latest-wins fold, delete-aware) — the consumption half of the "
    "ACID family's commit protocol",
)
def eng_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold an orders-derived changelog (op I/U/D, seq = orderkey) into
    its latest snapshot via ops.cdc.apply_changelog.

    Scale: ONE map-side-combinable aggregation — max_by(struct, seq) —
    instead of a row_number window that would sort every key's full
    history. See ops/cdc.py for the incremental-fold contract."""
    from oroboro_dw_dbt_spark.ops.cdc import apply_changelog

    orders = load_table(spark, sf_dir, "orders")
    changes = orders.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % 10 == 0, "D")
        .when(F.col("o_orderkey") % 10 < 4, "I")
        .otherwise("U")
        .alias("op"),
        F.round(F.col("o_totalprice").cast("decimal(14,4)") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    return apply_changelog(changes, ("key",), "seq", "op")


# ---------------------------------------------------------------------------
# Decimal arithmetic surface: promotion, exact products, power-of-two
# division, mod, negation, comparison.
# ---------------------------------------------------------------------------
@query(
    "m_decimal_suite",
    # every operand is an exact decimal built from an integer; every
    # result is value-exact at ≤ 6 dp, so the closing CAST to a pinned
    # scale (then VARCHAR — m_cast_matrix precedent: engines' decimal
    # wire types differ, strings don't) is lossless on both engines.
    # Divisions are by powers of two only: DuckDB's decimal division
    # goes through DOUBLE, which is exact exactly there.
    oracle="""
    WITH base AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS BIGINT) AS qb
      FROM lineitem WHERE l_orderkey % 101 = 0
    )
    SELECT l_orderkey, l_linenumber,
      CAST(CAST(qb AS DECIMAL(12,2)) AS VARCHAR) AS d_exact,
      CAST(CAST(CAST(qb AS DECIMAL(12,3)) * CAST(0.125 AS DECIMAL(4,3))
                AS DECIMAL(18,6)) AS VARCHAR) AS d_eighth,
      CAST(CAST(CAST(qb AS DECIMAL(18,6)) / 4 AS DECIMAL(18,6))
           AS VARCHAR) AS d_quarter,
      CAST(CAST(CAST(qb AS DECIMAL(10,1)) + CAST(l_linenumber AS DECIMAL(8,3))
                AS DECIMAL(18,3)) AS VARCHAR) AS d_mixed_add,
      CAST(CAST(CAST(qb AS DECIMAL(12,2)) % CAST(7 AS DECIMAL(12,2))
                AS DECIMAL(18,2)) AS VARCHAR) AS d_mod7,
      CAST(CAST(-CAST(qb AS DECIMAL(12,2)) AS DECIMAL(18,2))
           AS VARCHAR) AS d_neg,
      CAST(qb AS DECIMAL(12,2)) > CAST(25.5 AS DECIMAL(4,1)) AS gt_25_5
    FROM base
    """,
    survey_ref="compat (m_safe_math / m_cast_matrix family): decimal "
    "arithmetic surface — scale promotion on +, exact ×, power-of-two "
    "÷, %, negation, cross-scale comparison",
)
def m_decimal_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal semantics as data: Spark's ANSI DecimalType promotion
    rules produce the same VALUES as DuckDB's (different intermediate
    precisions — both exact), certified through a pinned-scale cast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 101 == 0
    )
    qb = F.col("l_quantity").cast("bigint")
    d = lambda p, s: f"decimal({p},{s})"  # noqa: E731
    return li.select(
        "l_orderkey",
        "l_linenumber",
        qb.cast(d(12, 2)).cast("string").alias("d_exact"),
        (qb.cast(d(12, 3)) * F.lit("0.125").cast(d(4, 3)))
        .cast(d(18, 6))
        .cast("string")
        .alias("d_eighth"),
        (qb.cast(d(18, 6)) / 4).cast(d(18, 6)).cast("string").alias("d_quarter"),
        (qb.cast(d(10, 1)) + F.col("l_linenumber").cast(d(8, 3)))
        .cast(d(18, 3))
        .cast("string")
        .alias("d_mixed_add"),
        (qb.cast(d(12, 2)) % F.lit(7).cast(d(12, 2)))
        .cast(d(18, 2))
        .cast("string")
        .alias("d_mod7"),
        (-qb.cast(d(12, 2))).cast(d(18, 2)).cast("string").alias("d_neg"),
        (qb.cast(d(12, 2)) > F.lit("25.5").cast(d(4, 1))).alias("gt_25_5"),
    )


# ---------------------------------------------------------------------------
# Bitwise function surface.
# ---------------------------------------------------------------------------
@query(
    "f_bitwise_suite",
    # all operands non-negative BIGINTs well inside 64 bits; shifts are
    # small constants, so two's-complement semantics agree everywhere
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS and_255,
           CAST(o_orderkey | 4096 AS BIGINT) AS or_4096,
           CAST(xor(o_orderkey, 1023) AS BIGINT) AS xor_1023,
           CAST(o_orderkey << 3 AS BIGINT) AS shl_3,
           CAST(o_orderkey >> 2 AS BIGINT) AS shr_2,
           CAST(bit_count(o_orderkey) AS INT) AS popcount,
           CAST(~o_orderkey AS BIGINT) AS inverted
    FROM orders WHERE o_orderkey % 11 = 0
    """,
    survey_ref="beyond-reference: bitwise function surface (&, |, xor, "
    "shifts, popcount, complement) — the hash/partitioning primitive "
    "set the sketch and sampling families build on",
)
def f_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("and_255"),
        k.bitwiseOR(F.lit(4096)).cast("bigint").alias("or_4096"),
        k.bitwiseXOR(F.lit(1023)).cast("bigint").alias("xor_1023"),
        F.shiftleft(k, 3).cast("bigint").alias("shl_3"),
        F.shiftright(k, 2).cast("bigint").alias("shr_2"),
        F.bit_count(k).cast("int").alias("popcount"),
        F.bitwise_not(k).cast("bigint").alias("inverted"),
    )


# ---------------------------------------------------------------------------
# Zone-map file skipping through the manifest table format.
# ---------------------------------------------------------------------------
@query(
    "eng_stats_skipping",
    # the pruned read is a file-granularity SUPERSET + residual filter,
    # so its rows must equal the logical full-scan filter — which is
    # exactly what the oracle computes from the source table
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(SUM(CAST(o_totalprice AS DECIMAL(14,4))), 2)
                AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderkey BETWEEN 4000 AND 9000
    GROUP BY o_orderstatus
    """,
    survey_ref="engine storage: file-level min/max statistics + "
    "zone-map pruned scan (engine/table_format.py write(stats_cols=) / "
    "read_pruned) — manifest-driven file skipping, the Iceberg "
    "manifest-stats / Delta data-skipping shape",
)
def eng_stats_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders range-clustered on o_orderkey with footer stats in
    the manifest, then answer a key-range query through the pruned
    read path.

    Scale: planning reads ONE manifest json (driver-side, O(files)
    integers), not every file footer; the scan opens only overlapping
    files. At 100 TB with date- or key-clustered landing, this is the
    difference between a full-corpus scan and touching ~range/total of
    the files — the same contract tests/test_table_format.py asserts
    structurally (pruned file list ⊂ all files, result invariant)."""
    import tempfile
    from pathlib import Path

    from oroboro_dw_dbt_spark.engine import ManifestParquetFormat

    table = Path(tempfile.mkdtemp(prefix="zone_wh_")) / "orders_zoned"
    orders = load_table(spark, sf_dir, "orders")
    fmt = ManifestParquetFormat()
    # range-cluster so each file owns a tight o_orderkey band — the
    # layout that makes zone maps effective (cf. eng_zorder_layout)
    fmt.write(
        orders.repartitionByRange(8, "o_orderkey"),
        table,
        stats_cols=("o_orderkey",),
    )
    pruned = fmt.read_pruned(spark, table, "o_orderkey", 4000, 9000)
    return pruned.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(14,4)")), 2)
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Snapshot diff: CDC generation between two table versions.
# ---------------------------------------------------------------------------
@query(
    "eng_snapshot_diff",
    # the oracle recomputes both version states straight from the
    # source table and takes the same null-safe full-outer diff
    oracle=f"""
    WITH base AS (
      SELECT event_id AS key, {_CENTS_SQL} AS cents FROM events
    ),
    old_v AS (SELECT * FROM base WHERE key % 3 <> 0),
    new_v AS (
      SELECT key,
             CASE WHEN key % 7 = 0 THEN cents + 100 ELSE cents END AS cents
      FROM base WHERE key % 5 <> 0
    )
    SELECT COALESCE(o.key, n.key) AS key,
           CASE WHEN o.key IS NULL THEN 'I'
                WHEN n.key IS NULL THEN 'D'
                ELSE 'U' END AS op,
           o.cents AS old_cents, n.cents AS new_cents
    FROM old_v o FULL OUTER JOIN new_v n ON o.key = n.key
    WHERE o.key IS NULL OR n.key IS NULL OR o.cents <> n.cents
    """,
    survey_ref="engine: snapshot diff / CDC generation "
    "(engine/diff.py snapshot_diff — I/U/D changelog between two "
    "committed versions, the inverse of eng_cdc_apply's fold)",
)
def eng_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit two versions of an events-derived table, then emit the
    changelog that transforms v1 into v2.

    Scale: one full-outer join on the key between two snapshots of the
    SAME table — identical layout, so bucketed writes make it
    Exchange-free and otherwise it is one co-partitioned SMJ; change
    detection is a null-safe column comparison in the join projection
    (no hash round-trip, no second pass). See engine/diff.py."""
    import tempfile
    from pathlib import Path

    from oroboro_dw_dbt_spark.engine import ManifestParquetFormat
    from oroboro_dw_dbt_spark.engine.diff import snapshot_diff

    table = Path(tempfile.mkdtemp(prefix="diff_wh_")) / "events_versions"
    base = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("key"), _cents().alias("cents")
    )
    fmt = ManifestParquetFormat()
    fmt.write(base.filter(F.col("key") % 3 != 0), table)  # v1
    fmt.write(  # v2: some keys gone, some new, value drift on %7
        base.filter(F.col("key") % 5 != 0).select(
            "key",
            F.when(F.col("key") % 7 == 0, F.col("cents") + 100)
            .otherwise(F.col("cents"))
            .alias("cents"),
        ),
        table,
    )
    return snapshot_diff(
        spark, fmt, table, 1, 2, key_cols=("key",), compare_cols=("cents",)
    )


# ---------------------------------------------------------------------------
# Containment near-dup: asymmetric Jaccard over shared shingles.
# ---------------------------------------------------------------------------
_DF_CAP = 50  # stop-shingle cut: shingles in more docs than this are noise


@query(
    "dd_containment",
    # shared-shingle equi-join (never all-pairs); the df-cap keeps the
    # collision fanout bounded and is restated identically in SQL.
    # containment = |A∩B| / |A| — exact integers, one final division
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, s
      FROM (SELECT doc_id, unnest({_SHINGLES_3}) AS s FROM documents)
    ),
    keep AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= {_DF_CAP}),
    kept AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS src_doc, b.doc_id AS dst_doc, count(*) AS n_common
      FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT src_doc, dst_doc, CAST(n_common AS BIGINT) AS n_common,
           CAST(n_sh AS BIGINT) AS n_src,
           CAST(n_common AS DOUBLE) / CAST(n_sh AS DOUBLE) AS containment
    FROM inter JOIN sizes ON sizes.doc_id = inter.src_doc
    WHERE n_common * 10 >= n_sh * 8
    """,
    survey_ref="beyond-reference: containment near-dup (asymmetric "
    "Jaccard |A∩B|/|A| ≥ 0.8 — catches documents EMBEDDED in larger "
    "ones, which symmetric Jaccard misses; RefinedWeb-style sub-doc "
    "dedup)",
)
def dd_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment pairs over shared 3-gram shingles.

    Scale: candidates come from a shingle equi-join — O(Σ df²) over
    KEPT shingles, and the df-cap bounds every shingle's fanout at
    df² ≤ 50²; frequent (stop) shingles, the classic quadratic
    blowup, are cut before the join on both numerator and denominator
    (standard PPJoin practice). No all-pairs anywhere; at 100 TB the
    cap becomes a corpus-df table maintained incrementally."""
    from oroboro_dw_dbt_spark.text.analysis import shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(shingles("text")).alias("s")
    ).distinct()
    keep = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= _DF_CAP
    )
    kept = sh.join(keep.select("s"), "s")
    sizes = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = kept.select(F.col("doc_id").alias("src_doc"), "s")
    b = kept.select(F.col("doc_id").alias("dst_doc"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("src_doc") != F.col("dst_doc"))
        .groupBy("src_doc", "dst_doc")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes, inter["src_doc"] == sizes["doc_id"])
        .filter(F.col("n_common") * 10 >= F.col("n_sh") * 8)
        .select(
            "src_doc",
            "dst_doc",
            F.col("n_common").cast("bigint").alias("n_common"),
            F.col("n_sh").cast("bigint").alias("n_src"),
            (
                F.col("n_common").cast("double")
                / F.col("n_sh").cast("double")
            ).alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# Exact weighted percentiles.
# ---------------------------------------------------------------------------
@query(
    "a_weighted_percentile",
    # weighted quantile = first value whose cumulative weight crosses
    # q·total, with a pinned unique ordering and INTEGER threshold
    # comparisons (4·cw ≥ q·4·tw) — no float quantile arithmetic at all
    oracle="""
    WITH pts AS (
      SELECT l_returnflag AS grp, l_extendedprice AS v,
             CAST(l_quantity AS BIGINT) AS w, l_orderkey, l_linenumber
      FROM lineitem
    ),
    tot AS (SELECT grp, CAST(SUM(w) AS BIGINT) AS tw FROM pts GROUP BY grp),
    cum AS (
      SELECT grp, v,
             CAST(SUM(w) OVER (PARTITION BY grp
                               ORDER BY v, l_orderkey, l_linenumber
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS cw
      FROM pts
    )
    SELECT grp, CAST(tw AS BIGINT) AS total_weight,
           min(CASE WHEN 4 * cw >= tw THEN v END) AS p25_weighted,
           min(CASE WHEN 2 * cw >= tw THEN v END) AS p50_weighted,
           min(CASE WHEN 4 * cw >= 3 * tw THEN v END) AS p75_weighted
    FROM cum JOIN tot USING (grp)
    GROUP BY grp, tw
    """,
    survey_ref="beyond-reference: exact weighted percentiles (quantity-"
    "weighted price quartiles) — the weighted twin of "
    "a_exact_percentiles, selecting observed values via cumulative-"
    "weight crossings",
)
def a_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted price quartiles per return flag.

    Scale: one grp shuffle feeds the cumulative-weight sort; totals are
    a broadcast-sized aggregate joined back. Thresholds compare
    integers (4·cw vs q·4·tw), and the reported quantiles are observed
    data values — nothing interpolated, nothing float-accumulated. At
    billions of rows per group the certified substitute for the
    single-partition-per-group sort is w_rank_twophase's
    range-partitioned offsets (same crossing rule on partial sums)."""
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("bigint").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    tot = pts.groupBy("grp").agg(F.sum("w").cast("bigint").alias("tw"))
    wcum = (
        Window.partitionBy("grp")
        .orderBy("v", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pts.select(
        "grp", "v", F.sum("w").over(wcum).cast("bigint").alias("cw")
    )
    return (
        cum.join(F.broadcast(tot), "grp")
        .groupBy("grp", "tw")
        .agg(
            F.min(F.when(4 * F.col("cw") >= F.col("tw"), F.col("v"))).alias(
                "p25_weighted"
            ),
            F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("v"))).alias(
                "p50_weighted"
            ),
            F.min(
                F.when(4 * F.col("cw") >= 3 * F.col("tw"), F.col("v"))
            ).alias("p75_weighted"),
        )
        .select(
            "grp",
            F.col("tw").cast("bigint").alias("total_weight"),
            "p25_weighted",
            "p50_weighted",
            "p75_weighted",
        )
    )


# ---------------------------------------------------------------------------
# Neighbor-set Jaccard similarity (link prediction) on the trade graph.
# ---------------------------------------------------------------------------
from oroboro_dw_dbt_spark.operators.analytics_suite import (  # noqa: E402
    _TRADE_PAIRS_SQL,
    _trade_pairs,
)


@query(
    "gr_jaccard_neighbors",
    # candidates come from the wedge join (pairs sharing ≥1 neighbor);
    # jaccard = common / (deg_u + deg_v - common): exact integers, one
    # final division
    oracle=f"""
    WITH {_TRADE_PAIRS_SQL},
    edges AS (
      SELECT a AS u, b AS w FROM pairs
      UNION ALL SELECT b, a FROM pairs
    ),
    deg AS (SELECT u, count(*) AS d FROM edges GROUP BY u),
    common AS (
      SELECT e1.u AS u, e2.u AS v, count(*) AS n_common
      FROM edges e1 JOIN edges e2 ON e1.w = e2.w AND e1.u < e2.u
      GROUP BY 1, 2
    )
    SELECT common.u, common.v, CAST(n_common AS BIGINT) AS n_common,
           CAST(du.d AS BIGINT) AS deg_u, CAST(dv.d AS BIGINT) AS deg_v,
           CAST(n_common AS DOUBLE)
             / CAST(du.d + dv.d - n_common AS DOUBLE) AS jaccard
    FROM common
    JOIN deg du ON du.u = common.u
    JOIN deg dv ON dv.u = common.v
    """,
    survey_ref="beyond-reference: neighbor-set Jaccard similarity "
    "(link prediction / node dedup over the shared trade graph — the "
    "seventh graph entry, a set-similarity shape on adjacency rather "
    "than shingles)",
)
def gr_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard of neighbor sets for node pairs sharing ≥1 neighbor.

    Scale: the wedge join is O(Σ deg(w)²) — at 100 TB heavy hubs get
    the same frequency cap as dd_containment's stop-shingles (drop or
    sample wedges through w with deg(w) > cap; hub-mediated similarity
    is noise for the same reason stop-shingles are). Here the graph is
    the 25-node nation trade graph: dense but tiny."""
    pairs = _trade_pairs(spark, sf_dir)
    edges = pairs.select(F.col("a").alias("u"), F.col("b").alias("w")).unionByName(
        pairs.select(F.col("b").alias("u"), F.col("a").alias("w"))
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    e1 = edges.select(F.col("u").alias("cu"), "w")
    e2 = edges.select(F.col("u").alias("cv"), "w")
    common = (
        e1.join(e2, "w")
        .filter(F.col("cu") < F.col("cv"))
        .groupBy("cu", "cv")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    du = deg.select(F.col("u").alias("cu"), F.col("d").alias("deg_u"))
    dv = deg.select(F.col("u").alias("cv"), F.col("d").alias("deg_v"))
    return (
        common.join(F.broadcast(du), "cu")
        .join(F.broadcast(dv), "cv")
        .select(
            F.col("cu").alias("u"),
            F.col("cv").alias("v"),
            F.col("n_common").cast("bigint").alias("n_common"),
            F.col("deg_u").cast("bigint").alias("deg_u"),
            F.col("deg_v").cast("bigint").alias("deg_v"),
            (
                F.col("n_common").cast("double")
                / (F.col("deg_u") + F.col("deg_v") - F.col("n_common")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Window value functions: first/last/nth + offset defaults.
# ---------------------------------------------------------------------------
@query(
    "w_value_suite",
    # one (user_id, us, event_id) ordering serves both specs — the
    # framed full-window trio and the default-frame offsets — so the
    # plan needs one Exchange and one Sort
    oracle=f"""
    WITH pts AS (
      SELECT user_id, event_id, epoch_us(ts) AS us, {_CENTS_SQL} AS cents
      FROM events
    )
    SELECT user_id, event_id, cents,
           first_value(cents) OVER vu AS first_cents,
           last_value(cents) OVER vu AS last_cents,
           nth_value(cents, 3) OVER vu AS third_cents,
           lead(cents, 2, CAST(-1 AS BIGINT)) OVER vo AS lead2_cents,
           lag(cents, 3, CAST(-1 AS BIGINT)) OVER vo AS lag3_cents
    FROM pts
    WINDOW vu AS (PARTITION BY user_id ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING
                    AND UNBOUNDED FOLLOWING),
           vo AS (PARTITION BY user_id ORDER BY us, event_id)
    """,
    survey_ref="beyond-reference: window value-function surface "
    "(first_value / last_value / nth_value over an explicit full "
    "frame; lead/lag with non-NULL defaults) — completes the window "
    "family's value functions",
)
def w_value_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value functions with pinned frames and unique ordering.

    last_value/nth_value are frame-sensitive: the explicit UNBOUNDED
    FOLLOWING frame is the portable spelling (the default frame stops
    at CURRENT ROW, making last_value a no-op — a classic silent bug
    this entry pins)."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        _cents().alias("cents"),
    )
    vu = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    vo = Window.partitionBy("user_id").orderBy("us", "event_id")
    return pts.select(
        "user_id",
        "event_id",
        "cents",
        F.first("cents").over(vu).alias("first_cents"),
        F.last("cents").over(vu).alias("last_cents"),
        F.nth_value("cents", 3).over(vu).alias("third_cents"),
        F.lead("cents", 2, -1).over(vo).alias("lead2_cents"),
        F.lag("cents", 3, -1).over(vo).alias("lag3_cents"),
    )


# ---------------------------------------------------------------------------
# try_* arithmetic: overflow and division-by-zero as NULL, never error.
# ---------------------------------------------------------------------------
@query(
    "m_try_suite",
    # Spark's try_add/try_subtract/try_multiply/try_divide semantics
    # pinned as data (m_cast_matrix precedent): the oracle states the
    # expected outcomes literally
    oracle="""
    SELECT * FROM (VALUES
      ('big_add', CAST(NULL AS VARCHAR), '9223372036854775806',
                  '9223372036854775807', '9.223372036854776E18'),
      ('big_sub', '-9223372036854775805', CAST(NULL AS VARCHAR),
                  CAST(NULL AS VARCHAR), '-4.6116860184273879E18'),
      ('at_max', '9223372036854775807', '9223372036854775805',
                 '9223372036854775806', '9.223372036854776E18'),
      ('big_mul', '4611686018427387908', '4611686018427387900',
                  CAST(NULL AS VARCHAR), '1.15292150460684698E18'),
      ('div_zero', '10', '10', '0', CAST(NULL AS VARCHAR)),
      ('plain', '12', '-2', '35', '0.7142857142857143')
    ) AS t(label, try_add_r, try_sub_r, try_mul_r, try_div_r)
    """,
    survey_ref="compat (m_safe_math family): try_* arithmetic surface — "
    "BIGINT overflow and ÷0 degrade to NULL instead of the ANSI error, "
    "the ingest-hardening mode for untrusted numeric feeds",
)
def m_try_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode escape hatches as data: each row drives try_add /
    try_subtract / try_multiply / try_divide through an overflow,
    underflow, ÷0, or plain case. Row-local, zero shuffle; at 100 TB
    this is the difference between a poison row killing a stage and a
    NULL flowing into quarantine."""
    return spark.sql(
        """
        SELECT label,
               CAST(try_add(a, b) AS STRING) AS try_add_r,
               CAST(try_subtract(a, b) AS STRING) AS try_sub_r,
               CAST(try_multiply(a, b) AS STRING) AS try_mul_r,
               CAST(try_divide(a, b) AS STRING) AS try_div_r
        FROM VALUES
          ('big_add',  9223372036854775807L, 1L),
          ('big_sub',  -9223372036854775807L, 2L),
          ('at_max',   9223372036854775806L, 1L),
          ('big_mul',  4611686018427387904L, 4L),
          ('div_zero', 10L, 0L),
          ('plain',    5L, 7L)
        AS t(label, a, b)
        """
    )


# ---------------------------------------------------------------------------
# URL parsing surface.
# ---------------------------------------------------------------------------
@query(
    "f_url_suite",
    # the URL is synthesized from table columns, so every component is
    # known by construction — the oracle states the components directly
    # while Spark must recover them via parse_url
    oracle="""
    SELECT doc_id,
           'https' AS proto,
           source || '.example.com' AS host,
           '/docs/' || doc_id AS path,
           'lang=' || lang || '&n=' || n_chars AS query,
           lang AS lang_param
    FROM documents
    """,
    survey_ref="beyond-reference: URL parsing surface (parse_url "
    "PROTOCOL/HOST/PATH/QUERY + keyed query param) — the web-corpus "
    "normalization primitive (URL dedup keys, domain grouping)",
)
def f_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recover components of a synthesized URL via parse_url.

    Row-local Column tree, zero shuffle. At 100 TB this is the first
    step of web-corpus curation: registrable-domain grouping and
    URL-normalized dedup keys both start from exactly these parts."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars"),
    )
    return docs.select(
        "doc_id",
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


# ---------------------------------------------------------------------------
# Write-Audit-Publish: tests gate the commit.
# ---------------------------------------------------------------------------
@query(
    "eng_wap_publish",
    # per-user aggregate states recomputed by the oracle straight from
    # events; the dirty attempt's violation count is the %13 user set
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(SUM({_CENTS_SQL}) AS BIGINT) AS cents
      FROM events GROUP BY user_id
    ),
    no_err AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(SUM({_CENTS_SQL}) AS BIGINT) AS cents
      FROM events WHERE event_type <> 'error' GROUP BY user_id
    ),
    base AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS cents_total FROM per_user
    ),
    clean AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS cents_total FROM no_err
    )
    SELECT 'baseline' AS phase, n, cents_total FROM base
    UNION ALL
    SELECT 'dirty_rejected',
           -- not_null violations (one per nulled key) plus the single
           -- duplicate-grain group all the NULLed keys collapse into
           (SELECT CAST(count(*)
                        + CASE WHEN count(*) > 1 THEN 1 ELSE 0 END
                   AS BIGINT)
            FROM per_user WHERE user_id % 13 = 0),
           CAST(NULL AS BIGINT)
    UNION ALL SELECT 'post_reject', n, cents_total FROM base
    UNION ALL SELECT 'clean_published', n, cents_total FROM clean
    """,
    survey_ref="engine: write-audit-publish (engine/wap.py + "
    "ManifestParquetFormat stage/commit_staged) — data tests gate the "
    "atomic pointer swap; a failed audit leaves readers untouched and "
    "the stage as a vacuum-reclaimable orphan",
)
def eng_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish a per-user aggregate through WAP three times: clean
    baseline (publishes), NULL-key corruption (audit rejects — readers
    still see the baseline), clean update (publishes).

    The inversion that matters at 100 TB: dbt-style post-hoc tests mean
    bad data is LIVE while the test runs; WAP audits the staged files
    (no extra copy — same snapshot the commit would publish) and bad
    data never becomes visible. See engine/wap.py."""
    import tempfile
    from pathlib import Path

    from oroboro_dw_dbt_spark.engine import (
        ManifestParquetFormat,
        not_null,
        unique_combination_of_columns,
    )
    from oroboro_dw_dbt_spark.engine.wap import publish_with_audit

    table = Path(tempfile.mkdtemp(prefix="wap_wh_")) / "user_rollup"
    ev = load_table(spark, sf_dir, "events")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(_cents()).cast("bigint").alias("cents"),
        )

    tests = [not_null("user_id"), unique_combination_of_columns("user_id")]
    fmt = ManifestParquetFormat()

    def state(phase: str) -> DataFrame:
        return fmt.read(spark, table).agg(
            F.lit(phase).alias("phase"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents_total"),
        ).select("phase", "n", "cents_total")

    ok, _ = publish_with_audit(spark, fmt, table, rollup(ev), tests)
    assert ok, "clean baseline must publish"
    phases = [state("baseline")]

    dirty = rollup(ev).withColumn(
        "user_id",
        F.when(F.col("user_id") % 13 == 0, F.lit(None)).otherwise(
            F.col("user_id")
        ),
    )
    ok, results = publish_with_audit(spark, fmt, table, dirty, tests)
    assert not ok, "corrupted keys must be rejected"
    n_viol = sum(r.n_violations for r in results if not r.passed)
    phases.append(
        spark.createDataFrame(
            [("dirty_rejected", n_viol, None)],
            "phase string, n bigint, cents_total bigint",
        )
    )
    phases.append(state("post_reject"))

    ok, _ = publish_with_audit(
        spark, fmt, table, rollup(ev.filter(F.col("event_type") != "error")), tests
    )
    assert ok, "clean update must publish"
    phases.append(state("clean_published"))

    out = phases[0]
    for p in phases[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Gini impurity of each user's event-type mix: exact rational arithmetic.
# ---------------------------------------------------------------------------
@query(
    "a_gini_impurity",
    # gini = 1 - Σ(nᵢ/N)² = (N² - Σnᵢ²)/N² — numerator and denominator
    # are exact BIGINTs, one final division. (Shannon entropy is the
    # usual alternative; ln() can differ by 1 ulp across libms, Gini
    # cannot — see the house exact-arithmetic rule.)
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(CAST(SUM(n) AS BIGINT) * CAST(SUM(n) AS BIGINT)
                - CAST(SUM(n * n) AS BIGINT) AS DOUBLE)
             / CAST(CAST(SUM(n) AS BIGINT) * CAST(SUM(n) AS BIGINT)
                    AS DOUBLE) AS gini
    FROM counts GROUP BY user_id
    """,
    survey_ref="beyond-reference: per-group Gini impurity (behavioral "
    "diversity score) — the exact-rational alternative to entropy, "
    "two map-side-combinable aggregations",
)
def a_gini_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How mixed is each user's event-type distribution (0 = single
    type, →1 = uniform over many).

    Scale: counts aggregate combines map-side; the second agg runs on
    |users|×|types| rows. No window, no sort, exact integers into one
    closing division."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    n_sum = F.sum("n").cast("bigint")
    sq_sum = F.sum(F.col("n") * F.col("n")).cast("bigint")
    return counts.groupBy("user_id").agg(
        n_sum.alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        (
            (n_sum * n_sum - sq_sum).cast("double")
            / (n_sum * n_sum).cast("double")
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Longest consecutive-day activity streak (gaps and islands).
# ---------------------------------------------------------------------------
@query(
    "w_streak_lengths",
    # the island id (day_num - row_number) is pure integer arithmetic;
    # top-1 per user pins the (length DESC, start ASC) tiebreak
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    numbered AS (
      SELECT user_id, d,
             date_diff('day', DATE '2024-01-01', d)
               - row_number() OVER (PARTITION BY user_id ORDER BY d)
               AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS streak_len,
             min(d) AS streak_start
      FROM numbered GROUP BY user_id, grp
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY streak_len DESC, streak_start)
               AS rn,
             CAST(SUM(streak_len) OVER (PARTITION BY user_id) AS BIGINT)
               AS n_active_days
      FROM streaks
    )
    SELECT user_id, streak_len AS longest_streak, streak_start,
           n_active_days
    FROM ranked WHERE rn = 1
    """,
    survey_ref="beyond-reference: gaps-and-islands longest streak "
    "(consecutive active days per user) — the calendar twin of "
    "st_sessionize's time-gap islands, pure integer island ids",
)
def w_streak_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's longest run of consecutive active days.

    Scale: every window runs on the DISTINCT-days frame (≤ days/user
    rows, never raw events); the distinct, both windows, and the
    grouping all share the user_id partitioning — one shuffle feeds
    the chain under AQE."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    wn = Window.partitionBy("user_id").orderBy("d")
    numbered = days.withColumn(
        "grp",
        F.datediff("d", F.lit("2024-01-01").cast("date"))
        - F.row_number().over(wn),
    )
    streaks = numbered.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("streak_len"),
        F.min("d").alias("streak_start"),
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), F.col("streak_start")
    )
    wtot = Window.partitionBy("user_id")
    return (
        streaks.withColumn("rn", F.row_number().over(wr))
        .withColumn(
            "n_active_days", F.sum("streak_len").over(wtot).cast("bigint")
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("streak_len").alias("longest_streak"),
            "streak_start",
            "n_active_days",
        )
    )


# ---------------------------------------------------------------------------
# Branch lifecycle: isolated writes, fast-forward publish, vacuum safety.
# ---------------------------------------------------------------------------
@query(
    "eng_branch_publish",
    # each phase's expected state restated straight from events; the
    # reclaim count is structural (old main dir + dropped branch dir)
    oracle=f"""
    WITH ev AS (SELECT event_id, {_CENTS_SQL} AS cents FROM events),
    even_t AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS cents_total
      FROM ev WHERE event_id % 2 = 0
    ),
    odd_t AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS cents_total
      FROM ev WHERE event_id % 2 = 1
    )
    SELECT 'main_v1' AS phase, n, cents_total FROM even_t
    UNION ALL SELECT 'main_isolated', n, cents_total FROM even_t
    UNION ALL SELECT 'branch_head', n, cents_total FROM odd_t
    UNION ALL SELECT 'published', n, cents_total FROM odd_t
    UNION ALL SELECT 'after_vacuum', n, cents_total FROM odd_t
    UNION ALL SELECT 'reclaimed', CAST(2 AS BIGINT), CAST(NULL AS BIGINT)
    """,
    survey_ref="engine: branch lifecycle (write_branch / read(branch=) "
    "/ publish_branch fast-forward / drop_branch + vacuum safety) — "
    "named Iceberg-style branch pointers generalizing WAP's single "
    "anonymous stage",
)
def eng_branch_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive a branch through its life: write on a branch (main
    readers untouched), read the branch head, fast-forward publish,
    drop a second branch, vacuum.

    The claims beyond eng_wap_publish: (a) branch writes are REAL
    snapshots invisible to main until an atomic fast-forward — many can
    be live at once with unique versions; (b) vacuum reclaims dropped-
    branch snapshots but never a live branch head (keep set includes
    branch pointers). At 100 TB branches are the audit/experiment lane:
    a shadow pipeline writes production-shaped snapshots for days, then
    publishes by pointer swap — zero data movement."""
    import tempfile
    from pathlib import Path

    from oroboro_dw_dbt_spark.engine import ManifestParquetFormat

    table = Path(tempfile.mkdtemp(prefix="br_wh_")) / "events_branched"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", _cents().alias("cents")
    )

    def agg(df: DataFrame, phase: str) -> DataFrame:
        return df.agg(
            F.lit(phase).alias("phase"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("cents_total"),
        ).select("phase", "n", "cents_total")

    fmt = ManifestParquetFormat()
    fmt.write(ev.filter(F.col("event_id") % 2 == 0), table)  # main v1
    phases = [agg(fmt.read(spark, table), "main_v1")]
    fmt.write_branch(ev.filter(F.col("event_id") % 2 == 1), table, "exp")
    phases.append(agg(fmt.read(spark, table), "main_isolated"))  # still even
    phases.append(agg(fmt.read(spark, table, branch="exp"), "branch_head"))
    fmt.write_branch(ev.limit(10), table, "scratch")  # to be dropped
    fmt.publish_branch(table, "exp")
    phases.append(agg(fmt.read(spark, table), "published"))
    fmt.drop_branch(table, "scratch")
    # pin pre-vacuum phases: vacuum deletes the dirs their plans read
    phases = [p.localCheckpoint(eager=True) for p in phases]
    reclaimed = fmt.vacuum(table, keep_last=1)
    phases.append(agg(fmt.read(spark, table), "after_vacuum"))
    phases.append(
        spark.createDataFrame(
            [("reclaimed", len(reclaimed), None)],
            "phase string, n bigint, cents_total bigint",
        )
    )
    out = phases[0]
    for p in phases[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Multimodal: windowed audio energy + scene-cut detection.
# ---------------------------------------------------------------------------
@query(
    "mm_audio_energy",
    # ASCII corpus ⇒ byte arithmetic over the payload equals char-code
    # arithmetic over text (mm_resize_blocks precedent): the oracle
    # restates the exact window boundaries and Σ sample² integers
    oracle="""
    WITH b AS (
      SELECT doc_id, length(text) AS n, text FROM documents
      WHERE length(text) > 0
    ),
    exploded AS (
      SELECT doc_id, n, text,
             unnest(range(CAST(ceil(n / 64.0) AS BIGINT))) AS i
      FROM b
    )
    SELECT doc_id, CAST(i AS INT) AS win_idx,
           CAST(least((i + 1) * 64, n) - i * 64 AS INT) AS win_len,
           CAST(list_sum(list_transform(
                  range(i * 64 + 1, least((i + 1) * 64, n) + 1),
                  j -> ascii(substr(text, CAST(j AS INT), 1))
                       * ascii(substr(text, CAST(j AS INT), 1))))
                AS BIGINT) AS energy
    FROM exploded
    """,
    survey_ref="beyond-reference multimodal: windowed signal energy "
    "(multimodal/media.py audio_energy_windows — the VAD/silence-trim "
    "primitive; vectorized cumsum-of-squares kernel, exact BIGINT)",
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oroboro_dw_dbt_spark.multimodal import media_from_documents
    from oroboro_dw_dbt_spark.multimodal.media import audio_energy_windows

    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    return audio_energy_windows(media)


@query(
    "mm_scene_cuts",
    # delta(i) = Σ|byte_j(i) − byte_j(i−1)| over FULL 100-byte frames;
    # the cut rule is an integer comparison restated verbatim
    oracle="""
    WITH b AS (
      SELECT doc_id, length(text) // 100 AS n_full, text FROM documents
    ),
    exploded AS (
      SELECT doc_id, text,
             unnest(range(1, n_full)) AS i
      FROM b WHERE n_full >= 2
    )
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           CAST(list_sum(list_transform(range(1, 101),
                  j -> abs(ascii(substr(text,
                             CAST(i * 100 + j AS INT), 1))
                         - ascii(substr(text,
                             CAST((i - 1) * 100 + j AS INT), 1)))))
                AS BIGINT) AS delta,
           list_sum(list_transform(range(1, 101),
                  j -> abs(ascii(substr(text,
                             CAST(i * 100 + j AS INT), 1))
                         - ascii(substr(text,
                             CAST((i - 1) * 100 + j AS INT), 1)))))
             > 4000 AS is_cut
    FROM exploded
    """,
    survey_ref="beyond-reference multimodal: scene-cut detection "
    "(multimodal/media.py scene_cuts — frame-delta shot boundaries, "
    "the keyframe-selection signal for video sampling pipelines)",
)
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from oroboro_dw_dbt_spark.multimodal import media_from_documents
    from oroboro_dw_dbt_spark.multimodal.media import scene_cuts

    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    return scene_cuts(media)


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning: scan reduction with a provably
# lossless result.
# ---------------------------------------------------------------------------
@query(
    "sk_bucket_prefilter_join",
    # the coarse-bucket pre-filter has NO false negatives and the real
    # join removes its false positives, so the result is EXACTLY the
    # plain join — which is the oracle. The filter is certified through
    # the property that makes it deployable, not its bit pattern.
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(14,4))
                          * (1 - CAST(l_discount AS DECIMAL(14,4)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
    """,
    survey_ref="beyond-reference scale pattern: coarse-bucket semi-join "
    "pruning (xxhash64-bucket membership set, the DataFrame-native "
    "bloom-filter stand-in) — runtime-filter scan reduction certified "
    "lossless against the plain join",
)
def sk_bucket_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-filter the fact scan with the selective dimension's coarse
    key-bucket set, then join exactly.

    Scale: the filter is the DISTINCT set of xxhash64(key) mod 65536
    buckets present in the dimension subset — ≤ 65536 rows regardless
    of dimension size, broadcast into the fact's scan stage as a semi-
    join, so rows that cannot join never reach the shuffle. No false
    negatives by construction; false positives (~|buckets|/65536 of
    non-matching rows) are removed by the real join, so the sketch can
    never change the answer, only the bytes shuffled. This is the
    explicit spelling of the runtime filters AQE injects (Spark's own
    bloom_filter_agg is not public SQL API), available to hand-built
    pipelines and certifiable."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, sf_dir, "lineitem")
    buckets = orders.select(
        F.pmod(F.xxhash64("o_orderkey"), F.lit(65536)).alias("kb")
    ).distinct()
    pruned = li.withColumn(
        "kb", F.pmod(F.xxhash64("l_orderkey"), F.lit(65536))
    ).join(F.broadcast(buckets), "kb", "left_semi")
    return (
        pruned.join(orders, pruned["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(14,4)")
                    * (1 - F.col("l_discount").cast("decimal(14,4)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# String surface, second tier: pad / translate / repeat / reverse /
# split_part / overlay.
# ---------------------------------------------------------------------------
@query(
    "f_string_suite2",
    # overlay has no DuckDB twin — the oracle reconstructs it from
    # substr/concat, certifying Spark's builtin against first principles
    oracle="""
    SELECT doc_id,
           lpad(source, 12, '*') AS padded_l,
           rpad(lang, 6, '.') AS padded_r,
           translate(source, 'src', 'XYZ') AS translated,
           repeat(lang, 3) AS repeated,
           reverse(source) AS reversed_src,
           split_part(source || '|' || lang || '|' || CAST(doc_id AS VARCHAR),
                      '|', 2) AS second_field,
           substr(source, 1, 2) || 'ZZ'
             || substr(source, 5) AS overlaid
    FROM documents
    """,
    survey_ref="beyond-reference: string surface tier 2 (lpad/rpad, "
    "translate, repeat, reverse, split_part, overlay-vs-first-"
    "principles) — completes F1-F9's builtin matrix",
)
def f_string_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.lpad("source", 12, "*").alias("padded_l"),
        F.rpad("lang", 6, ".").alias("padded_r"),
        F.translate("source", "src", "XYZ").alias("translated"),
        F.repeat("lang", 3).alias("repeated"),
        F.reverse("source").alias("reversed_src"),
        F.split_part(
            F.concat_ws("|", "source", "lang", F.col("doc_id").cast("string")),
            F.lit("|"),
            F.lit(2),
        ).alias("second_field"),
        F.overlay("source", F.lit("ZZ"), 3, 2).alias("overlaid"),
    )


# ---------------------------------------------------------------------------
# Generator functions: stack / posexplode / inline.
# ---------------------------------------------------------------------------
@query(
    "p_generator_suite",
    # Spark's generators restated as UNION ALL + ordinal arithmetic:
    # stack(2, a,b,c,d) = two rows of column pairs; posexplode carries
    # the 0-based ordinal; inline flattens an array of structs
    oracle="""
    WITH src AS (
      SELECT doc_id, source, lang, n_chars FROM documents
      WHERE doc_id % 37 = 0
    ),
    stacked AS (
      SELECT doc_id, source AS k, CAST(lang AS VARCHAR) AS v FROM src
      UNION ALL
      SELECT doc_id, 'chars', CAST(n_chars AS VARCHAR) FROM src
    ),
    exploded AS (
      SELECT doc_id, CAST(i AS INT) AS pos,
             CAST(doc_id * 10 + i AS BIGINT) AS val
      FROM src, unnest(range(0, 3)) AS t(i)
    )
    SELECT s.doc_id, s.k, s.v, e.pos, e.val
    FROM stacked s
    JOIN exploded e ON e.doc_id = s.doc_id
    """,
    survey_ref="beyond-reference: generator-function surface (stack, "
    "posexplode with ordinals, lateral fan-out composition) — the "
    "builtin row-generator matrix beside the UDTF family",
)
def p_generator_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 37 == 0
    )
    stacked = docs.select(
        "doc_id",
        F.expr(
            "stack(2, source, CAST(lang AS STRING),"
            " 'chars', CAST(n_chars AS STRING)) AS (k, v)"
        ),
    )
    exploded = docs.select(
        "doc_id",
        F.posexplode(
            F.array(
                F.col("doc_id") * 10,
                F.col("doc_id") * 10 + 1,
                F.col("doc_id") * 10 + 2,
            )
        ).alias("pos", "val"),
    ).select(
        "doc_id", F.col("pos").cast("int"), F.col("val").cast("bigint")
    )
    return stacked.join(exploded, "doc_id").select(
        "doc_id", "k", "v", "pos", "val"
    )
