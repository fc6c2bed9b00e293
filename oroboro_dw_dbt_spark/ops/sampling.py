"""Deterministic sampling/splitting for training-data pipelines.

rand()-based sampling is a correctness bug at scale: task retries and
speculative execution re-roll the dice, so the "same" split differs
between runs (and within one run under failure). Both operators here
key off md5 of the row's stable key instead — reproducible on any
engine, any run, any retry, and exactly restatable in SQL (which is how
the DuckDB oracle certifies them).

- :func:`hash_split` — train/test assignment by hex prefix of
  md5(key): fixed-width hex compares lexicographically as the number,
  so ``substr(md5, 1, 4) < '1999'`` is a ~10% bucket with zero
  arithmetic. Adding a salt re-deals the split without touching data.
- :func:`stratified_sample` — exactly ``n`` rows per stratum, chosen
  by md5 order within the stratum (a deterministic stand-in for
  uniform-without-replacement). One shuffle on the stratum key; the
  window's top-n never materializes the full sorted stratum
  (WindowGroupLimit pushes n down).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash_hex(cols: list[str], salt: str) -> F.Column:
    return F.md5(F.concat_ws("|", F.lit(salt), *[F.col(c).cast("string") for c in cols]))


def hash_split(
    df: DataFrame,
    key_cols: list[str],
    test_frac: float = 0.1,
    salt: str = "v1",
    out: str = "split",
) -> DataFrame:
    """Add a ``split`` column ('test'/'train') keyed on md5 of
    ``key_cols`` + ``salt``. The test bucket is the first
    ⌊test_frac·65536⌋ of the 4-hex-digit prefix space, so the realized
    fraction is within 1/65536 of the ask."""
    if not 0.0 < test_frac < 1.0:
        raise ValueError(f"test_frac must be in (0, 1), got {test_frac}")
    threshold = format(int(test_frac * 65536), "04x")
    bucket = F.substring(_hash_hex(key_cols, salt), 1, 4)
    return df.withColumn(
        out, F.when(bucket < threshold, "test").otherwise("train")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_cols: list[str],
    n_per_stratum: int,
    salt: str = "v1",
) -> DataFrame:
    """At most ``n_per_stratum`` rows per value of ``strata_col``,
    picked by md5 order of ``key_cols`` (deterministic; ties broken by
    the key itself so duplicate hashes cannot flap)."""
    w = Window.partitionBy(strata_col).orderBy(
        _hash_hex(key_cols, salt), *[F.col(c) for c in key_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def weighted_mix(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    key_cols: list[str],
    default_weight: float = 0.0,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic per-group subsampling to target mix ratios — the
    corpus-mixing step of a training-data build (e.g. keep 100% of
    curated sources, 25% of web crawl). A row survives iff the first 4
    hex digits of md5(salt|key) fall below ⌊weight·65536⌋ for its
    group; weight 1.0 keeps everything, 0.0 (and unlisted groups under
    the default) drops everything.

    Same retry-stability argument as :func:`hash_split`: no rand(), so
    task retries, speculation, and re-runs all agree — and the oracle
    can restate the predicate exactly. Row-local filter → zero shuffle
    at any corpus size, and column pruning still reaches the scan.
    """
    for g, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {g!r} must be in [0, 1], got {w}")
    bucket = F.substring(_hash_hex(key_cols, salt), 1, 4)
    keep = F.lit(None).cast("boolean")
    expr = None
    for g, w in sorted(weights.items()):
        cond = F.col(group_col) == g
        rule = F.lit(True) if w >= 1.0 else bucket < format(int(w * 65536), "04x")
        expr = F.when(cond, rule) if expr is None else expr.when(cond, rule)
    default_rule = (
        F.lit(True)
        if default_weight >= 1.0
        else bucket < format(int(default_weight * 65536), "04x")
    )
    keep = default_rule if expr is None else expr.otherwise(default_rule)
    return df.filter(keep)


def ring_negatives(
    df: DataFrame,
    key_cols: list[str],
    k: int = 2,
    n_bands: int = 16,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    row draws ``k`` pseudo-random partners by walking a hash ring.

    Rows land on one of ``n_bands`` rings by md5-prefix band; within a
    band they order by the full hash, and row r's negatives are the
    rows at positions (r+1) mod n, ..., (r+k) mod n — a self-join on
    the band + modular position, never a rand() draw, so task retries
    and re-runs produce the SAME pairs (the property rand()-based
    negative sampling silently lacks). Hash order is as-if-random with
    respect to any content attribute, which is what "negative" needs.

    Scale: band-partitioned ring — both the ranking window and the
    position self-join shuffle on the band key (uniform by
    construction); no global sort, no single-task window. k small
    multiplies output rows, not shuffle width. Bands bound each ring's
    sort; raise n_bands with corpus size (cost is per-band modular
    wrap, semantics unchanged).

    Slots are capped at the band's n-1 distinct partners: a band smaller
    than k+1 rows would otherwise wrap the ring past self and re-emit
    the same partner under a later slot (band of 2, k=3 → slot 1 and
    slot 3 both naming the single other row)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = _hash_hex(key_cols, salt)
    ranked = (
        df.select(*key_cols, h.alias("_h"))
        .withColumn("_band", F.conv(F.substring("_h", 1, 2), 16, 10).cast("int") % n_bands)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_band").orderBy("_h", *[F.col(c) for c in key_cols])
            ),
        )
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("_band")))
    )
    a = ranked.alias("a")
    b = ranked.alias("b")
    pairs = None
    for slot in range(1, k + 1):
        target = ((F.col("a._rn") - 1 + slot) % F.col("a._n")) + 1
        p = (
            a.join(
                b,
                (F.col("a._band") == F.col("b._band")) & (F.col("b._rn") == target),
            )
            .filter(F.col("a._rn") != F.col("b._rn"))  # 1-row band: no self-pair
            .filter(F.lit(slot) <= F.col("a._n") - 1)  # no ring wrap past self
            .select(
                *[F.col(f"a.{c}").alias(c) for c in key_cols],
                *[F.col(f"b.{c}").alias(f"neg_{c}") for c in key_cols],
                F.lit(slot).alias("slot"),
            )
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs
