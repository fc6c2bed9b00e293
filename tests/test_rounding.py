"""The numpy-kernel rounding contract: HALF_UP, matching F.round/DuckDB.

Round-4 advice: np.round is round-half-to-even, so the matmul/scoring
kernels diverged from their JVM/oracle twins on dyadic midpoints
(0.0078125 -> 0.007812 vs 0.007813) — and since rounding precedes the
batch-local top-k pruning, a flipped midpoint could flip a rank. These
tests pin np_round_half_up to both engines over midpoints and a bulk
random sample, and pin the kernels' end-to-end agreement on a fixture
built entirely of midpoint cosines.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from oroboro_dw_dbt_spark.functions.rounding import np_round_half_up

# dyadic midpoints are exactly representable, so every engine sees a true
# half — the case where banker's and HALF_UP provably differ
MIDPOINTS = [0.0078125, -0.0078125, 0.5 / 1e6, 1.5 / 1e6, -2.5 / 1e6,
             0.015625, 0.1234375, -0.1234375]


def _rng_values(n=20_000):
    rng = np.random.default_rng(7)
    vals = rng.uniform(-1, 1, n)
    return np.concatenate([vals, np.array(MIDPOINTS)])


def test_half_up_on_midpoints():
    got = np_round_half_up(np.array(MIDPOINTS))
    want = [0.007813, -0.007813, 1e-06, 2e-06, -3e-06,
            0.015625, 0.123438, -0.123438]
    assert got.tolist() == pytest.approx(want, abs=0)
    # the exact failure mode being fixed: banker's goes the other way
    assert np.round(0.0078125, 6) == 0.007812


def test_half_up_matches_spark_round(spark):
    vals = _rng_values()
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    jvm = [r[0] for r in df.select(F.round("x", 6)).collect()]
    got = np_round_half_up(vals)
    mismatch = [(v, g, j) for v, g, j in zip(vals, got, jvm) if g != j]
    assert not mismatch, mismatch[:5]


def test_half_up_matches_duckdb_round():
    vals = _rng_values()
    con = duckdb.connect()
    duck = [
        con.execute("SELECT round(?::DOUBLE, 6)", [float(v)]).fetchone()[0]
        for v in vals[:2000]
    ] + [
        con.execute("SELECT round(?::DOUBLE, 6)", [float(v)]).fetchone()[0]
        for v in MIDPOINTS
    ]
    got = np_round_half_up(np.concatenate([vals[:2000], np.array(MIDPOINTS)]))
    mismatch = [(g, d) for g, d in zip(got, duck) if g != d]
    assert not mismatch, mismatch[:5]


def test_matmul_topk_agrees_with_bruteforce_on_midpoint_cosines(spark):
    """Vectors engineered so cosines land on dyadic midpoints: with
    np.round the BLAS path and the Column-tree path disagree; with
    HALF_UP they hash-identically."""
    from oroboro_dw_dbt_spark.similarity import brute_force_topk, matmul_topk

    # axis-aligned and mixed dyadic vectors => cosines like 0.5, 0.25,
    # 0.0078125... all exactly representable
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 1.0, 0.0]),
        (2, [1.0, 0.0, 1.0]),
        (3, [0.125, 0.9921875, 0.0]),
        (4, [0.0078125, 1.0, 0.0]),
        (5, [0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>",
    )
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    bf = sorted(brute_force_topk(emb, [0, 5], k=4).collect(), key=key)
    mm = sorted(matmul_topk(emb, [0, 5], k=4).collect(), key=key)
    assert [tuple(r) for r in bf] == [tuple(r) for r in mm]


def test_matmul_topk_empty_query_set_returns_empty(spark):
    """query_ids absent from the corpus: the kernel must not matmul a
    (0,) qmat on executors (round-4 advice) — match brute_force_topk's
    empty frame instead."""
    from oroboro_dw_dbt_spark.similarity import (
        brute_force_topk,
        lsh_matmul_topk,
        matmul_topk,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    assert brute_force_topk(emb, [99], k=3).count() == 0
    assert matmul_topk(emb, [99], k=3).count() == 0
    assert lsh_matmul_topk(emb, [99], k=3, dim=2).count() == 0


def test_batch_score_midpoint_agreement(spark):
    """batch_score vs the JVM sigmoid twin on inputs whose sigmoid
    rounds at a midpoint region — bulk agreement, not fixture luck."""
    from oroboro_dw_dbt_spark.ml import batch_score

    df = spark.range(5000).select(
        "id", (F.col("id") / 1000.0 - 2.5).alias("a")
    )
    got = {
        r.id: r.score
        for r in batch_score(df, ["id"], ["a"], weights=[1.0], bias=0.0).collect()
    }
    want = {
        r.id: r.score
        for r in df.select(
            "id", F.round(1.0 / (1.0 + F.exp(-F.col("a"))), 6).alias("score")
        ).collect()
    }
    assert got == want
