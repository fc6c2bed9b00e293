"""Product-quantization invariants (similarity/pq.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from oroboro_dw_dbt_spark.similarity.pq import (
    fit_pq_codebook,
    pq_adc_topk,
    pq_assign,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_codebook_shape(emb):
    cb = fit_pq_codebook(emb, m=4, k=16, dim=64)
    assert len(cb) == 4 and all(len(j) == 16 for j in cb)
    assert all(len(c) == 16 for j in cb for c in j)  # 64/4 dims per code
    assert all(isinstance(x, int) for x in cb[0][0])


def test_seed_rows_assign_to_their_own_code(emb):
    """A codebook seed vector's nearest centroid in every subspace is
    itself — distance 0 beats every other code (or ties to the lowest
    id among exact duplicates)."""
    cb = fit_pq_codebook(emb, m=4, k=16, dim=64)
    seeds = [r["vec_id"] for r in emb.orderBy("vec_id").limit(16).collect()]
    codes = pq_assign(emb, cb, dim=64).filter(F.col("vec_id").isin(seeds))
    by_vec = {}
    for r in codes.collect():
        by_vec.setdefault(r["vec_id"], {})[r["j"]] = r["code"]
    for rank, vid in enumerate(sorted(seeds)):
        for j in range(4):
            assert by_vec[vid][j] <= rank  # own code, or an earlier duplicate


def test_adc_topk_deterministic_across_partitionings(emb):
    q = [0, 1, 2, 3]
    a = {tuple(r) for r in pq_adc_topk(emb, q, k_neighbors=3).collect()}
    b = {
        tuple(r)
        for r in pq_adc_topk(emb.repartition(13), q, k_neighbors=3).collect()
    }
    assert a == b
    assert len(a) == 4 * 3
