"""Tests for the drift-detection and SQL-surface entries
(operators/drift_suite.py): statistic math cross-checked in Python,
drift-vs-no-drift behavioral contrasts, and recursion/lateral shape
checks."""

from __future__ import annotations

import math

from oroboro_dw_dbt_spark.operators.drift_suite import (
    ml_chi_square,
    ml_ks_drift,
    ml_psi_drift,
    sql_lateral_topn,
    sql_recursive_cte,
)
from oroboro_dw_dbt_spark.operators.ml_eval_suite import _binary_scores

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


class TestChiSquare:
    def test_matches_python(self, spark):
        from oroboro_dw_dbt_spark.sources.testdata import load_table

        rows = load_table(spark, SF, "documents").select(
            "doc_id", "lang"
        ).collect()
        cells: dict[tuple[str, str], int] = {}
        for r in rows:
            split = (
                "a"
                if (r["doc_id"] * 13 + ord(r["lang"][0])) % 100 < 50
                else "b"
            )
            cells[(r["lang"], split)] = cells.get((r["lang"], split), 0) + 1
        n = sum(cells.values())
        langs = {k[0] for k in cells}
        splits = {k[1] for k in cells}
        stat = 0.0
        for (lang, split), o in cells.items():
            r_tot = sum(v for k, v in cells.items() if k[0] == lang)
            c_tot = sum(v for k, v in cells.items() if k[1] == split)
            e = r_tot * c_tot / n
            stat += (o - e) ** 2 / e
        got = ml_chi_square(spark, SF).first()
        assert got["n"] == n
        assert got["dof"] == (len(langs) - 1) * (len(splits) - 1)
        assert abs(got["chi2"] - stat) < 1e-6

    def test_nonnegative(self, spark):
        assert ml_chi_square(spark, SF01).first()["chi2"] >= 0.0


class TestKs:
    def test_matches_python(self, spark):
        rows = _binary_scores(spark, SF).collect()
        pos = sorted(r["sx"] for r in rows if r["y"] == 1)
        neg = sorted(r["sx"] for r in rows if r["y"] == 0)
        points = sorted(set(pos) | set(neg))
        d = max(
            abs(
                sum(1 for p in pos if p <= x) / len(pos)
                - sum(1 for q in neg if q <= x) / len(neg)
            )
            for x in points
        )
        got = ml_ks_drift(spark, SF).first()
        assert got["n_pos"] == len(pos)
        assert got["n_neg"] == len(neg)
        # engine value is exact (integer cross-multiplication)
        assert abs(got["ks_d"] - d) < 1e-12
        assert got["d_scaled"] == round(d * len(pos) * len(neg))

    def test_shifted_classes_drift_hard(self, spark):
        # positives sit +0.4 above negatives by construction → KS large
        assert ml_ks_drift(spark, SF01).first()["ks_d"] > 0.5


class TestPsi:
    def test_parity_halves_are_stable(self, spark):
        # the two halves are interleaved hash slices of ONE
        # distribution → PSI must be tiny (rule of thumb: <0.1 = no
        # drift; the classic alarm bar is 0.2)
        row = ml_psi_drift(spark, SF01).first()
        assert row["n_a"] + row["n_b"] > 0
        assert 0.0 <= row["psi"] < 0.1
        assert 1 <= row["n_bins"] <= 5

    def test_matches_python(self, spark):
        rows = _binary_scores(spark, SF).collect()
        binned: dict[tuple[int, int], int] = {}
        for r in rows:
            h = (r["vec_id"] * 2654435761 + 40503) % 100000
            grp = ((r["vec_id"] * 2654435761 + 40503) // 64) % 2
            binned[(r["sx"] // 200, grp)] = (
                binned.get((r["sx"] // 200, grp), 0) + 1
            )
        bins = {b for b, _ in binned}
        na = sum(v for (b, g), v in binned.items() if g == 0)
        nb = sum(v for (b, g), v in binned.items() if g == 1)
        psi = 0.0
        for b in bins:
            p = (binned.get((b, 0), 0) + 1) / (na + 5)
            q = (binned.get((b, 1), 0) + 1) / (nb + 5)
            psi += (p - q) * math.log(p / q)
        got = ml_psi_drift(spark, SF).first()
        assert got["n_a"] == na and got["n_b"] == nb
        assert abs(got["psi"] - psi) < 1e-6


class TestRecursiveCte:
    def test_depths_form_a_tree_census(self, spark):
        rows = {
            r["depth"]: r for r in sql_recursive_cte(spark, SF01).collect()
        }
        # contiguous depths from 0; level sizes grow ~4× until keys run out
        assert min(rows) == 0
        assert set(rows) == set(range(len(rows)))
        assert rows[0]["n"] == 3  # roots: keys 1..3 (parent 0)
        # every key 1..max appears exactly once across levels
        from oroboro_dw_dbt_spark.sources.testdata import load_table

        n_sup = load_table(spark, SF01, "supplier").count()
        assert sum(r["n"] for r in rows.values()) == n_sup - 1  # minus key 0
        assert sum(r["sum_keys"] for r in rows.values()) == sum(
            range(1, n_sup)
        )


class TestLateralTopn:
    def test_two_per_nation_ordered(self, spark):
        rows = sql_lateral_topn(spark, SF01).collect()
        by_nation: dict[int, list] = {}
        for r in rows:
            by_nation.setdefault(r["n_nationkey"], []).append(r)
        for nk, rs in by_nation.items():
            assert len(rs) <= 2
        # cross-check against a window-rewrite of the same query
        from oroboro_dw_dbt_spark.sources.testdata import load_table
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        sup = load_table(spark, SF01, "supplier")
        w = Window.partitionBy("s_nationkey").orderBy(
            F.col("s_acctbal").desc(), "s_suppkey"
        )
        expect = {
            (r["s_nationkey"], r["s_suppkey"])
            for r in sup.withColumn("rk", F.row_number().over(w))
            .filter("rk <= 2")
            .collect()
        }
        got = {(r["n_nationkey"], r["s_suppkey"]) for r in rows}
        assert got == expect


class TestStreamDriftMonitor:
    def test_stream_state_matches_batch_and_psi_nonneg(self, spark):
        from oroboro_dw_dbt_spark.operators.drift_suite import st_drift_monitor
        from oroboro_dw_dbt_spark.sources.testdata import load_table
        from pyspark.sql import functions as F

        rows = st_drift_monitor(spark, SF).collect()
        ev = load_table(spark, SF, "events")
        n_windows = ev.select(
            F.date_trunc("hour", "ts").alias("h")
        ).distinct().count()
        assert len(rows) == n_windows
        # PSI = Σ (p−q)·ln(p/q) is non-negative term-by-term
        for r in rows:
            assert r["psi"] >= 0.0
        # per-window counts reassemble the full event count
        assert sum(r["n_window"] for r in rows) == ev.count()
