"""Tests for the model-evaluation suite (ml_eval_suite): metric math
verified against hand-computed micro-fixtures, invariants on the real
testdata tables, and exactness properties the 100 TB design relies on
(integer-until-final-division; partition-count independence)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from oroboro_dw_dbt_spark.operators.ml_eval_suite import (
    _NDCG_W,
    fe_target_encode,
    lab_agreement,
    ml_auc_rank,
    ml_brier_logloss,
    ml_calibration_bins,
    ml_confusion_threshold,
    ml_ndcg_at_k,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


class TestAuc:
    def test_auc_bounds_and_counts(self, spark):
        row = ml_auc_rank(spark, SF01).first()
        # positives are shifted +0.4, so the task must be clearly
        # learnable but not separable (scores overlap on [400, 599]).
        assert 0.80 < row["auc"] < 1.0
        assert row["n_pos"] + row["n_neg"] > 0

    def test_auc_matches_naive_pair_count(self, spark):
        # Exact oracle on a small slice: AUC == P(score_pos > score_neg)
        # + 0.5·P(tie), counted pairwise.
        from oroboro_dw_dbt_spark.operators.ml_eval_suite import _binary_scores

        rows = _binary_scores(spark, SF).collect()
        pos = [r["sx"] for r in rows if r["y"] == 1]
        neg = [r["sx"] for r in rows if r["y"] == 0]
        wins = sum(1 for p in pos for n in neg if p > n)
        ties = sum(1 for p in pos for n in neg if p == n)
        expect = (wins + 0.5 * ties) / (len(pos) * len(neg))
        got = ml_auc_rank(spark, SF).first()["auc"]
        assert got == expect  # exact — both sides integer arithmetic

    def test_partition_independence(self, spark):
        a = ml_auc_rank(spark, SF01).first()["auc"]
        b = (
            ml_auc_rank(spark, SF01)
            .repartition(3)
            .first()["auc"]
        )
        assert a == b


class TestConfusion:
    def test_counts_partition_the_population(self, spark):
        rows = ml_confusion_threshold(spark, SF01).collect()
        assert len(rows) == 3
        n = {r["tp"] + r["fp"] + r["fn"] + r["tn"] for r in rows}
        assert len(n) == 1  # same population at every threshold
        for r in rows:
            assert 0.0 <= r["precision_"] <= 1.0
            assert 0.0 <= r["recall_"] <= 1.0
            # F1 is the harmonic mean — between min and max of P/R
            assert (
                min(r["precision_"], r["recall_"]) - 1e-12
                <= r["f1"]
                <= max(r["precision_"], r["recall_"]) + 1e-12
            )

    def test_recall_monotone_in_threshold(self, spark):
        rows = {
            r["threshold_milli"]: r
            for r in ml_confusion_threshold(spark, SF01).collect()
        }
        assert rows[300]["recall_"] >= rows[500]["recall_"] >= rows[700]["recall_"]


class TestCalibration:
    def test_bins_cover_and_bound(self, spark):
        rows = ml_calibration_bins(spark, SF01).collect()
        assert {r["bin"] for r in rows} <= set(range(10))
        for r in rows:
            assert 0.0 <= r["frac_pos"] <= 1.0
            # bin b holds sx in [100b, 100b+99] → mean_pred inside it
            lo, hi = r["bin"] / 10, r["bin"] / 10 + 0.1
            assert lo <= r["mean_pred"] <= hi
            assert abs(r["abs_gap"] - abs(r["mean_pred"] - r["frac_pos"])) < 1e-15

    def test_low_bins_pure_negative_high_pure_positive(self, spark):
        rows = {r["bin"]: r for r in ml_calibration_bins(spark, SF01).collect()}
        # construction: negatives in [0,599], positives in [400,999]
        for b in (0, 1, 2, 3):
            assert rows[b]["n_pos"] == 0
        for b in (6, 7, 8, 9):
            assert rows[b]["n_pos"] == rows[b]["n"]


class TestBrierLogloss:
    def test_matches_pointwise_python(self, spark):
        from oroboro_dw_dbt_spark.operators.ml_eval_suite import _binary_scores

        rows = _binary_scores(spark, SF).collect()
        ps = [((2 * r["sx"] + 1) / 2000, r["y"]) for r in rows]
        brier = sum((p - y) ** 2 for p, y in ps) / len(ps)
        ll = sum(
            -(y * math.log(p) + (1 - y) * math.log(1 - p)) for p, y in ps
        ) / len(ps)
        got = ml_brier_logloss(spark, SF).first()
        assert abs(got["brier"] - brier) < 1e-12  # exact integer route
        assert abs(got["logloss"] - ll) < 1e-6  # 1e-9-resolution fixed point
        assert got["n"] == len(ps)

    def test_better_than_chance(self, spark):
        got = ml_brier_logloss(spark, SF01).first()
        assert got["brier"] < 0.25  # constant-0.5 predictor scores 0.25
        assert got["logloss"] < math.log(2)


class TestNdcg:
    def test_weights_are_inverse_log2(self):
        for i, w in enumerate(_NDCG_W):
            assert w == round(1e9 / math.log2(i + 2))

    def test_bounds_and_ideal(self, spark):
        rows = ml_ndcg_at_k(spark, SF01).collect()
        assert len(rows) > 0
        for r in rows:
            assert 0.0 <= r["ndcg_at_10"] <= 1.0
            assert r["dcg_scaled"] <= r["idcg_scaled"]

    def test_hand_case(self, spark):
        # 1 user, 3 events; hash ranking vs ideal computed by hand.
        df = spark.createDataFrame(
            [
                (1, 10, "purchase"),  # gain 7
                (1, 11, "view"),  # gain 0
                (1, 12, "click"),  # gain 1
            ],
            "user_id long, event_id long, event_type string",
        )
        import oroboro_dw_dbt_spark.operators.ml_eval_suite as m

        orig = m.load_table
        m.load_table = lambda spark, sf_dir, name: df
        try:
            row = ml_ndcg_at_k(spark, "ignored").first()
        finally:
            m.load_table = orig
        hs = {e: (e * 2654435761 + 97) % 100000 for e in (10, 11, 12)}
        order = sorted(hs, key=lambda e: (-hs[e], e))
        gains = {10: 7, 11: 0, 12: 1}
        dcg = sum(gains[e] * _NDCG_W[i] for i, e in enumerate(order))
        ideal = sorted(gains, key=lambda e: (-gains[e], e))
        idcg = sum(gains[e] * _NDCG_W[i] for i, e in enumerate(ideal))
        assert row["dcg_scaled"] == dcg
        assert row["idcg_scaled"] == idcg
        assert row["ndcg_at_10"] == dcg / idcg


class TestTargetEncode:
    def test_oof_excludes_own_fold(self, spark):
        rows = fe_target_encode(spark, SF01).collect()
        by_lang = {}
        for r in rows:
            by_lang.setdefault(r["lang"], []).append(r)
        for lang, rs in by_lang.items():
            tot_n = rs[0]["n_fold"] + rs[0]["n_oof"]
            tot_pos = rs[0]["pos_fold"] + rs[0]["pos_oof"]
            for r in rs:
                # every fold sees the same lang totals, minus itself
                assert r["n_fold"] + r["n_oof"] == tot_n
                assert r["pos_fold"] + r["pos_oof"] == tot_pos
                assert r["enc"] == (r["pos_oof"] + 5) / (r["n_oof"] + 10)
                assert 0.0 < r["enc"] < 1.0

    def test_smoothing_pulls_to_prior_on_empty(self, spark):
        # enc with zero out-of-fold data must equal the 0.5 prior —
        # the formula's fixed point, checked symbolically.
        assert (0 + 5) / (0 + 10) == 0.5


class TestAgreement:
    def test_kappa_range_and_symmetry(self, spark):
        rows = lab_agreement(spark, SF01).collect()
        assert {r["pair"] for r in rows} == {"a1-a2", "a1-a3", "a2-a3"}
        for r in rows:
            # 20% independent flips → kappa well above chance, below 1
            assert 0.1 < r["kappa"] < 0.9
            assert r["n_agree"] <= r["n"]

    def test_kappa_matches_python(self, spark):
        rows = lab_agreement(spark, SF).collect()
        for r in rows:
            n, a = r["n"], r["n_agree"]
            e = r["pos_a"] * r["pos_b"] + (n - r["pos_a"]) * (n - r["pos_b"])
            assert r["kappa"] == (n * a - e) / (n * n - e)


class TestPrCurve:
    def test_monotone_and_consistent(self, spark):
        from oroboro_dw_dbt_spark.operators.ml_eval_suite import ml_pr_curve

        rows = sorted(
            ml_pr_curve(spark, SF01).collect(),
            key=lambda r: -r["threshold_milli"],
        )
        # tp/fp cumulative in descending threshold; recall monotone up
        for a, b in zip(rows, rows[1:]):
            assert b["tp"] >= a["tp"] and b["fp"] >= a["fp"]
            assert b["recall_"] >= a["recall_"]
        last = rows[-1]
        assert last["recall_"] == 1.0  # lowest threshold captures all
        base = last["tp"] / (last["tp"] + last["fp"])
        for r in rows:
            assert abs(r["lift"] - r["precision_"] / base) < 1e-12

    def test_agrees_with_confusion_entry(self, spark):
        from oroboro_dw_dbt_spark.operators.ml_eval_suite import (
            ml_confusion_threshold,
            ml_pr_curve,
        )

        pr = {r["threshold_milli"]: r for r in ml_pr_curve(spark, SF01).collect()}
        for c in ml_confusion_threshold(spark, SF01).collect():
            t = c["threshold_milli"]
            if t in pr:  # only when some row has exactly score t
                assert pr[t]["tp"] == c["tp"] and pr[t]["fp"] == c["fp"]


class TestPrefPairs:
    def test_rank_caps_and_margin(self, spark):
        from oroboro_dw_dbt_spark.operators.ml_eval_suite import lab_pref_pairs
        from oroboro_dw_dbt_spark.sources.testdata import load_table

        rows = lab_pref_pairs(spark, SF01).collect()
        assert rows, "construction should yield pairs at sf0.01"
        score = lambda d: (d * 2654435761 + 17) % 1000
        per_group: dict[str, list] = {}
        for r in rows:
            assert r["margin"] >= 100
            assert score(r["chosen_id"]) - score(r["rejected_id"]) == r["margin"]
            per_group.setdefault(r["lang"], []).append(r)
        for lang, rs in per_group.items():
            # rank caps bound the fan-out: ≤ 4 chosen × 4 rejected
            assert len(rs) <= 16
            assert len({x["chosen_id"] for x in rs}) <= 4
            assert len({x["rejected_id"] for x in rs}) <= 4
        # chosen really are the group's top scores: no doc in the group
        # outscores every chosen doc
        docs = load_table(spark, SF01, "documents").select("lang", "doc_id").collect()
        by_lang: dict[str, list[int]] = {}
        for d in docs:
            by_lang.setdefault(d["lang"], []).append(d["doc_id"])
        for lang, rs in per_group.items():
            top4 = sorted(by_lang[lang], key=lambda d: (-score(d), d))[:4]
            assert {x["chosen_id"] for x in rs} <= set(top4)
