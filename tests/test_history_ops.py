"""Unit tests for warehouse history operators (ops/history.py):
SCD2 snapshot build and MERGE upsert decision plans."""

from __future__ import annotations

from datetime import datetime

from oroboro_dw_dbt_spark.ops import merge_upsert, scd2_from_events


def _ts(i):
    return datetime(2024, 1, 1, i)


class TestScd2:
    def test_collapse_and_intervals(self, spark):
        ev = spark.createDataFrame(
            [
                (1, _ts(1), 10, "a"),
                (2, _ts(2), 10, "a"),  # unchanged → collapsed
                (3, _ts(3), 10, "b"),  # change
                (4, _ts(4), 10, "b"),  # unchanged → collapsed
                (5, _ts(5), 10, "a"),  # change back
                (6, _ts(1), 20, "x"),  # other key
            ],
            "event_id long, ts timestamp, user_id long, event_type string",
        )
        out = {
            (r["user_id"], r["version"]): r
            for r in scd2_from_events(ev, key="user_id", attr="event_type").collect()
        }
        assert len(out) == 4
        r1 = out[(10, 1)]
        assert (r1["event_type"], r1["valid_from"], r1["valid_to"]) == ("a", _ts(1), _ts(3))
        assert not r1["is_current"]
        r3 = out[(10, 3)]
        assert (r3["event_type"], r3["valid_to"], r3["is_current"]) == ("a", None, True)
        assert out[(20, 1)]["is_current"]

    def test_null_attr_is_a_state(self, spark):
        ev = spark.createDataFrame(
            [(1, _ts(1), 1, "a"), (2, _ts(2), 1, None), (3, _ts(3), 1, None)],
            "event_id long, ts timestamp, user_id long, event_type string",
        )
        rows = scd2_from_events(ev, key="user_id", attr="event_type").collect()
        # a → NULL is a change; NULL → NULL collapses (null-safe compare)
        assert [r["event_type"] for r in sorted(rows, key=lambda r: r["version"])] == [
            "a",
            None,
        ]

    def test_same_ts_tiebreak_by_event_id(self, spark):
        ev = spark.createDataFrame(
            [(2, _ts(1), 1, "b"), (1, _ts(1), 1, "a")],
            "event_id long, ts timestamp, user_id long, event_type string",
        )
        rows = sorted(
            scd2_from_events(ev, key="user_id", attr="event_type").collect(),
            key=lambda r: r["version"],
        )
        assert [r["event_type"] for r in rows] == ["a", "b"]


class TestMergeUpsert:
    def _frames(self, spark):
        tgt = spark.createDataFrame(
            [(1, "A", 10.0), (2, "B", 20.0), (3, "C", 30.0), (4, None, 40.0)],
            "k long, seg string, bal double",
        )
        src = spark.createDataFrame(
            [(1, "A", 10.0), (2, "B", 99.0), (5, "E", 50.0), (4, None, 40.0)],
            "k long, seg string, bal double",
        )
        return tgt, src

    def test_actions(self, spark):
        tgt, src = self._frames(spark)
        out = {r["k"]: r for r in merge_upsert(tgt, src, keys=["k"]).collect()}
        assert out[1]["action"] == "unchanged"
        assert out[2]["action"] == "update" and out[2]["bal"] == 99.0
        assert out[3]["action"] == "keep" and out[3]["bal"] == 30.0
        assert out[4]["action"] == "unchanged"  # null seg compares null-safely
        assert out[5]["action"] == "insert" and out[5]["seg"] == "E"
        assert len(out) == 5

    def test_null_key_rows_classify(self, spark):
        tgt = spark.createDataFrame([(None, "T", 1.0)], "k long, seg string, bal double")
        src = spark.createDataFrame([(None, "S", 2.0)], "k long, seg string, bal double")
        rows = merge_upsert(tgt, src, keys=["k"]).collect()
        # NULL keys eqNullSafe-match: one row, source wins, action=update
        assert len(rows) == 1
        assert rows[0]["action"] == "update" and rows[0]["seg"] == "S"
