"""Reference-model tests: DAG execution, mart invariants, and the exotic
CASE branches that the derived driver fixtures can't all reach at small
scale (Seoul special case, >10-mile city_replace heuristics, the
state=country-long-name nulling — ref: locations_clean.sql:63-70,
:101-114; marts_schema.yml:5-15)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from oroboro_dw_dbt_spark.models.reference_models import locations_clean_df, user_base_df
from oroboro_dw_dbt_spark.operators.reference_suite import reference_graph

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mart_results(spark):
    graph = reference_graph(spark, SF)
    results = graph.run(spark, run_tests=True)
    return graph, results


class TestReferenceDag:
    def test_topo_order(self, mart_results):
        graph, _ = mart_results
        order = graph.topo_order()
        assert order.index("user_base") > order.index("stacked_users_partners")
        assert order.index("user_base") > order.index("locations_clean")

    def test_mart_dbt_tests_pass(self, mart_results):
        """The reference's own data tests: not_null(user_id) and
        unique(user_id, partner_id, site_id) — marts_schema.yml:5-15."""
        _, results = mart_results
        ub = results["user_base"]
        assert ub.test_results, "mart must declare tests"
        for t in ub.test_results:
            assert t.passed, f"{t.name}: {t.n_violations} violations, e.g. {t.sample}"

    def test_mart_covers_all_user_types(self, mart_results):
        graph, _ = mart_results
        rows = {
            r["user_type_full_name"]
            for r in graph.frame("user_base").select("user_type_full_name").distinct().collect()
        }
        assert {"Advisors", "Cohort Learners", "Independent Learners", "Widget Account"} <= rows

    def test_mart_order_by_is_emitted_and_correct(self, mart_results):
        """O1 (user_base.sql:83): the mart's global 4-key ORDER BY must be
        order-SENSITIVELY verified — the driver hash sorts rows, so a
        dropped orderBy would otherwise be invisible. Spark ASC defaults
        to NULLS FIRST, matching BigQuery ASC."""
        graph, _ = mart_results
        got = [
            (r["user_id"], r["partner_id"], r["classroom_id"], r["site_id"])
            for r in graph.frame("user_base")
            .select("user_id", "partner_id", "classroom_id", "site_id")
            .collect()
        ]
        assert len(got) > 100, "need a non-trivial mart to verify ordering"

        def key(t):
            return tuple((v is not None, v) for v in t)

        assert got == sorted(got, key=key), "mart rows not in 4-key ASC NULLS FIRST order"

    def test_attribution_routes_populated(self, mart_results):
        graph, _ = mart_results
        stacked = graph.frame("stacked_users_partners")
        # routes land as: educators (route 2), learners w/ classroom
        # (routes 1+3), learners w/o classroom (route 4)
        assert stacked.filter("classroom_id IS NULL AND partner_id IS NOT NULL").count() > 0
        assert stacked.filter("classroom_id IS NOT NULL").count() > 0


def _loc_fixtures(spark, venues, comps, types):
    loc = spark.createDataFrame(
        venues,
        "id long, display_name string, long_name string, latitude double, longitude double, slug string",
    )
    llac = spark.createDataFrame(comps, "from_location_id long, to_location_id long")
    lltypes = spark.createDataFrame(types, "location_id long, locationtype_id long")
    return loc, llac, lltypes


class TestLocationsCleanBranches:
    """Hand-built minimal location graphs, one per quirky branch."""

    def test_seoul_special_case(self, spark):
        # venue typed 2 (out-of-set), no city components, named Seoul →
        # the `display_name = 'Seoul'` branch fires (locations_clean.sql:105)
        loc, llac, lltypes = _loc_fixtures(
            spark,
            [(1, "Seoul", "Seoul Proper", 37.55, 126.99, "seoul")],
            [],
            [(1, 2)],
        )
        out = locations_clean_df(loc, llac, lltypes).collect()
        assert len(out) == 1
        assert out[0]["city"] == "Seoul"

    def test_far_city_keeps_clean_locale(self, spark):
        # nearest city > 10 mi and original locale is a clean name → keep it
        loc, llac, lltypes = _loc_fixtures(
            spark,
            [
                (1, "Riverton", "Riverton", 40.0, -100.0, "v"),
                (100, "CityA", "CityA", 40.5, -100.0, "a"),  # ~35 mi
                (101, "CityB", "CityB", 41.5, -100.0, "b"),  # ~104 mi
            ],
            [(1, 100), (1, 101)],
            [(1, 2), (100, 3), (101, 4)],
        )
        row = locations_clean_df(loc, llac, lltypes).filter("from_location_id = 1").first()
        assert row["city"] == "Riverton"
        assert row["city_latitude"] == 40.0  # og coords kept in the >10 branch

    @pytest.mark.parametrize(
        "locale",
        ["123 Main St", "87g8+2x plaza", "Fairfax County", "Lakeside Ave"],
    )
    def test_far_city_replaces_addressy_locale(self, spark, locale):
        # > 10 mi but the locale looks like an address/plus-code/county →
        # replaced by the nearest city name
        loc, llac, lltypes = _loc_fixtures(
            spark,
            [
                (1, locale, locale, 40.0, -100.0, "v"),
                (100, "CityA", "CityA", 40.5, -100.0, "a"),
                (101, "CityB", "CityB", 41.5, -100.0, "b"),
            ],
            [(1, 100), (1, 101)],
            [(1, 2), (100, 3), (101, 4)],
        )
        row = locations_clean_df(loc, llac, lltypes).filter("from_location_id = 1").first()
        assert row["city"] == "CityA"
        # but coords still keep the origin in the >10 branch
        assert row["city_latitude"] == 40.0

    def test_near_city_always_replaces(self, spark):
        # nearest city ≤ 10 mi → city name used regardless of locale shape
        loc, llac, lltypes = _loc_fixtures(
            spark,
            [
                (1, "Riverton", "Riverton", 40.0, -100.0, "v"),
                (100, "CityA", "CityA", 40.05, -100.0, "a"),  # ~3.5 mi
                (101, "CityB", "CityB", 41.5, -100.0, "b"),
            ],
            [(1, 100), (1, 101)],
            [(1, 2), (100, 3), (101, 4)],
        )
        row = locations_clean_df(loc, llac, lltypes).filter("from_location_id = 1").first()
        assert row["city"] == "CityA"
        assert row["city_latitude"] == 40.05

    def test_state_nulled_when_equals_country_long_name(self, spark):
        loc, llac, lltypes = _loc_fixtures(
            spark,
            [
                (1, "Venue", "Venue", 10.0, 10.0, "v"),
                (200, "Wales", "Wales", 52.0, -3.7, "st"),
                (400, "UK", "Wales", 54.0, -2.0, "cn"),  # long_name == state name
            ],
            [(1, 200), (1, 400)],
            [(1, 2), (200, 7), (400, 1)],
        )
        row = locations_clean_df(loc, llac, lltypes).filter("from_location_id = 1").first()
        assert row["state"] is None
        assert row["country"] == "Wales"

    def test_country_typed_venue_nulls_city_and_state(self, spark):
        # a venue itself typed 1 (country) → city and state forced NULL
        loc, llac, lltypes = _loc_fixtures(
            spark,
            [
                (1, "France", "France", 46.0, 2.0, "v"),
                (200, "Occitanie", "Occitanie", 43.7, 2.1, "st"),
            ],
            [(1, 200)],
            [(1, 1), (200, 7)],
        )
        row = locations_clean_df(loc, llac, lltypes).filter("from_location_id = 1").first()
        assert row["city"] is None
        assert row["state"] is None

    def test_null_coord_venues_dropped(self, spark):
        loc, llac, lltypes = _loc_fixtures(
            spark,
            [(1, "Nowhere", "Nowhere", None, None, "v")],
            [],
            [(1, 3)],
        )
        assert locations_clean_df(loc, llac, lltypes).count() == 0

    def test_equidistant_city_tie_is_pinned(self, spark):
        """Two candidate cities exactly equidistant from the venue (±0.5°
        latitude, same longitude — the haversine is symmetric in Δlat) tie
        in the nearest-city window; the documented tiebreak deviation pins
        the lower to_location_id, so 'Alpha' (id 100) must win every run
        (round-1 driver gate caught the unpinned nondeterminism)."""
        loc, llac, lltypes = _loc_fixtures(
            spark,
            [
                (1, "123 Main St", "123 Main St", 40.0, -100.0, "v"),
                (100, "Alpha", "Alpha", 40.5, -100.0, "a"),
                (101, "Zed", "Zed", 39.5, -100.0, "b"),
            ],
            [(1, 100), (1, 101)],
            [(1, 2), (100, 3), (101, 4)],
        )
        for _ in range(3):
            row = locations_clean_df(loc, llac, lltypes).filter("from_location_id = 1").first()
            assert row["city"] == "Alpha"

    def test_is_test_user_false_when_names_null(self, spark):
        """user_base.sql:14-17 is CASE ... ELSE false — all-NULL name/email
        must yield false, not NULL (3VL hazard in a bare OR chain)."""
        uu = spark.createDataFrame(
            [(1, "u-1", None, None, None, "CL", None, None, None,
              "2020-01-01", True, False, None, None)],
            "id long, uuid string, first_name string, last_name string, email string, "
            "type string, race_ethnicity string, gender string, self_describe_gender string, "
            "date_joined string, is_active boolean, is_staff boolean, birthday string, "
            "location_id long",
        )
        widget = spark.createDataFrame([], "id long, user_id long")
        stacked = spark.createDataFrame(
            [],
            "user_id long, partner_id long, partner_name string, partner_code string, "
            "classroom_id long, classroom_name string, classroom_code string, "
            "site_id long, site_name string",
        )
        locations = spark.createDataFrame(
            [],
            "from_location_id long, original_locale string, city string, county string, "
            "state string, country string, city_latitude double, city_longitude double",
        )
        row = user_base_df(uu, widget, stacked, locations).first()
        assert row["is_test_user"] is False

    def test_seoul_branch_reached_at_sf01(self, spark):
        """At sf0.1 the derived fixtures produce s ≡ 108 (mod 210) venues
        where the Seoul branch fires end-to-end (fixtures.py docstring)."""
        graph = reference_graph(spark, "/root/testdata/sf0.1")
        graph.run(spark, select=["locations_clean"], run_tests=False)
        seoul = (
            graph.frame("locations_clean")
            .filter("city = 'Seoul' AND original_locale = 'Seoul'")
            .count()
        )
        assert seoul > 0


class TestR12OptimizationEquivalence:
    """Optimization r12 rewrote two model subtrees; each rewrite must be
    row-multiset-identical to the spelling it replaced (the DuckDB
    oracle pins them against SQL too — these pin them against the OLD
    Spark spelling directly)."""

    def test_stacked_two_branch_dedup_equals_role_explode(self, spark):
        """The production two-branch per-role dedup must be
        row-multiset-identical to the role-explode single-dedup
        alternative (built, measured slightly slower, reverted in r12 —
        the equivalence pin stays so either spelling remains provably
        swappable)."""
        from collections import Counter

        from pyspark.sql import functions as F

        from oroboro_dw_dbt_spark.models import reference_models as rm
        from oroboro_dw_dbt_spark.operators.reference_suite import (
            _fixture_parquet_dir,
        )

        fixdir = _fixture_parquet_dir(spark, SF)
        deps = [
            "educator_classroomlearnermembership", "educator_classroom",
            "educator_classroom_educators", "educator_classroominvitation",
            "educator_classroominvitecode", "user_site", "user_partner",
            "user_partnerinvitecode", "user_user", "action_userjoinsaction",
        ]
        args = [spark.read.parquet(f"{fixdir}/{n}") for n in deps]
        got = Counter(
            map(tuple, rm.stacked_users_partners_df(*args).collect())
        )

        # the role-explode alternative over the SAME route union
        attributions = rm.attribution_routes(*args)
        out_cols = [
            "partner_id", "partner_name", "partner_code",
            "classroom_id", "classroom_name", "classroom_code",
            "site_id", "site_name",
        ]
        roles = F.array(
            F.struct(
                F.lit(0).alias("role"), F.col("educator_id").alias("user_id")
            ),
            F.struct(
                F.lit(1).alias("role"), F.col("learner_id").alias("user_id")
            ),
        )
        want = Counter(
            map(
                tuple,
                attributions.select(F.explode(roles).alias("rk"), *out_cols)
                .filter(F.col("rk.user_id").isNotNull())
                .select(
                    F.col("rk.role").alias("_role"),
                    F.col("rk.user_id").alias("user_id"),
                    *out_cols,
                )
                .dropDuplicates()
                .select("user_id", *out_cols)
                .collect(),
            )
        )
        assert got == want
        assert sum(got.values()) > 0

    def test_locations_best_struct_equals_window_spelling(self, spark):
        """min(when(type, struct(to_location_id, payload))) must pick the
        same rows as the pre-r12 per-type row_number()=1 windows."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from oroboro_dw_dbt_spark.operators.reference_suite import (
            _fixture_parquet_dir,
        )

        fixdir = _fixture_parquet_dir(spark, SF)
        loc = spark.read.parquet(f"{fixdir}/location_location")
        llac = spark.read.parquet(
            f"{fixdir}/location_location_address_components"
        )
        lltypes = spark.read.parquet(f"{fixdir}/location_location_types")
        valid_types = lltypes.filter(
            F.col("locationtype_id").isin(1, 3, 4, 7, 8)
        )
        comp_from_links = (
            llac.alias("llac")
            .join(loc.alias("tl"), F.col("llac.to_location_id") == F.col("tl.id"))
            .join(
                valid_types.alias("t"),
                F.col("llac.to_location_id") == F.col("t.location_id"),
            )
            .select(
                F.col("llac.from_location_id"),
                F.col("tl.id").alias("to_location_id"),
                F.col("tl.display_name"), F.col("tl.long_name"),
                F.col("tl.latitude"), F.col("tl.longitude"),
                F.col("t.locationtype_id"),
            )
        )
        comp_self = (
            loc.alias("fl")
            .join(valid_types.alias("t"), F.col("fl.id") == F.col("t.location_id"))
            .select(
                F.col("fl.id").alias("from_location_id"),
                F.col("fl.id").alias("to_location_id"),
                F.col("fl.display_name"), F.col("fl.long_name"),
                F.col("fl.latitude"), F.col("fl.longitude"),
                F.col("t.locationtype_id"),
            )
        )
        components = comp_from_links.unionByName(comp_self)

        # new spelling
        best = components.groupBy("from_location_id").agg(
            F.min(
                F.when(
                    F.col("locationtype_id") == 1,
                    F.struct("to_location_id", "display_name", "long_name"),
                )
            ).alias("bcn"),
            F.min(
                F.when(
                    F.col("locationtype_id").isin(3, 4),
                    F.struct(
                        "to_location_id", "display_name", "latitude", "longitude"
                    ),
                )
            ).alias("bci"),
        )
        got_cn = {
            r["from_location_id"]: (
                None if r["bcn"] is None else (r["bcn"]["display_name"], r["bcn"]["long_name"])
            )
            for r in best.collect()
        }
        got_ci = {
            r["from_location_id"]: (
                None
                if r["bci"] is None
                else (r["bci"]["display_name"], r["bci"]["latitude"], r["bci"]["longitude"])
            )
            for r in best.collect()
        }

        # pre-r12 spelling, verbatim
        w_first = Window.partitionBy("from_location_id").orderBy("to_location_id")

        def best_of(type_filter, cols):
            return (
                components.filter(type_filter)
                .withColumn("rn", F.row_number().over(w_first))
                .filter(F.col("rn") == 1)
                .select("from_location_id", *cols)
            )

        want_cn = {
            r["from_location_id"]: (r["display_name"], r["long_name"])
            for r in best_of(
                F.col("locationtype_id") == 1, ["display_name", "long_name"]
            ).collect()
        }
        want_ci = {
            r["from_location_id"]: (r["display_name"], r["latitude"], r["longitude"])
            for r in best_of(
                F.col("locationtype_id").isin(3, 4),
                ["display_name", "latitude", "longitude"],
            ).collect()
        }
        assert {k: v for k, v in got_cn.items() if v is not None} == want_cn
        assert {k: v for k, v in got_ci.items() if v is not None} == want_ci
        assert len(want_ci) > 0
