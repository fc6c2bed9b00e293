"""Unit tests for the corpus-pipeline operators (text/pipeline.py):
decontamination, chunking, PII redaction, repetition signals,
incremental dedup — hand-built micro-fixtures with known answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from oroboro_dw_dbt_spark.text.pipeline import (
    contamination_report,
    gram_list,
    incremental_dedup,
    pii_counts,
    pii_redact,
    repetition_signals,
    token_chunks,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


class TestGramPrimitives:
    def test_gram_list_keeps_duplicates_in_order(self, spark):
        df = _docs(spark, ["a b a b a"])
        out = df.select(gram_list("text", 2).alias("g")).first()["g"]
        assert out == ["a b", "b a", "a b", "b a"]

    def test_short_doc_yields_whole_doc_gram(self, spark):
        df = _docs(spark, ["solo"])
        assert df.select(gram_list("text", 3).alias("g")).first()["g"] == ["solo"]


class TestContamination:
    def test_exact_ngram_collision(self, spark):
        train = _docs(
            spark,
            [
                "alpha beta gamma delta epsilon",  # shares 4-gram with bench 0
                "totally unrelated words here now",
            ],
        )
        bench = spark.createDataFrame(
            [(100, "alpha beta gamma delta zeta"), (101, "nothing in common at all")],
            "doc_id long, text string",
        )
        out = contamination_report(train, bench, n=4).collect()
        assert len(out) == 1
        row = out[0]
        assert row["doc_id"] == 0
        assert row["n_collisions"] == 1  # only "alpha beta gamma delta"
        assert row["n_benchmark_docs"] == 1


class TestChunking:
    def test_chunk_starts_and_tail(self, spark):
        text = " ".join(f"t{i}" for i in range(50))
        df = _docs(spark, [text])
        rows = token_chunks(df, chunk_size=32, stride=24).orderBy("chunk_idx").collect()
        assert [r["start"] for r in rows] == [0, 24, 48]
        assert [r["n_tokens"] for r in rows] == [32, 26, 2]
        assert len({r["chunk_md5"] for r in rows}) == 3

    def test_empty_ish_doc_single_chunk(self, spark):
        df = _docs(spark, ["one two"])
        rows = token_chunks(df, chunk_size=32, stride=24).collect()
        assert len(rows) == 1 and rows[0]["n_tokens"] == 2


class TestPII:
    def test_counts_and_redaction(self, spark):
        df = _docs(
            spark,
            ["mail a@b.com or c.d@ex.org, call 12-345-6789", "no pii here"],
        )
        cnts = pii_counts("text")
        out = (
            df.select(
                cnts["EMAIL"].alias("e"),
                cnts["PHONE"].alias("p"),
                pii_redact("text").alias("red"),
            )
            .orderBy(F.desc("e"))
            .collect()
        )
        assert (out[0]["e"], out[0]["p"]) == (2, 1)
        assert out[0]["red"] == "mail [EMAIL] or [EMAIL], call [PHONE]"
        assert (out[1]["e"], out[1]["p"]) == (0, 0)
        assert out[1]["red"] == "no pii here"


class TestRepetitionSignals:
    def test_known_counts(self, spark):
        # grams: "a b","b a","a b","b c" → 4 grams, 3 distinct, top "a b"×2
        df = _docs(spark, ["a b a b c"])
        r = repetition_signals(df, n=2).first()
        assert r["n_grams"] == 4
        assert r["dup_gram_frac"] == 0.25
        assert r["top_gram"] == "a b"
        assert r["top_gram_count"] == 2
        # 2 * len("a b") / len("a b a b c") = 6/9
        assert r["top_gram_char_frac"] == round(6 / 9, 6)

    def test_tiebreak_is_greatest_gram(self, spark):
        # "x y" and "y x" both appear once; greatest wins
        df = _docs(spark, ["x y x"])
        r = repetition_signals(df, n=2).first()
        assert r["top_gram"] == "y x" and r["top_gram_count"] == 1

    def test_all_unique_grams(self, spark):
        df = _docs(spark, ["p q r s"])
        r = repetition_signals(df, n=2).first()
        assert r["dup_gram_frac"] == 0.0 and r["top_gram_count"] == 1


class TestIncrementalDedup:
    def test_batch_vs_corpus_and_within_batch(self, spark):
        batch = _docs(
            spark,
            [
                "seen before",  # 0: dup of corpus → dropped
                "brand new doc",  # 1: survives
                "brand new doc",  # 2: within-batch dup of 1 → dropped
                "Brand  NEW   doc",  # 3: fingerprint-equal to 1 → dropped
            ],
        )
        corpus = spark.createDataFrame(
            [(100, "seen before"), (101, "other corpus doc")],
            "doc_id long, text string",
        )
        out = incremental_dedup(batch, corpus).collect()
        assert [r["doc_id"] for r in out] == [1]


class TestWeightedMix:
    def test_rates_and_determinism(self, spark):
        from oroboro_dw_dbt_spark.ops import weighted_mix

        df = spark.range(0, 2000).withColumn(
            "src", F.concat(F.lit("s"), (F.col("id") % 2).cast("string"))
        )
        out = weighted_mix(df, "src", {"s0": 1.0, "s1": 0.25}, ["id"])
        counts = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
        assert counts["s0"] == 1000  # weight 1.0 keeps all
        assert 150 < counts.get("s1", 0) < 350  # ~250
        # retry-stability: identical on recompute
        assert out.count() == weighted_mix(df, "src", {"s0": 1.0, "s1": 0.25}, ["id"]).count()

    def test_default_weight_zero_drops_unlisted(self, spark):
        from oroboro_dw_dbt_spark.ops import weighted_mix

        df = spark.range(0, 100).withColumn("src", F.lit("unknown"))
        assert weighted_mix(df, "src", {"s0": 1.0}, ["id"]).count() == 0

    def test_bad_weight_raises(self, spark):
        from oroboro_dw_dbt_spark.ops import weighted_mix
        import pytest

        df = spark.range(1).withColumn("src", F.lit("a"))
        with pytest.raises(ValueError):
            weighted_mix(df, "src", {"a": 1.5}, ["id"])


class TestQualityFilter:
    def test_first_fail_reason_order(self, spark):
        from oroboro_dw_dbt_spark.text.pipeline import quality_filter

        docs = _docs(
            spark,
            [
                "short doc",  # too_short (also low diversity — order matters)
                " ".join(["the"] * 30),  # 30 tokens, diversity 1/30 → low_diversity
                " ".join(f"w{i}" for i in range(30)),  # diverse, no stopwords
                "the quick brown fox jumps over the lazy dog and "
                + " ".join(f"u{i}" for i in range(20)),  # keeps
            ],
        )
        out = {r["doc_id"]: r for r in quality_filter(docs).collect()}
        assert (out[0]["keep"], out[0]["reason"]) == (False, "too_short")
        assert (out[1]["keep"], out[1]["reason"]) == (False, "low_diversity")
        assert (out[2]["keep"], out[2]["reason"]) == (False, "no_stopwords")
        assert (out[3]["keep"], out[3]["reason"]) == (True, None)


class TestPackShards:
    def test_sequential_budget_assignment(self, spark):
        from oroboro_dw_dbt_spark.text.pipeline import pack_shards

        docs = spark.createDataFrame(
            [
                (0, " ".join(["w"] * 6), "s0"),
                (1, " ".join(["w"] * 6), "s0"),
                (2, " ".join(["w"] * 6), "s0"),  # prefix 12 → shard 1
                (3, " ".join(["w"] * 3), "s1"),  # other group restarts
            ],
            "doc_id long, text string, source string",
        )
        out = {r["doc_id"]: r for r in pack_shards(docs, budget=10, group_col="source").collect()}
        assert [out[i]["shard_id"] for i in range(4)] == [0, 0, 1, 0]
        assert out[2]["tokens_before"] == 12

    def test_composite_banding_bounds_the_sequential_unit(self, spark):
        """A one-source-dominated corpus: 90 of 100 docs in one source.
        Banding on doc_id DIV 10 caps every running-sum window at 10
        docs, and within each (source, band) subgroup the budget still
        overflows by at most one document."""
        from pyspark.sql import functions as F

        from oroboro_dw_dbt_spark.text.pipeline import pack_shards

        rows = [(i, " ".join(["w"] * (3 + i % 5)), "big" if i < 90 else "s" + str(i))
                for i in range(100)]
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        banded = docs.withColumn("band", F.expr("CAST(doc_id DIV 10 AS INT)"))
        out = pack_shards(banded, budget=12, group_col=["source", "band"]).collect()

        from collections import defaultdict

        subgroup = defaultdict(list)
        for r in out:
            subgroup[(r.source, r.band)].append(r)
        # sequential unit bounded by band size regardless of source skew
        assert max(len(v) for v in subgroup.values()) <= 10
        assert len([k for k in subgroup if k[0] == "big"]) == 9  # bands 0..8
        # budget: every shard's token total <= budget + (its last doc - 1)
        for (src, band), rs in subgroup.items():
            per_shard = defaultdict(list)
            for r in rs:
                per_shard[r.shard_id].append(r)
            for sid, docs_in in per_shard.items():
                total = sum(d.n_tokens for d in docs_in)
                largest = max(d.n_tokens for d in docs_in)
                assert total <= 12 + largest - 1 or len(docs_in) == 1
            # shard ids are contiguous from 0 within the subgroup
            assert sorted(per_shard) == list(range(len(per_shard)))


class TestCorpusGraph:
    def test_dag_lifecycle_and_tests(self, spark, tmp_path):
        from oroboro_dw_dbt_spark.engine.dag import SourceRegistry
        from oroboro_dw_dbt_spark.models.corpus_pipeline import build_corpus_graph
        from oroboro_dw_dbt_spark.sources.testdata import load_table

        sources = SourceRegistry()
        sources.add_provider(
            "documents", lambda s: load_table(s, "/root/testdata/sf0.001", "documents")
        )
        graph = build_corpus_graph(sources, warehouse_dir=str(tmp_path))
        results = graph.run(spark, select=["corpus_shards"], run_tests=True)
        assert set(results) >= {
            "docs_clean", "docs_dedup", "docs_mixed", "corpus_shards",
        }
        shards = graph.frame("corpus_shards")
        # mart actually materialized partitioned-by-source on disk
        assert (tmp_path / "corpus_shards").exists()
        assert any(
            p.name.startswith("source=")
            for p in (tmp_path / "corpus_shards").iterdir()
        )
        # monotone contract: tokens_before strictly increases within a shard
        from pyspark.sql.window import Window as W

        w = W.partitionBy("source", "shard_id").orderBy("doc_id")
        bad = (
            shards.withColumn("_prev", F.lag("tokens_before").over(w))
            .filter(F.col("_prev").isNotNull() & (F.col("_prev") >= F.col("tokens_before")))
            .count()
        )
        assert bad == 0

    def test_tag_selection_runs_corpus_family(self, spark, tmp_path):
        from oroboro_dw_dbt_spark.engine.dag import SourceRegistry
        from oroboro_dw_dbt_spark.models.corpus_pipeline import build_corpus_graph
        from oroboro_dw_dbt_spark.sources.testdata import load_table

        sources = SourceRegistry()
        sources.add_provider(
            "documents", lambda s: load_table(s, "/root/testdata/sf0.001", "documents")
        )
        graph = build_corpus_graph(sources)
        results = graph.run(spark, select=["tag:corpus"], run_tests=False)
        assert len(results) == 4


class TestPackShardsComposite:
    def test_composite_grouping_bounds_the_sequential_unit(self, spark):
        from oroboro_dw_dbt_spark.text.pipeline import pack_shards

        docs = spark.createDataFrame(
            [
                (0, "a b c", "s0", 0),
                (1, "a b c", "s0", 0),
                (2, "a b c", "s0", 1),  # new band → prefix restarts
            ],
            "doc_id long, text string, source string, band int",
        )
        out = {
            r["doc_id"]: r
            for r in pack_shards(docs, budget=4, group_col=["source", "band"]).collect()
        }
        assert out[2]["tokens_before"] == 0  # band 1 restarted
        assert out[1]["tokens_before"] == 3
        assert set(out[0].asDict()) >= {"source", "band", "shard_id"}
