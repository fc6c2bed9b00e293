"""tools/gen_scale.py invariants: the scale-probe generator must scale
facts ×K with exact referential integrity and decorrelated payloads —
a broken generator would silently invalidate the sf1 probe ratios
recorded in BENCH_sf1_probe.json / SCALE.md."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def scaled(spark, tmp_path_factory):
    from gen_scale import generate

    out = str(tmp_path_factory.mktemp("scaled") / "sf2x")
    generate(spark, SRC, out, replicas=2)
    return out


class TestGenScale:
    def test_fact_counts_scale_and_dims_fixed(self, scaled):
        con = duckdb.connect()
        for t, k in [
            ("lineitem", 2), ("orders", 2), ("customer", 2), ("events", 2),
            ("documents", 2), ("embeddings", 2), ("region", 1), ("nation", 1),
        ]:
            src = con.execute(
                f"SELECT count(*) FROM '{SRC}/{t}.parquet'"
            ).fetchone()[0]
            got = con.execute(
                f"SELECT count(*) FROM '{scaled}/{t}.parquet/*.parquet'"
            ).fetchone()[0]
            assert got == src * k, (t, src, got)

    def test_referential_integrity(self, scaled):
        con = duckdb.connect()
        checks = [
            ("lineitem", "l_orderkey", "orders", "o_orderkey"),
            ("lineitem", "l_partkey", "part", "p_partkey"),
            ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
            ("orders", "o_custkey", "customer", "c_custkey"),
            ("customer", "c_nationkey", "nation", "n_nationkey"),
        ]
        for fact, fk, dim, pk in checks:
            dim_glob = f"'{scaled}/{dim}.parquet/*.parquet'"
            orphans = con.execute(
                f"SELECT count(*) FROM '{scaled}/{fact}.parquet/*.parquet' f "
                f"LEFT JOIN {dim_glob} d ON f.{fk} = d.{pk} "
                f"WHERE d.{pk} IS NULL"
            ).fetchone()[0]
            assert orphans == 0, (fact, fk, orphans)

    def test_keys_disjoint_across_replicas(self, scaled):
        con = duckdb.connect()
        for t, key in [("customer", "c_custkey"), ("orders", "o_orderkey"),
                       ("documents", "doc_id"), ("embeddings", "vec_id")]:
            n, nd = con.execute(
                f"SELECT count(*), count(DISTINCT {key}) "
                f"FROM '{scaled}/{t}.parquet/*.parquet'"
            ).fetchone()
            assert n == nd, (t, n, nd)

    def test_document_replicas_are_shingle_distinct(self, scaled):
        """Replica texts must differ from the originals (so MinHash sees
        distinct docs) while keeping the token COUNT (length stats
        preserved)."""
        con = duckdb.connect()
        n_docs = con.execute(
            f"SELECT count(*) FROM '{SRC}/documents.parquet'"
        ).fetchone()[0]
        dup_texts = con.execute(
            f"SELECT count(*) - count(DISTINCT text) "
            f"FROM '{scaled}/documents.parquet/*.parquet'"
        ).fetchone()[0]
        # only within-source duplicates may survive; replica copies must not
        src_dups = con.execute(
            f"SELECT count(*) - count(DISTINCT text) FROM '{SRC}/documents.parquet'"
        ).fetchone()[0]
        assert dup_texts == 2 * src_dups, (dup_texts, src_dups)
        tok_mismatch = con.execute(
            f"""
            SELECT count(*) FROM
              (SELECT doc_id, len(string_split(text, ' ')) AS nt
               FROM '{scaled}/documents.parquet/*.parquet'
               WHERE doc_id >= {n_docs}) r
            JOIN (SELECT doc_id, len(string_split(text, ' ')) AS nt
                  FROM '{SRC}/documents.parquet') o
              ON r.doc_id = o.doc_id + (SELECT max(doc_id)+1 FROM '{SRC}/documents.parquet')
            WHERE r.nt != o.nt
            """
        ).fetchone()[0]
        assert tok_mismatch == 0

    def test_embedding_replicas_norm_preserved(self, scaled):
        """Circular shift: same multiset of components per vector, so the
        norm (and any per-vector moment) is exactly preserved."""
        con = duckdb.connect()
        stride = con.execute(
            f"SELECT max(vec_id) + 1 FROM '{SRC}/embeddings.parquet'"
        ).fetchone()[0]
        bad = con.execute(
            f"""
            SELECT count(*) FROM
              (SELECT vec_id, list_sum(list_transform(embedding, x -> x*x)) AS n2
               FROM '{scaled}/embeddings.parquet/*.parquet'
               WHERE vec_id >= {stride}) r
            JOIN (SELECT vec_id, list_sum(list_transform(embedding, x -> x*x)) AS n2
                  FROM '{SRC}/embeddings.parquet') o
              ON r.vec_id = o.vec_id + {stride}
            WHERE abs(r.n2 - o.n2) > 1e-6
            """
        ).fetchone()[0]
        assert bad == 0

    def test_chained_generation_manufactures_no_text_dups(
        self, scaled, spark, tmp_path_factory
    ):
        """Chain a second generation on top of the first (sf2x -> sf4x)
        and require ZERO manufactured exact-text duplicates: only the
        source's own duplicate pairs may replicate (×4 here).

        Regression for the r11 sf1000 corpus artifact: with r=0 skipping
        perturbation, chained replica paths with the same nonzero suffix
        sequence — (x,0) vs (0,x) — produced byte-identical text, a
        10.0% exact-dup excess at sf1000 (native rate 0.16%) that
        inflated the LSH stage's per-doc wall and masqueraded as a
        superlinear engine term (VERDICT r11 Missing #3)."""
        from gen_scale import generate

        out = str(tmp_path_factory.mktemp("chained") / "sf4x")
        generate(spark, scaled, out, replicas=2,
                 tables=("documents", "embeddings"))
        con = duckdb.connect()
        src_dups = con.execute(
            f"SELECT count(*) - count(DISTINCT text) "
            f"FROM '{SRC}/documents.parquet'"
        ).fetchone()[0]
        chained_dups = con.execute(
            f"SELECT count(*) - count(DISTINCT text) "
            f"FROM '{out}/documents.parquet/*.parquet'"
        ).fetchone()[0]
        assert chained_dups == 4 * src_dups, (chained_dups, src_dups)

    def test_chained_embeddings_distinct_and_norm_preserved(
        self, scaled, spark, tmp_path_factory
    ):
        """Shifts alone compose additively, so chained paths (x,0) and
        (0,x) land on the same rotation: without the (stride, r)-seeded
        sign pattern the sf4x chain would hold vector pairs that are
        float-identical. Require zero manufactured identical vectors
        and exact norm preservation through BOTH levels."""
        from gen_scale import generate

        out = str(tmp_path_factory.mktemp("chained_vec") / "sf4x")
        generate(spark, scaled, out, replicas=2,
                 tables=("documents", "embeddings"))
        con = duckdb.connect()
        src_vec_dups = con.execute(
            f"SELECT count(*) - count(DISTINCT embedding::VARCHAR) "
            f"FROM '{SRC}/embeddings.parquet'"
        ).fetchone()[0]
        chained_vec_dups = con.execute(
            f"SELECT count(*) - count(DISTINCT embedding::VARCHAR) "
            f"FROM '{out}/embeddings.parquet/*.parquet'"
        ).fetchone()[0]
        assert chained_vec_dups == 4 * src_vec_dups, (
            chained_vec_dups, src_vec_dups,
        )
        # norm preservation through two composed orthogonal transforms
        bad = con.execute(
            f"""
            SELECT count(*) FROM
              (SELECT vec_id % (SELECT max(vec_id)+1
                                FROM '{SRC}/embeddings.parquet') AS base,
                      list_sum(list_transform(embedding, x -> x*x)) AS n2
               FROM '{out}/embeddings.parquet/*.parquet') r
            JOIN (SELECT vec_id AS base,
                         list_sum(list_transform(embedding, x -> x*x)) AS n2
                  FROM '{SRC}/embeddings.parquet') o USING (base)
            WHERE abs(r.n2 - o.n2) > 1e-4
            """
        ).fetchone()[0]
        assert bad == 0
