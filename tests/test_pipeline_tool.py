"""tools/pipeline_e2e.py CLI surface (VERDICT r11 Next #7): the
recall knobs are promoted from typo-silent env strings to CLI args,
and the artifact records what a rung actually ran with."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.pipeline_e2e import _parse_args, _resolve_knob, main  # noqa: E402


class TestKnobResolution:
    def test_cli_wins_over_env(self, monkeypatch):
        monkeypatch.setenv("SPARK_GRAFT_SEMDEDUP_MARGIN", "0.5")
        assert _resolve_knob(0.1, "SPARK_GRAFT_SEMDEDUP_MARGIN", float) == (
            0.1,
            "cli",
        )

    def test_env_fallback(self, monkeypatch):
        monkeypatch.setenv("SPARK_GRAFT_SEMDEDUP_SPILL", "0.3")
        assert _resolve_knob(None, "SPARK_GRAFT_SEMDEDUP_SPILL", float) == (
            0.3,
            "env",
        )

    def test_default_off(self, monkeypatch):
        monkeypatch.delenv("SPARK_GRAFT_SEMDEDUP_MARGIN", raising=False)
        assert _resolve_knob(None, "SPARK_GRAFT_SEMDEDUP_MARGIN", float) == (
            None,
            "default",
        )

    def test_parse_args_positional_compat(self):
        a = _parse_args(["OUT.json", "/x/sf0.1"])
        assert a.out_path == "OUT.json" and a.sf_dir == "/x/sf0.1"
        assert a.margin is None and a.spill is None and a.nprobe is None
        a = _parse_args(
            ["o.json", "/d", "--margin", "0.1", "--spill", "0.3",
             "--nprobe", "16"]
        )
        assert (a.margin, a.spill, a.nprobe) == (0.1, 0.3, 16)


class TestPipelineSmoke:
    def test_chain_with_cli_knobs(self, spark, tmp_path, monkeypatch):
        """One full chain at the smoke SF with the headline knobs on
        the CLI: the artifact must carry recall_knobs with source=cli
        and the usual stage walls/counts. (get_spark reuses the test
        session, so this is in-process, not a second JVM.)"""
        monkeypatch.setenv("SPARK_GRAFT_BENCH_MAX_WAITS", "0")
        monkeypatch.delenv("SPARK_GRAFT_SEMDEDUP_MARGIN", raising=False)
        monkeypatch.delenv("SPARK_GRAFT_SEMDEDUP_SPILL", raising=False)
        monkeypatch.delenv("SPARK_GRAFT_SEMDEDUP_NPROBE", raising=False)
        out = tmp_path / "pipe.json"
        main(
            [str(out), "/root/testdata/sf0.001", "--margin", "0.1",
             "--spill", "0.3", "--nprobe", "16"]
        )
        rec = json.loads(out.read_text())
        assert rec["recall_knobs"] == {
            "nprobe": 16,
            "probe_margin": 0.1,
            "group_spill": 0.3,
            "spill_cap": 8,
            "source": {
                "nprobe": "cli",
                "probe_margin": "cli",
                "group_spill": "cli",
                "spill_cap": "default",
            },
        }
        assert rec["counts"]["corpus"] > 0
        assert rec["counts"]["after_semantic"] <= rec["counts"]["after_near_dup"]
        assert set(rec["stages"]) == {
            "quality_filter",
            "minhash_lsh_dedup",
            "semdedup_ivf",
            "pack_shards",
        }
        assert rec["semdedup_mode"] == "linear"


class TestChainPlanAudit:
    def test_chain_plans_have_zero_flags(self, spark):
        """VERDICT r11 Next #8, wired into the round's routine: the
        4-stage chain AS pipeline_e2e composes it (stage-boundary
        checkpoints included, headline recall knobs on) must audit
        clean — no cartesian/BNLJ, no BatchEvalPython, no wide scans,
        no unreduced scaling-table broadcast hints — at the smoke SF.
        The sf30 run is the round's manual routine; this keeps the
        composition from drifting into a flag unnoticed."""
        from tools.explain_audit import (
            audit_broadcast_hints,
            audit_one,
            chain_plan_frames,
            plan_text,
        )

        frames = chain_plan_frames(spark, "/root/testdata/sf0.001")
        assert set(frames) == {
            "chain:quality_filter",
            "chain:minhash_lsh_dedup",
            "chain:semdedup_ivf",
            "chain:pack_shards",
        }
        all_flags = {
            name: audit_one(name, plan_text(df)) + audit_broadcast_hints(df)
            for name, df in frames.items()
        }
        assert all(not f for f in all_flags.values()), all_flags


class TestShuffleWidth:
    """Disk-rung shuffle width is a CONSTANT 256: the r12 2×2 A/B on
    the clean sf1000 corpus measured a corpus-scaled width (1024)
    dead even in-chain on the LSH stage, +37% on the semantic stage,
    and +6% on the rung total — the scaled rule was reverted
    (SCALE.md round 12). SPARK_GRAFT_PIPE_SHUFFLE overrides for A/B
    probes; widening past 256 must drop the AQE advisory to 24m or
    coalescePartitions merges the extra partitions straight back.
    Memory rungs keep n_shuffle=None (session default)."""

    def _tiny_dir(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path / "documents.parquet"
        d.mkdir()
        pq.write_table(
            pa.table({"doc_id": pa.array(range(8), pa.int64())}),
            d / "part-0.parquet",
        )
        return str(tmp_path)

    def test_disk_rung_constant_width(self, monkeypatch, tmp_path):
        from tools.pipeline_e2e import resolve_stage_confs

        monkeypatch.setenv("SPARK_GRAFT_PIPE_CKPT_LEVEL", "disk")
        monkeypatch.delenv("SPARK_GRAFT_PIPE_SHUFFLE", raising=False)
        ck, extra, n = resolve_stage_confs(self._tiny_dir(tmp_path))
        assert n == 256
        assert "spark.sql.adaptive.advisoryPartitionSizeInBytes" not in extra

    def test_override_widens_and_sets_advisory(self, monkeypatch, tmp_path):
        from tools.pipeline_e2e import resolve_stage_confs

        monkeypatch.setenv("SPARK_GRAFT_PIPE_CKPT_LEVEL", "disk")
        monkeypatch.setenv("SPARK_GRAFT_PIPE_SHUFFLE", "1024")
        ck, extra, n = resolve_stage_confs(self._tiny_dir(tmp_path))
        assert n == 1024
        assert extra["spark.sql.adaptive.advisoryPartitionSizeInBytes"] == "24m"

    def test_memory_rung_no_width(self, monkeypatch):
        from tools.pipeline_e2e import resolve_stage_confs

        monkeypatch.delenv("SPARK_GRAFT_PIPE_CKPT_LEVEL", raising=False)
        monkeypatch.delenv("SPARK_GRAFT_PIPE_SHUFFLE", raising=False)
        ck, extra, n = resolve_stage_confs("/root/testdata/sf0.001")
        assert ck is None and extra is None and n is None
