"""The model-DAG executor — our equivalent of dbt-core.

The reference's execution framework is: parse ``{{ source() }}`` /
``{{ ref() }}`` Jinja to build a DAG of SQL models, topo-sort, and
materialize each node as a view or table in the warehouse
(ref: dbt_project.yml:9-17 for materialization config; SURVEY §3).

Here a *model* is a Python function returning a DataFrame. Its
dependencies are declared by parameter name: each parameter resolves to
either a registered source table or an upstream model — the exact
semantic of ``source()``/``ref()``, with the DAG edge captured by
function signature instead of Jinja side effect.

Materialization semantics (mirrors dbt's four modes):

- ``view``  — the logical plan is registered as a temp view and handed
  to consumers *lazily*; recomputed per downstream action, exactly like
  a database view. No data is persisted.
- ``table`` — the DataFrame is written to the warehouse as Parquet
  (overwrite) and downstream consumers read the materialized files.
  ``partition_by`` writes hive-style partition directories so
  downstream filters on those columns become partition pruning.
- ``ephemeral`` — never materialized and not even registered as a temp
  view; the plan is inlined into every consumer (dbt's CTE semantics).
- ``incremental`` — on first run, identical to ``table``; afterwards
  only the model's new output is merged into the existing table:
  existing rows whose ``unique_key`` matches a new row are replaced
  (delete+insert), everything else is kept. This is the 100 TB mart
  story — a daily build touches the day's rows, not the full history.
  Local parquet swap is staged-then-renamed; a production deployment
  would put Delta/Iceberg under the same interface for atomicity.

Scale notes: a ``table`` write is the only action per node, so Catalyst
sees each model's full plan and optimizes it end-to-end (predicate
pushdown through views into the Parquet scans). ``threads`` submits
independent subtrees concurrently — same role as dbt's ``threads: 4``
(ref: profiles.example.yml:9) but for Spark job submission.
"""

from __future__ import annotations

import inspect
import time
from collections.abc import Callable
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor
from concurrent.futures import wait as futures_wait
from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from oroboro_dw_dbt_spark.engine.tests import DataTest, TestResult


class SourceRegistry:
    """name → loader. The engine's version of ``sources.yml``.

    A source is registered either as a Parquet path (the normal case:
    columnar scans with pushdown) or as an explicit provider callable
    (tests inject in-memory fixture DataFrames this way).
    """

    FORMATS = ("parquet", "csv", "json", "orc")

    def __init__(self) -> None:
        self._paths: dict[str, tuple[str, str, dict[str, str]]] = {}
        self._providers: dict[str, Callable[[SparkSession], DataFrame]] = {}
        self._schemas: dict[str, T.StructType] = {}

    def add_path(
        self,
        name: str,
        path: str,
        schema: T.StructType | None = None,
        format: str = "parquet",
        options: dict[str, str] | None = None,
    ) -> None:
        """Register a file-backed source. Non-parquet formats want an
        explicit ``schema`` — csv/json inference is a full extra pass
        over the data, which at 100 TB is not a default anyone means."""
        if format not in self.FORMATS:
            raise ValueError(f"{name}: format must be one of {self.FORMATS}")
        self._paths[name] = (path, format, dict(options or {}))
        if schema is not None:
            self._schemas[name] = schema

    def add_provider(
        self, name: str, provider: Callable[[SparkSession], DataFrame]
    ) -> None:
        self._providers[name] = provider

    def __contains__(self, name: str) -> bool:
        return name in self._paths or name in self._providers

    def names(self) -> list[str]:
        return sorted(set(self._paths) | set(self._providers))

    def load(self, spark: SparkSession, name: str) -> DataFrame:
        if name in self._providers:
            return self._providers[name](spark)
        if name in self._paths:
            path, fmt, options = self._paths[name]
            reader = spark.read.format(fmt).options(**options)
            if name in self._schemas:
                reader = reader.schema(self._schemas[name])
            return reader.load(path)
        raise KeyError(f"unknown source {name!r}; registered: {self.names()}")


MATERIALIZATIONS = ("view", "table", "ephemeral", "incremental")


class ModelTestsFailed(RuntimeError):
    """Raised under ``run(strict_tests=True)`` when a model's declared
    data tests fail — ``dbt build``'s halt-downstream contract."""

    def __init__(self, model_name: str, failures: list) -> None:
        self.model_name = model_name
        self.failures = failures
        names = ", ".join(f.name for f in failures)
        super().__init__(f"model {model_name!r} failed data tests: {names}")


@dataclass
class Model:
    name: str
    fn: Callable[..., DataFrame]
    deps: tuple[str, ...]
    materialized: str = "view"  # one of MATERIALIZATIONS
    tags: tuple[str, ...] = ()
    tests: tuple[DataTest, ...] = ()
    partition_by: tuple[str, ...] = ()  # table/incremental only
    unique_key: tuple[str, ...] = ()  # incremental merge key
    on_schema_change: str = "ignore"  # ignore | append_new_columns | fail

    def __post_init__(self) -> None:
        if self.materialized not in MATERIALIZATIONS:
            raise ValueError(
                f"{self.name}: materialized must be one of {MATERIALIZATIONS}"
            )
        if self.materialized == "incremental" and not self.unique_key:
            raise ValueError(f"{self.name}: incremental models need a unique_key")
        if self.partition_by and self.materialized not in ("table", "incremental"):
            raise ValueError(f"{self.name}: partition_by requires a table write")
        if self.on_schema_change not in ("ignore", "append_new_columns", "fail"):
            raise ValueError(
                f"{self.name}: on_schema_change must be ignore | "
                f"append_new_columns | fail, got {self.on_schema_change!r}"
            )


@dataclass
class RunResult:
    name: str
    materialized: str
    seconds: float
    test_results: list[TestResult] = field(default_factory=list)

    @property
    def tests_passed(self) -> bool:
        return all(t.passed for t in self.test_results)


def model(
    *,
    name: str | None = None,
    materialized: str = "view",
    tags: tuple[str, ...] = (),
    tests: tuple[DataTest, ...] = (),
    partition_by: tuple[str, ...] = (),
    unique_key: tuple[str, ...] = (),
    on_schema_change: str = "ignore",
) -> Callable[[Callable[..., DataFrame]], Model]:
    """Decorator: declare a model; deps are the function's parameter names."""

    def wrap(fn: Callable[..., DataFrame]) -> Model:
        deps = tuple(inspect.signature(fn).parameters)
        return Model(
            name=name or fn.__name__,
            fn=fn,
            deps=deps,
            materialized=materialized,
            tags=tags,
            tests=tuple(tests),
            partition_by=tuple(partition_by),
            unique_key=tuple(unique_key),
            on_schema_change=on_schema_change,
        )

    return wrap


class ModelGraph:
    """Registry + topo-order executor for a set of models."""

    def __init__(
        self,
        sources: SourceRegistry,
        warehouse_dir: str | None = None,
        threads: int = 4,
        table_format: Any | None = None,
    ) -> None:
        from oroboro_dw_dbt_spark.engine.table_format import LocalParquetFormat

        self.sources = sources
        self.warehouse_dir = warehouse_dir
        self.threads = threads
        self.table_format = table_format or LocalParquetFormat()
        self.models: dict[str, Model] = {}

    def add(self, *models: Model) -> "ModelGraph":
        for m in models:
            if m.name in self.models:
                raise ValueError(f"duplicate model {m.name!r}")
            self.models[m.name] = m
        return self

    # -- graph ------------------------------------------------------------

    def _edges(self) -> dict[str, set[str]]:
        """node → set of upstream *model* deps (sources are leaves).
        The reserved dep name ``this`` is dbt's ``{{ this }}``: the
        model's OWN existing table (None on first build) — not a graph
        edge."""
        edges: dict[str, set[str]] = {}
        for m in self.models.values():
            up = set()
            for d in m.deps:
                if d == "this":
                    if m.materialized != "incremental":
                        raise ValueError(
                            f"model {m.name!r} takes 'this' but is not "
                            f"incremental — only incremental models see "
                            f"their previous state"
                        )
                    continue
                if d in self.models:
                    up.add(d)
                elif d not in self.sources:
                    raise KeyError(
                        f"model {m.name!r} depends on {d!r}, which is neither a "
                        f"model nor a registered source"
                    )
            edges[m.name] = up
        return edges

    def topo_order(self) -> list[str]:
        return list(TopologicalSorter(self._edges()).static_order())

    # -- execution --------------------------------------------------------

    def run(
        self,
        spark: SparkSession,
        select: list[str] | None = None,
        run_tests: bool = True,
        strict_tests: bool = False,
        full_refresh: bool = False,
    ) -> dict[str, Any]:
        """Build all (or selected) models in DAG order.

        ``full_refresh=True`` is dbt's ``--full-refresh``: incremental
        models rebuild from scratch (overwrite through the staged swap)
        instead of merging — the recovery path after bad data or an
        intentional schema break.

        ``select`` entries are model names or ``tag:<t>`` selectors
        (every model carrying the tag — dbt's ``--select tag:marts``,
        ref: dbt_project.yml:12-17); each selected model's upstream
        closure is always included, mirroring dbt's ``+model``.

        ``strict_tests=True`` is ``dbt build`` semantics: a model whose
        declared data tests fail raises :class:`ModelTestsFailed` and
        nothing downstream of it is scheduled (in-flight siblings finish
        first, as dbt's executor also lets them). The default mirrors
        ``dbt run`` + ``dbt test`` reporting: failures are recorded on
        the RunResult and the caller decides.

        Returns {model_name: RunResult}; built DataFrames are available
        via :meth:`frame` afterwards. Independent ready nodes are
        submitted concurrently on ``threads`` workers — only ``table``
        materializations do real work (a Spark write action); views are
        driver-side plan construction only.
        """
        want = self._closure(self._expand_select(select)) if select else set(self.models)
        edges = {n: {d for d in up if d in want} for n, up in self._edges().items() if n in want}
        self._frames: dict[str, DataFrame] = {}
        results: dict[str, RunResult] = {}

        ts = TopologicalSorter(edges)
        ts.prepare()
        with ThreadPoolExecutor(max_workers=self.threads) as pool:
            futs: dict[Any, str] = {}

            def submit_ready() -> None:
                for n in ts.get_ready():
                    futs[
                        pool.submit(
                            self._build, spark, n, run_tests, strict_tests, full_refresh
                        )
                    ] = n

            # work-queue scheduling, not wave-based: a finished node
            # releases its dependents immediately even while slower
            # siblings are still building (dbt's `threads` semantics)
            submit_ready()
            while futs:
                done, _ = futures_wait(futs, return_when=FIRST_COMPLETED)
                for fut in done:
                    n = futs.pop(fut)
                    results[n] = fut.result()
                    ts.done(n)
                submit_ready()
        return results

    def _expand_select(self, select: list[str]) -> list[str]:
        """Resolve ``tag:<t>`` selectors to model names; pass names through."""
        names: list[str] = []
        for s in select:
            if s.startswith("tag:"):
                tag = s[4:]
                matched = [m.name for m in self.models.values() if tag in m.tags]
                if not matched:
                    raise KeyError(f"no model carries tag {tag!r}")
                names.extend(matched)
            elif s in self.models:
                names.append(s)
            else:
                raise KeyError(f"unknown model {s!r} in select")
        return names

    def _closure(self, select: list[str]) -> set[str]:
        """Selected models plus all their upstream models."""
        edges = self._edges()
        out: set[str] = set()
        stack = list(select)
        while stack:
            n = stack.pop()
            if n in out:
                continue
            out.add(n)
            stack.extend(edges[n])
        return out

    def _build(
        self,
        spark: SparkSession,
        name: str,
        run_tests: bool,
        strict_tests: bool = False,
        full_refresh: bool = False,
    ) -> RunResult:
        m = self.models[name]
        t0 = time.monotonic()
        kwargs = {}
        for d in m.deps:
            if d == "this":
                from pathlib import Path

                out = Path(self.warehouse_dir) / m.name if self.warehouse_dir else None
                kwargs[d] = (
                    self.table_format.read(spark, out)
                    if out is not None and out.exists() and not full_refresh
                    else None
                )
            elif d in self.models:
                kwargs[d] = self._frames[d]
            else:
                kwargs[d] = self.sources.load(spark, d)
        df = m.fn(**kwargs)

        if m.materialized in ("table", "incremental"):
            if self.warehouse_dir is None:
                raise ValueError(
                    f"model {name!r} is materialized as {m.materialized} but the "
                    f"graph has no warehouse_dir"
                )
            df = self._write_table(spark, m, df, full_refresh=full_refresh)
        if m.materialized != "ephemeral":
            df.createOrReplaceTempView(name)
        self._frames[name] = df

        test_results: list[TestResult] = []
        if run_tests:
            test_results = [t.run(df) for t in m.tests]
            failed = [t for t in test_results if not t.passed]
            if strict_tests and failed:
                raise ModelTestsFailed(name, failed)
        return RunResult(
            name=name,
            materialized=m.materialized,
            seconds=time.monotonic() - t0,
            test_results=test_results,
        )

    def _write_table(
        self, spark: SparkSession, m: Model, df: DataFrame, full_refresh: bool = False
    ) -> DataFrame:
        """Materialize ``df`` at ``warehouse_dir/name`` via the graph's
        ``table_format`` and return the on-disk frame. ``incremental``:
        delete+insert by unique_key — the new output is the authority
        for every key it contains; all other existing rows survive. The
        merge anti-joins existing against the (small) new-key set —
        broadcast under AQE, so an incremental run never shuffles the
        full history. The staging→final swap is the format's
        ``replace`` (backup-first locally; ACID commit on Delta/
        Iceberg)."""
        from pathlib import Path

        fmt = self.table_format
        out = Path(self.warehouse_dir) / m.name
        first_build = not out.exists()

        if m.materialized == "incremental" and not first_build and full_refresh:
            # dbt --full-refresh: rebuild from scratch, but through the
            # staged swap so a crash mid-rebuild cannot lose the table
            staging = Path(self.warehouse_dir) / f"{m.name}__staging"
            fmt.write(df, staging, m.partition_by)
            fmt.replace(staging, out)
            return fmt.read(spark, out)
        if m.materialized == "incremental" and not first_build:
            existing = fmt.read(spark, out)
            keys = [k for k in m.unique_key]
            df = self._apply_schema_policy(m, existing, df)
            kept = existing.join(df.select(*keys).dropDuplicates(), on=keys, how="left_anti")
            merged = kept.unionByName(df, allowMissingColumns=True)
            # parquet can't overwrite a dir it is reading: stage then swap
            staging = Path(self.warehouse_dir) / f"{m.name}__staging"
            fmt.write(merged, staging, m.partition_by)
            fmt.replace(staging, out)
        else:
            fmt.write(df, out, m.partition_by)
        return fmt.read(spark, out)

    def _apply_schema_policy(
        self, m: Model, existing: DataFrame, df: DataFrame
    ) -> DataFrame:
        """dbt's ``on_schema_change`` for incremental runs. ``ignore``
        (the dbt default): new columns in this run's output are DROPPED
        so the table keeps its schema — but a run missing an existing
        column is always an error (silently nulling a column the table
        promised is data loss, not drift). ``append_new_columns``: new
        columns join the table, historical rows read NULL for them.
        ``fail``: any column-set difference raises."""
        old_cols = existing.columns
        new_cols = df.columns
        added = [c for c in new_cols if c not in old_cols]
        removed = [c for c in old_cols if c not in new_cols]
        if removed:
            raise ValueError(
                f"model {m.name!r}: incremental run dropped column(s) "
                f"{removed} still present in the target table"
            )
        if not added:
            return df
        if m.on_schema_change == "fail":
            raise ValueError(
                f"model {m.name!r}: schema changed (new columns {added}) "
                f"and on_schema_change='fail'"
            )
        if m.on_schema_change == "ignore":
            return df.select(*old_cols)
        return df  # append_new_columns: union fills old rows with NULL

    def frame(self, name: str) -> DataFrame:
        return self._frames[name]

    def plan_frames(self, spark: SparkSession) -> dict[str, DataFrame]:
        """Every model's BUILD plan as an un-materialized DataFrame.

        ``run()`` materializes table models and hands consumers the
        on-disk read, so explaining ``frame(name)`` afterwards shows a
        2-node parquet scan — not the join/window tree the build
        executed (the round-4 audit blind spot). This resolves the whole
        graph with view semantics — deps feed the upstream *plan*, no
        writes, no temp views — so `.explain` shows exactly what
        Catalyst optimizes when the model builds. Incremental models see
        ``this=None`` (the first-build plan, which is the full-query
        shape the optimizer must survive)."""
        frames: dict[str, DataFrame] = {}
        for name in self.topo_order():
            m = self.models[name]
            kwargs = {}
            for d in m.deps:
                if d == "this":
                    kwargs[d] = None
                elif d in self.models:
                    kwargs[d] = frames[d]
                else:
                    kwargs[d] = self.sources.load(spark, d)
            frames[name] = m.fn(**kwargs)
        return frames

    # -- documentation artifacts ------------------------------------------

    def manifest(self) -> dict[str, Any]:
        """The graph as a ``dbt docs generate``-style manifest: one node
        per model with its config, declared tests, and resolved lineage
        (model deps vs source deps), plus the source inventory and the
        topological build order. Pure metadata — safe to json.dumps and
        diff in CI; no Spark session required."""
        nodes = {}
        for m in self.models.values():
            nodes[m.name] = {
                "name": m.name,
                "materialized": m.materialized,
                "tags": list(m.tags),
                "depends_on": {
                    "models": sorted(d for d in m.deps if d in self.models),
                    "sources": sorted(
                        d for d in m.deps if d not in self.models and d != "this"
                    ),
                },
                "tests": [t.name for t in m.tests],
                "partition_by": list(m.partition_by),
                "unique_key": list(m.unique_key),
                "on_schema_change": m.on_schema_change,
            }
        return {
            "nodes": nodes,
            "sources": self.sources.names(),
            "build_order": self.topo_order(),
        }
