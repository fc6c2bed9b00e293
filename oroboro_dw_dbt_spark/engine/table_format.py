"""Pluggable table-storage formats for the DAG executor's sinks.

The reference materializes marts as BigQuery tables (dbt_project.yml:
15-17), where replace-on-write is atomic. Local parquet directories
aren't: a naive ``rmtree(old) + rename(staging)`` has a crash window
that destroys the existing table. This seam isolates that concern:

- :class:`LocalParquetFormat` — the minimal implementation. Writes
  plain parquet dirs; ``replace`` renames the old table aside, moves
  the staging dir into place, and only then deletes the backup, so a
  crash at any single step leaves either the old or the new table
  recoverable on disk (the ``__old`` backup is restored on failure).
- :class:`ManifestParquetFormat` — the ACID implementation: every
  write lands an IMMUTABLE snapshot directory, and the table "is"
  whatever one pointer file says. Commit = ``os.replace`` of that
  pointer — atomic on POSIX — so readers see the previous snapshot
  until the instant the new one is complete, a crash anywhere before
  the pointer swap leaves the table byte-identical to before (the
  half-written snapshot is an unreferenced orphan), and old snapshots
  remain readable by version (time travel). This is the same
  commit-protocol shape Delta's _delta_log / Iceberg's metadata
  pointer use; swapping them in behind the seam changes no executor
  code and upgrades the pointer swap to an object-store-safe commit.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import threading
import time
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


_PIN_KEY = "spark.sql.parquet.outputTimestampType"
_PIN_LOCK = threading.RLock()
# id(session) -> [depth, original-value]: the pin is REFCOUNTED per
# session so overlapping writers (the WAP/branch API invites them)
# can't race each other's set/restore — the first enterer records the
# caller's value, the last exiter restores it; everyone in between
# only moves the count. No parquet per-write option exists for this
# conf (ParquetWriteSupport reads SQLConf), so a session-global pin
# is the only lever and it must be concurrency-safe.
_PIN_STATE: dict[int, list] = {}


@contextlib.contextmanager
def _stats_bearing_writes(df: DataFrame):
    """Pin ``spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS``
    around a parquet write, restoring the caller's value after the
    LAST overlapping write exits.

    The manifest's zone maps are read back from parquet FOOTERS
    (:meth:`ManifestParquetFormat._collect_file_stats`), and whether a
    timestamp column *has* footer min/max depends on its physical type:
    INT96 — Spark's legacy default — is written with no statistics at
    all, so under an unconfigured caller session every file would lack
    timestamp bounds and ``stats_summary`` would honestly refuse. The
    conf is a runtime SQL conf, so pinning it here (not in a session
    factory the caller may never use) makes the table format
    self-sufficient under ANY SparkSession."""
    session = df.sparkSession
    conf = session.conf
    sid = id(session)
    with _PIN_LOCK:
        state = _PIN_STATE.get(sid)
        if state is None:
            state = _PIN_STATE[sid] = [0, conf.get(_PIN_KEY, None)]
            conf.set(_PIN_KEY, "TIMESTAMP_MICROS")
        state[0] += 1
    try:
        yield
    finally:
        with _PIN_LOCK:
            state = _PIN_STATE[sid]
            state[0] -= 1
            if state[0] == 0:
                del _PIN_STATE[sid]
                if state[1] is None:
                    conf.unset(_PIN_KEY)
                else:
                    conf.set(_PIN_KEY, state[1])


class LocalParquetFormat:
    """Parquet-directory tables with a backup-first replace."""

    def write(
        self, df: DataFrame, path: Path, partition_by: tuple[str, ...] = ()
    ) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(str(path))

    def read(self, spark: SparkSession, path: Path) -> DataFrame:
        return spark.read.parquet(str(path))

    def replace(self, staging: Path, final: Path) -> None:
        """Swap ``staging`` into ``final``'s place without a window in
        which the table is simply gone: old → ``__old`` backup, staging
        → final, then drop the backup; on a failed swap the backup is
        renamed back."""
        backup = final.with_name(final.name + "__old")
        if backup.exists():
            shutil.rmtree(backup)
        final.rename(backup)
        try:
            staging.rename(final)
        except OSError:
            backup.rename(final)  # restore the original table
            raise
        shutil.rmtree(backup)


class ManifestParquetFormat:
    """Snapshot + manifest-pointer parquet tables: atomic replace and
    time-travel reads with no storage-system help beyond POSIX rename.

    Layout of a table at ``path``::

        path/
          _manifest/CURRENT          # text file: the committed version
          _manifest/snap-<v>.json    # snapshot metadata (data dir, ts)
          data-<v>/                  # immutable parquet dir, one per version

    The COMMIT is ``os.replace(tmp, CURRENT)`` — the only mutation any
    write performs on shared state, and it is atomic. Everything before
    it (parquet write, metadata json) touches only not-yet-referenced
    paths, so a crash at ANY earlier point leaves readers on the prior
    version with the dead snapshot as an orphan (reclaimed by
    :meth:`vacuum`). ``before_commit`` is the chaos seam the crash test
    kills in (same pattern as the streaming upsert's ``before_batch``,
    streaming/jobs.py).
    """

    def __init__(self, before_commit: Callable[[Path, int], None] | None = None):
        self.before_commit = before_commit

    # -- manifest plumbing -------------------------------------------------

    def _manifest_dir(self, path: Path) -> Path:
        return Path(path) / "_manifest"

    def current_version(self, path: Path) -> int | None:
        cur = self._manifest_dir(path) / "CURRENT"
        if not cur.exists():
            return None
        return int(cur.read_text().strip())

    def versions(self, path: Path) -> list[int]:
        """COMMITTED, still-present snapshot versions (ascending).
        Snapshot metadata is written before the pointer swap, so a json
        with version > CURRENT is a crashed, never-committed write —
        excluded here (and overwritten by the next successful write)."""
        mdir = self._manifest_dir(path)
        cur = self.current_version(path)
        if not mdir.exists() or cur is None:
            return []
        return sorted(
            v
            for p in mdir.glob("snap-*.json")
            if (v := int(p.stem.split("-")[1])) <= cur
        )

    def history(self, path: Path) -> list[dict]:
        """DESCRIBE HISTORY: one record per committed version, op kind
        inferred from the snapshot metadata (the manifest is the audit
        log — no separate journal to drift out of sync):
        write / delete / restore / clone, plus delete-vector presence
        and the referenced data dir. Driver-side JSON only."""
        path = Path(path)
        out: list[dict] = []
        prev_deletes = 0
        for v in self.versions(path):
            meta = self._snapshot_meta(path, v)
            n_del = len(meta.get("delete_files", []))
            if "restored_from" in meta:
                op = "restore"
            elif "cloned_from" in meta:
                op = "clone"
            elif n_del > prev_deletes:
                op = "delete"
            else:
                op = "write"
            out.append(
                {
                    "version": v,
                    "op": op,
                    "n_delete_files": n_del,
                    "data_dir": meta.get("external_data_dir")
                    or meta["data_dir"],
                }
            )
            prev_deletes = n_del
        return out

    def _snapshot_meta(self, path: Path, version: int) -> dict:
        return json.loads(
            (self._manifest_dir(path) / f"snap-{version:06d}.json").read_text()
        )

    def _commit(self, path: Path, version: int) -> None:
        mdir = self._manifest_dir(path)
        if self.before_commit is not None:
            self.before_commit(Path(path), version)
        tmp = mdir / f"CURRENT.tmp.{version}"
        tmp.write_text(str(version))
        os.replace(tmp, mdir / "CURRENT")  # THE commit: atomic pointer swap

    # -- TableFormat interface --------------------------------------------

    def write(
        self,
        df: DataFrame,
        path: Path,
        partition_by: tuple[str, ...] = (),
        stats_cols: tuple[str, ...] = (),
    ) -> None:
        """Land a NEW snapshot and atomically point the table at it.
        The previous snapshot stays on disk, readable via ``version=``.

        ``stats_cols`` records per-FILE min/max for those columns in the
        snapshot metadata (read from the parquet footers pyarrow already
        wrote — no data re-scan). These are the zone maps behind
        :meth:`read_pruned`: the Iceberg manifest-stats / Delta
        dataSkippingNumIndexedCols idea, collected at write time where
        it costs one footer read per file.

        Session-wide side effect: for the duration of the underlying
        parquet write this pins ``spark.sql.parquet.outputTimestampType``
        to TIMESTAMP_MICROS (no per-write option exists in Spark), so an
        UNRELATED parquet write running concurrently on another thread
        of the same session lands with micros timestamps too. Overlapping
        manifest writers are refcount-safe; third-party writers sharing
        the session should avoid the window or expect micros."""
        version = self.stage(df, path, partition_by, stats_cols)
        self._commit(path, version)

    def stage(
        self,
        df: DataFrame,
        path: Path,
        partition_by: tuple[str, ...] = (),
        stats_cols: tuple[str, ...] = (),
    ) -> int:
        """Land a snapshot WITHOUT committing it: data + metadata exist
        on disk but no reader can see them (readers follow CURRENT).
        Returns the staged version for :meth:`commit_staged` — the
        write half of write-audit-publish (engine/wap.py). An abandoned
        stage is an orphan, reclaimed by :meth:`vacuum`."""
        path = Path(path)
        mdir = self._manifest_dir(path)
        mdir.mkdir(parents=True, exist_ok=True)
        # allocate past every EXISTING snapshot json, not just CURRENT:
        # two live stages (e.g. two branches) must never share a version
        staged = [
            int(p.stem.split("-")[1]) for p in mdir.glob("snap-*.json")
        ]
        version = max([self.current_version(path) or 0, *staged, 0]) + 1
        data_dir = path / f"data-{version:06d}"
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        with _stats_bearing_writes(df):
            w.parquet(str(data_dir))
        meta = {
            "version": version,
            "data_dir": data_dir.name,
            "partition_by": list(partition_by),
            "committed_at_unix": time.time(),
        }
        if stats_cols:
            meta["file_stats"] = self._collect_file_stats(data_dir, stats_cols)
        meta["file_rows"] = self._collect_file_rows(data_dir)
        (mdir / f"snap-{version:06d}.json").write_text(json.dumps(meta))
        return version

    def commit_staged(self, path: Path, version: int) -> None:
        """Atomically publish a previously staged version. Refuses to
        move the pointer backwards (a stale publish would silently
        un-commit newer data)."""
        path = Path(path)
        self._snapshot_meta(path, version)  # raises if never staged
        cur = self.current_version(path)
        if cur is not None and version <= cur:
            raise ValueError(
                f"stale publish: staged v{version} <= current v{cur}"
            )
        self._commit(path, version)

    @staticmethod
    def _json_stat(v):
        """Footer stats as JSON scalars. Timestamps/dates become ISO
        strings with EXPLICIT microseconds — a fixed-width spelling, so
        lexical order matches chronological order against any bound
        canonicalized the same way (:meth:`_canon_bound`); bytes are
        refused (no total order worth promising) by mapping to None,
        which drops the column's bounds for that file."""
        if v is None or isinstance(v, (bool, int, float, str)):
            return v
        if hasattr(v, "hour"):  # datetime
            return v.isoformat(sep=" ", timespec="microseconds")
        if hasattr(v, "isoformat"):  # date
            return v.isoformat()
        return None

    @staticmethod
    def _canon_bound(v):
        """Normalize a prune bound to the stats' spelling: datetimes →
        the fixed-width ISO form; timestamp-looking strings reformatted
        to it (so '2024-01-01 05:00:00' and '...05:00:00.000000' bounds
        compare identically); everything else unchanged."""
        from datetime import datetime

        if hasattr(v, "hour"):
            return v.isoformat(sep=" ", timespec="microseconds")
        if isinstance(v, str):
            try:
                return datetime.fromisoformat(v).isoformat(
                    sep=" ", timespec="microseconds"
                )
            except ValueError:
                return v
        return v

    @staticmethod
    def _collect_file_stats(
        data_dir: Path, stats_cols: tuple[str, ...]
    ) -> dict[str, dict[str, list]]:
        """{relative file: {col: [min, max]}} from parquet footers only."""
        import pyarrow.parquet as pq

        out: dict[str, dict[str, list]] = {}
        for f in sorted(data_dir.rglob("*.parquet")):
            md = pq.ParquetFile(f).metadata
            names = {md.schema.column(i).path: i for i in range(md.num_columns)}
            per_col: dict[str, list] = {}
            for col in stats_cols:
                idx = names.get(col)
                if idx is None:
                    continue
                los, his = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        los = []  # any stats-less row group poisons the file:
                        break  # without bounds the file can never be skipped
                    lo = ManifestParquetFormat._json_stat(st.min)
                    hi = ManifestParquetFormat._json_stat(st.max)
                    if lo is None or hi is None:
                        los = []  # non-orderable stat type: keep the file
                        break
                    los.append(lo)
                    his.append(hi)
                if los:
                    per_col[col] = [min(los), max(his)]
            out[str(f.relative_to(data_dir))] = per_col
        return out

    @staticmethod
    def _collect_file_rows(data_dir: Path) -> dict[str, int]:
        """{relative file: row count} from parquet footers only — the
        same one-footer-read-per-file cost class as the zone maps, paid
        once at write time so COUNT-style queries never need the data."""
        import pyarrow.parquet as pq

        return {
            str(f.relative_to(data_dir)): pq.ParquetFile(f).metadata.num_rows
            for f in sorted(data_dir.rglob("*.parquet"))
        }

    def stats_summary(
        self, path: Path, cols: tuple[str, ...] = (), version: int | None = None
    ) -> dict:
        """Aggregates served from the MANIFEST alone — no data scan:
        ``{"n_rows": total, col: [global_min, global_max], ...}``.

        This is the metadata-only fast path warehouses use for
        ``COUNT(*)`` / ``MIN`` / ``MAX``: at 100 TB it answers from KBs
        of manifest instead of the table. Strictly honest by
        construction — it REFUSES (raises) whenever the manifest can't
        prove the answer: merge-on-read delete vectors present (rows
        are masked at read time, so footer counts overstate), a
        pre-``file_rows`` manifest, or a requested column missing
        bounds for any file (stats-less row group / non-orderable
        type). MIN/MAX honesty also needs the no-deletes guard: a
        masked row may BE the extremum."""
        path = Path(path)
        v = version if version is not None else self.current_version(path)
        if v is None:
            raise FileNotFoundError(f"no committed snapshot at {path}")
        meta = self._snapshot_meta(path, v)
        if meta.get("delete_files"):
            raise ValueError(
                f"stats_summary refused: v{v} has delete vectors; counts "
                "and extrema require a scan (or compact_deletes first)"
            )
        file_rows = meta.get("file_rows")
        if file_rows is None:
            raise ValueError(
                f"stats_summary refused: v{v} predates file_rows manifests"
            )
        out: dict = {"n_rows": sum(file_rows.values())}
        stats = meta.get("file_stats", {})
        for col in cols:
            los, his = [], []
            for f, per_col in stats.items():
                if col not in per_col:
                    raise ValueError(
                        f"stats_summary refused: file {f} has no bounds "
                        f"for {col!r}"
                    )
                los.append(per_col[col][0])
                his.append(per_col[col][1])
            if not los or len(los) != len(file_rows):
                raise ValueError(
                    f"stats_summary refused: incomplete bounds for {col!r}"
                )
            out[col] = [min(los), max(his)]
        return out

    def prune_files(
        self, path: Path, col: str, lo, hi, version: int | None = None
    ) -> tuple[list[Path], int]:
        """(files whose [min,max] overlaps [lo, hi], total file count).

        Files without recorded bounds for ``col`` are conservatively
        KEPT — pruning must only ever drop files proven irrelevant."""
        path = Path(path)
        v = version if version is not None else self.current_version(path)
        if v is None:
            raise FileNotFoundError(f"no committed snapshot at {path}")
        meta = self._snapshot_meta(path, v)
        stats = meta.get("file_stats", {})
        data_dir = self._resolve_data_dir(path, meta)
        if not stats:
            files = sorted(data_dir.rglob("*.parquet"))
            return files, len(files)
        lo, hi = self._canon_bound(lo), self._canon_bound(hi)
        keep = [
            data_dir / f
            for f, per_col in sorted(stats.items())
            if col not in per_col
            or (per_col[col][0] <= hi and per_col[col][1] >= lo)
        ]
        return keep, len(stats)

    def read_pruned(
        self,
        spark: SparkSession,
        path: Path,
        col: str,
        lo,
        hi,
        version: int | None = None,
    ) -> DataFrame:
        """Scan only the files that can contain ``col IN [lo, hi]``.

        Returns a SUPERSET of the matching rows (file granularity) with
        the residual filter applied, so the result equals
        ``read().filter(col between lo and hi)`` — the zone-map contract.
        At 100 TB this is the difference between opening every file's
        footer and opening the manifest once: planning is O(files) driver
        metadata, the scan is O(matching files)."""
        from pyspark.sql import functions as F

        v = version if version is not None else self.current_version(path)
        files, _total = self.prune_files(path, col, lo, hi, v)
        if not files:
            empty = self.read(spark, path, version=v).limit(0)
            return empty.filter(F.col(col).between(lo, hi))
        df = spark.read.parquet(*[str(f) for f in files])
        meta = self._snapshot_meta(path, v)
        df = self._apply_delete_vectors(spark, path, meta, df)
        return df.filter(F.col(col).between(lo, hi))

    def read(
        self,
        spark: SparkSession,
        path: Path,
        version: int | None = None,
        branch: str | None = None,
    ) -> DataFrame:
        """Read the committed snapshot (or a historical ``version`` —
        time travel — or a named ``branch`` head). Uncommitted/orphan
        data dirs are invisible. Snapshots carrying delete vectors
        apply them merge-on-read: an anti-join of the (immutable) data
        files against the deleted keys — the Iceberg equality-delete
        read path."""
        path = Path(path)
        if branch is not None:
            if version is not None:
                raise ValueError("pass version OR branch, not both")
            bf = self._branch_file(path, branch)
            if not bf.exists():
                raise FileNotFoundError(f"no branch {branch!r} at {path}")
            version = int(bf.read_text().strip())
        v = version if version is not None else self.current_version(path)
        if v is None:
            raise FileNotFoundError(f"no committed snapshot at {path}")
        meta = self._snapshot_meta(path, v)
        df = spark.read.parquet(str(self._resolve_data_dir(path, meta)))
        return self._apply_delete_vectors(spark, path, meta, df)

    @staticmethod
    def _resolve_data_dir(path: Path, meta: dict) -> Path:
        """A snapshot's data dir: local (relative to the table) for
        normal snapshots, absolute for shallow clones (``clone``)."""
        ext = meta.get("external_data_dir")
        return Path(ext) if ext else Path(path) / meta["data_dir"]

    @staticmethod
    def _apply_delete_vectors(
        spark: SparkSession, path: Path, meta: dict, df: DataFrame
    ) -> DataFrame:
        delete_files = meta.get("delete_files", [])
        if not delete_files:
            return df
        from pyspark.sql import functions as F

        key = meta["delete_key"]
        dels = spark.read.parquet(
            *[str(path / f) for f in delete_files]
        ).select(F.col(key).alias("__del_key")).distinct()
        # deletes are a small fraction of the table — broadcast the
        # key set so the anti-join adds no shuffle to the scan
        return df.join(
            F.broadcast(dels), df[key] == dels["__del_key"], "left_anti"
        )

    # -- merge-on-read deletes (Iceberg-style equality deletes) ------------

    def delete_keys(
        self, spark: SparkSession, path: Path, keys: DataFrame, key_col: str
    ) -> int:
        """Commit a MERGE-ON-READ delete: the data files are untouched;
        a new snapshot references the same immutable data dir plus one
        more delete-vector file (a parquet of deleted key values).
        Write amplification is O(deleted keys), not O(table) — the
        copy-on-write alternative rewrites every affected file, which
        at 100 TB turns a 1000-row delete into a multi-TB job. Readers
        of the new version apply the vectors; readers of prior versions
        (time travel) see the undeleted rows. Returns the new version.

        Same session-wide caveat as :meth:`write`: the delete-vector
        parquet write pins ``spark.sql.parquet.outputTimestampType`` to
        TIMESTAMP_MICROS for its duration, affecting any concurrent
        parquet write on the same session (refcounted across manifest
        writers; documented for third-party writers)."""
        path = Path(path)
        cur = self.current_version(path)
        if cur is None:
            raise FileNotFoundError(f"no committed snapshot at {path}")
        meta = self._snapshot_meta(path, cur)
        if meta.get("delete_key") not in (None, key_col):
            raise ValueError(
                f"table {path} already has deletes keyed on "
                f"{meta['delete_key']!r}, not {key_col!r}"
            )
        version = cur + 1
        delete_file = f"deletes-{version:06d}"
        # The read path applies vectors with a plain-equality anti-join
        # (NULL == NULL is never true), so a NULL key could never delete
        # anything — reject it loudly instead of silently no-opping.
        from pyspark.sql import functions as F

        key_set = keys.select(key_col).distinct()
        if key_set.filter(F.col(key_col).isNull()).limit(1).count() > 0:
            raise ValueError(
                f"delete_keys: NULL in delete key column {key_col!r}; "
                "equality deletes cannot target NULL-keyed rows "
                "(read path uses non-null-safe equality) — filter NULLs "
                "out or delete by a non-nullable key"
            )
        with _stats_bearing_writes(key_set):
            key_set.write.mode("overwrite").parquet(str(path / delete_file))
        new_meta = {
            "version": version,
            "data_dir": meta["data_dir"],
            "partition_by": meta.get("partition_by", []),
            "delete_key": key_col,
            "delete_files": meta.get("delete_files", []) + [delete_file],
            "committed_at_unix": time.time(),
        }
        if meta.get("external_data_dir"):  # clones keep their source ref
            new_meta["external_data_dir"] = meta["external_data_dir"]
        (self._manifest_dir(path) / f"snap-{version:06d}.json").write_text(
            json.dumps(new_meta)
        )
        self._commit(path, version)
        return version

    # -- restore + shallow clone (Delta RESTORE / CREATE TABLE CLONE) ------

    def restore(self, path: Path, version: int) -> int:
        """Roll the table back to ``version`` AS A NEW COMMIT: the new
        snapshot re-references the old version's (immutable) data dir
        and delete vectors — nothing is rewritten or lost, and the
        mis-write being undone stays readable via time travel. Because
        the restored snapshot is now CURRENT, ``vacuum`` keeps the
        shared data dir alive even after the old snapshot json ages
        out. O(1) metadata, any table size."""
        path = Path(path)
        target = self._snapshot_meta(path, version)  # raises if absent
        cur = self.current_version(path)
        if cur is None:
            raise FileNotFoundError(f"no committed snapshot at {path}")
        new_v = cur + 1
        meta = {
            k: target[k]
            for k in (
                "data_dir",
                "partition_by",
                "delete_key",
                "delete_files",
                "external_data_dir",
                "file_stats",
                "file_rows",
            )
            if k in target
        }
        meta.update(
            {
                "version": new_v,
                "restored_from": version,
                "committed_at_unix": time.time(),
            }
        )
        (self._manifest_dir(path) / f"snap-{new_v:06d}.json").write_text(
            json.dumps(meta)
        )
        self._commit(path, new_v)
        return new_v

    def clone(
        self, src: Path, dst: Path, version: int | None = None
    ) -> int:
        """SHALLOW clone: a new table whose first snapshot references
        the source snapshot's data files in place (absolute path) —
        zero data copied, O(1) metadata, the CREATE TABLE ... CLONE
        shape. The clone then evolves independently: its own deletes,
        overwrites and branches land under ``dst`` and never touch the
        source; new source commits never move the clone (it pins the
        cloned version).

        Refused when the source snapshot carries delete vectors —
        compact them first (``compact_deletes``) so the clone's
        lineage starts from plain immutable files. KNOWN LIMITATION
        (same as Delta shallow clones): vacuuming the SOURCE can
        reclaim data files the clone still references; production
        would track external references in the source catalog —
        documented rather than half-solved here."""
        src, dst = Path(src), Path(dst)
        v = version if version is not None else self.current_version(src)
        if v is None:
            raise FileNotFoundError(f"no committed snapshot at {src}")
        if self.current_version(dst) is not None:
            raise FileExistsError(f"clone target {dst} already exists")
        smeta = self._snapshot_meta(src, v)
        if smeta.get("delete_files"):
            raise ValueError(
                "clone refused: source snapshot has delete vectors; "
                "run compact_deletes first"
            )
        mdir = self._manifest_dir(dst)
        mdir.mkdir(parents=True, exist_ok=True)
        meta = {
            "version": 1,
            "data_dir": smeta["data_dir"],
            "external_data_dir": str(
                (src / smeta["data_dir"]).resolve()
            ),
            "partition_by": smeta.get("partition_by", []),
            "cloned_from": {"path": str(src), "version": v},
            "committed_at_unix": time.time(),
        }
        for k in ("file_stats", "file_rows"):
            if k in smeta:
                meta[k] = smeta[k]
        (mdir / "snap-000001.json").write_text(json.dumps(meta))
        self._commit(dst, 1)
        return 1

    # -- branches (named pointers; the Iceberg branch/tag shape) -----------

    def _branch_file(self, path: Path, branch: str) -> Path:
        # no dots: a crashed tmp file or a dotted name must never be
        # confusable with (or clobber) another branch's pointer
        if not branch or not all(c.isalnum() or c in "-_" for c in branch):
            raise ValueError(f"invalid branch name {branch!r}")
        return self._manifest_dir(path) / f"BRANCH-{branch}"

    def branches(self, path: Path) -> dict[str, int]:
        """{branch name: version} for every named pointer."""
        mdir = self._manifest_dir(Path(path))
        if not mdir.exists():
            return {}
        return {
            p.name[len("BRANCH-"):]: int(p.read_text().strip())
            for p in sorted(mdir.glob("BRANCH-*"))
        }

    def write_branch(
        self,
        df: DataFrame,
        path: Path,
        branch: str,
        partition_by: tuple[str, ...] = (),
        stats_cols: tuple[str, ...] = (),
    ) -> int:
        """Land a snapshot on a NAMED branch: staged data + an atomic
        branch-pointer swap. Main readers (CURRENT) never see it; branch
        readers (``read(branch=...)``) see the branch head. The audit/
        experimentation line WAP generalizes to: many live branches,
        each a chain of real snapshots, published by fast-forward."""
        path = Path(path)
        version = self.stage(df, path, partition_by, stats_cols)
        bf = self._branch_file(path, branch)
        # leading dot keeps a crashed tmp OUT of the BRANCH-* namespace:
        # branches() can never report it, vacuum can never pin it
        tmp = bf.with_name(f".tmp-{bf.name}.{version}")
        tmp.write_text(str(version))
        os.replace(tmp, bf)  # atomic branch-head swap
        return version

    def publish_branch(self, path: Path, branch: str) -> int:
        """Fast-forward CURRENT to the branch head (atomic pointer
        swap; refuses if the branch is behind — not a fast-forward)."""
        path = Path(path)
        bf = self._branch_file(path, branch)
        if not bf.exists():
            raise FileNotFoundError(f"no branch {branch!r} at {path}")
        version = int(bf.read_text().strip())
        self.commit_staged(path, version)
        return version

    def drop_branch(self, path: Path, branch: str) -> None:
        """Remove the pointer; its unpublished snapshots become orphans
        for vacuum (which never deletes a branch-referenced version)."""
        bf = self._branch_file(Path(path), branch)
        if bf.exists():
            bf.unlink()

    def compact_deletes(self, spark: SparkSession, path: Path) -> int:
        """Fold accumulated delete vectors into a rewritten data dir
        (the copy-on-write step, run when vectors grow past the point
        where the read-side anti-join is worth its broadcast): reads
        the current merge-on-read view, lands it as a fresh snapshot
        with no delete files. Old versions stay time-travel readable.
        Returns the new version."""
        path = Path(path)
        cur = self.current_version(path)
        if cur is None:
            raise FileNotFoundError(f"no committed snapshot at {path}")
        meta = self._snapshot_meta(path, cur)
        if not meta.get("delete_files"):
            return cur
        self.write(
            self.read(spark, path),
            path,
            partition_by=tuple(meta.get("partition_by", [])),
        )
        return self.current_version(path)

    def replace(self, staging: Path, final: Path) -> None:
        """Adopt ``staging``'s current snapshot as ``final``'s next
        version. The data dir moves (rename — no copy), the metadata is
        rewritten under final's version counter, and the pointer swap
        is the only commit; a crash before it leaves ``final`` exactly
        as it was."""
        staging, final = Path(staging), Path(final)
        sv = self.current_version(staging)
        if sv is None:
            raise FileNotFoundError(f"staging table {staging} has no commit")
        smeta = self._snapshot_meta(staging, sv)
        version = (self.current_version(final) or 0) + 1
        mdir = self._manifest_dir(final)
        mdir.mkdir(parents=True, exist_ok=True)
        data_dir = final / f"data-{version:06d}"
        os.replace(staging / smeta["data_dir"], data_dir)
        # merge-on-read delete vectors travel WITH the snapshot: dropping
        # them here would silently resurrect every deleted row (and the
        # trailing staging cleanup would destroy the vectors for good)
        moved_deletes: list[str] = []
        for i, df_name in enumerate(smeta.get("delete_files", [])):
            dest = final / f"deletes-{version:06d}-{i:03d}"
            os.replace(staging / df_name, dest)
            moved_deletes.append(dest.name)
        meta: dict = {
            "version": version,
            "data_dir": data_dir.name,
            "partition_by": smeta.get("partition_by", []),
            "committed_at_unix": time.time(),
        }
        if moved_deletes:
            meta["delete_key"] = smeta["delete_key"]
            meta["delete_files"] = moved_deletes
        (mdir / f"snap-{version:06d}.json").write_text(json.dumps(meta))
        self._commit(final, version)
        shutil.rmtree(staging, ignore_errors=True)

    # -- maintenance -------------------------------------------------------

    def vacuum(
        self, path: Path, keep_last: int = 1, stage_grace_s: float = 0.0
    ) -> list[str]:
        """Delete orphan data dirs (crashed, never-committed writes) and
        snapshots older than the ``keep_last`` most recent committed
        ones. Returns the deleted dir names. Never touches the current
        snapshot or a live branch head.

        ``stage_grace_s`` protects IN-FLIGHT stages: an uncommitted
        snapshot staged less than this many seconds ago is kept, so a
        maintenance vacuum running concurrently with a WAP audit
        (engine/wap.py: stage → test → commit) cannot delete the very
        files the audit is scanning. 0 (the default) reclaims every
        uncommitted stage immediately — right for single-writer use;
        schedule vacuums with a grace ≥ your longest audit otherwise."""
        import time as _time

        path = Path(path)
        cur = self.current_version(path)
        if cur is None:
            return []
        keep_versions = set(
            v for v in self.versions(path) if v <= cur
        )
        keep_versions = set(sorted(keep_versions)[-keep_last:]) | {cur}
        # live branch heads are referenced even though uncommitted
        keep_versions |= set(self.branches(path).values())
        if stage_grace_s > 0:
            now = _time.time()
            for j in self._manifest_dir(path).glob("snap-*.json"):
                v = int(j.stem.split("-")[1])
                if v in keep_versions:
                    continue
                try:
                    staged_at = json.loads(j.read_text()).get(
                        "committed_at_unix", 0
                    )
                except (OSError, ValueError):
                    continue
                if now - staged_at < stage_grace_s:
                    keep_versions.add(v)
        referenced: set[str] = set()
        for v in keep_versions:
            meta = self._snapshot_meta(path, v)
            referenced.add(meta["data_dir"])
            referenced.update(meta.get("delete_files", []))
        deleted: list[str] = []
        for d in sorted([*path.glob("data-*"), *path.glob("deletes-*")]):
            if d.name not in referenced:
                shutil.rmtree(d)
                deleted.append(d.name)
        for j in sorted(self._manifest_dir(path).glob("snap-*.json")):
            if int(j.stem.split("-")[1]) not in keep_versions:
                j.unlink()
        return deleted
