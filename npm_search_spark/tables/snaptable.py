"""SnapTable — a minimal snapshot-versioned table format on parquet.

Stands in for Iceberg (no Iceberg runtime jar in this environment) with the
same semantics the engine needs, per the north rule: atomic snapshot
commits, snapshot-id time travel, append / overwrite / merge-upsert /
delete, and per-snapshot metadata carrying crawl lineage + metrics
(generation, per-partition counts).

Layout on disk::

    <root>/
      data/<uuid>/part-*.parquet     immutable data files (write-once)
      manifests/<snapshot_id>.json   file list + parent + operation + meta
      _current                       atomic pointer (os.replace) to manifest

A snapshot's manifest lists the parquet files visible in that snapshot, so
*append* is O(new data): it writes only new files and a manifest whose file
list is parent_files + new_files. *overwrite*/*merge* write a full new file
set. Readers load `spark.read.parquet(*files)` — pushdown/pruning work as
usual because these are plain parquet files.

Concurrency model: single-writer (the crawl driver), many readers — the
same model the reference uses for its Algolia state (one process owns the
index, src/StateManager.ts:45-69). Commit = write manifest + os.replace of
the _current pointer, so a crashed writer never leaves a half-visible
snapshot and resume always sees the last complete snapshot (exactly-once
resume, SURVEY.md §7 hard-part 4).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    operation: str
    files: list[str]
    meta: dict[str, Any]
    timestamp_ms: int


class SnapTable:
    def __init__(self, root: str, schema: T.StructType | None = None):
        self.root = root
        self.schema = schema
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)

    # -- snapshot plumbing --------------------------------------------------

    def _current_path(self) -> str:
        return os.path.join(self.root, "_current")

    def current_snapshot_id(self) -> int | None:
        try:
            with open(self._current_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def snapshot(self, snapshot_id: int | None = None) -> Snapshot | None:
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id()
        if sid is None:
            return None
        with open(os.path.join(self.root, "manifests", f"{sid}.json")) as f:
            d = json.load(f)
        return Snapshot(**d)

    def history(self) -> list[Snapshot]:
        out: list[Snapshot] = []
        snap = self.snapshot()
        while snap is not None:
            out.append(snap)
            snap = self.snapshot(snap.parent_id) if snap.parent_id is not None else None
        return list(reversed(out))

    def _commit(self, operation: str, files: list[str], meta: dict[str, Any]) -> int:
        parent = self.current_snapshot_id()
        sid = (parent or 0) + 1
        manifest = Snapshot(
            snapshot_id=sid,
            parent_id=parent,
            operation=operation,
            files=files,
            meta=meta,
            timestamp_ms=int(time.time() * 1000),
        )
        mpath = os.path.join(self.root, "manifests", f"{sid}.json")
        with open(mpath, "w") as f:
            json.dump(manifest.__dict__, f)
        tmp = self._current_path() + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(sid))
        os.replace(tmp, self._current_path())  # atomic commit point
        return sid

    def _write_files(self, df: DataFrame) -> list[str]:
        d = os.path.join(self.root, "data", uuid.uuid4().hex)
        df.write.mode("errorifexists").parquet(d)
        return sorted(
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    # -- reads ---------------------------------------------------------------

    def exists(self) -> bool:
        return self.current_snapshot_id() is not None

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        snap = self.snapshot(snapshot_id)
        if snap is None or not snap.files:
            if self.schema is None:
                raise ValueError(f"empty table {self.root} and no schema given")
            return spark.createDataFrame([], self.schema)
        return spark.read.parquet(*snap.files)

    # -- writes --------------------------------------------------------------

    def append(self, df: DataFrame, meta: dict[str, Any] | None = None) -> int:
        new_files = self._write_files(df)
        parent = self.snapshot()
        files = (parent.files if parent else []) + new_files
        return self._commit("append", files, meta or {})

    def overwrite(self, df: DataFrame, meta: dict[str, Any] | None = None) -> int:
        files = self._write_files(df)
        return self._commit("overwrite", files, meta or {})

    def merge_upsert(
        self,
        spark: SparkSession,
        source: DataFrame,
        key: str | list[str],
        guard: str | None = None,
        meta: dict[str, Any] | None = None,
    ) -> int:
        """MERGE INTO semantics: upsert ``source`` rows into the table by
        ``key``; a matched target row is replaced only when ``guard`` (a SQL
        predicate over ``src``/``tgt`` aliases) holds — the optimistic-
        concurrency analogue of Algolia's ``IncrementFrom`` partial update
        (reference src/indexers/MainWatchIndexer.ts:36-45).

        Copy-on-write at file granularity (Iceberg-style): only data files
        containing a matching key are rewritten; every other file is
        carried into the new snapshot untouched, so merge cost is
        O(affected files + batch), not O(table) — the property that keeps
        per-generation MERGEs viable on a 10^10-row packages table.
        """
        keys = [key] if isinstance(key, str) else list(key)
        snap = self.snapshot()
        if snap is None or not snap.files:
            return self.overwrite(source, meta=meta)

        from urllib.parse import unquote, urlparse

        src_keys = source.select(*keys).dropDuplicates()
        from pyspark.sql import functions as F

        affected_rows = (
            spark.read.parquet(*snap.files)
            .withColumn("_f", F.input_file_name())
            .join(F.broadcast(src_keys), on=keys, how="left_semi")
            .select("_f")
            .distinct()
            .collect()
        )
        affected = {unquote(urlparse(r["_f"]).path) for r in affected_rows}
        untouched = [f for f in snap.files if f not in affected]
        affected_files = [f for f in snap.files if f in affected]

        if not affected_files:
            new_files = self._write_files(source)
            return self._commit("merge", untouched + new_files, meta or {})

        tgt = spark.read.parquet(*affected_files).alias("tgt")
        src = source.alias("src")
        cond = " AND ".join(f"tgt.{k} <=> src.{k}" for k in keys)
        keep_pred = f"NOT ({guard})" if guard else "false"
        # target rows that survive: no source match, or guard says keep
        kept = (
            tgt.join(src, on=[F_expr(cond)], how="left")
            .where(f"src.{keys[0]} IS NULL OR ({keep_pred})")
            .select("tgt.*")
        )
        # source rows that land: all, unless a kept target row shadows them
        if guard:
            landing = (
                src.join(tgt, on=[F_expr(cond)], how="left")
                .where(f"tgt.{keys[0]} IS NULL OR ({guard})")
                .select("src.*")
            )
        else:
            landing = source
        merged = kept.unionByName(landing)
        new_files = self._write_files(merged)
        return self._commit("merge", untouched + new_files, meta or {})

    def rollback(self, snapshot_id: int | None) -> int | None:
        """Make ``snapshot_id`` (or the empty table when None) the visible
        state again via a new commit whose file list is that snapshot's —
        used by checkpoint resume to discard a half-applied generation."""
        if snapshot_id == self.current_snapshot_id():
            return snapshot_id
        files = [] if snapshot_id is None else self.snapshot(snapshot_id).files
        return self._commit("rollback", files, {"to": snapshot_id})

    def delete_where(
        self, spark: SparkSession, predicate: str, meta: dict[str, Any] | None = None
    ) -> int:
        df = self.read(spark).where(f"NOT ({predicate})")
        return self.overwrite(df, meta=meta)


def F_expr(s: str):
    from pyspark.sql import functions as F

    return F.expr(s)
