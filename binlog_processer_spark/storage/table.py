"""Snapshot-committed table storage — the Iceberg stand-in.

Design target is an Iceberg catalog (`df.writeTo(tbl).append()`, snapshot
rollback, MERGE INTO); this environment ships no Iceberg runtime jar, so the
same contract is implemented on partitioned Parquet + JSON manifests:

- every write lands in a fresh immutable snapshot directory
  ``<table>/snap-<n>/`` (no file is ever mutated);
- a snapshot manifest records the data location + lineage of its parents;
- ``_current`` is flipped by an atomic rename — the temp→rename commit the
  reference does per Avro file (PartitionWriterManager.java:98-116,
  HdfsStorage.java:40-51), promoted to table level;
- readers resolve ``_current`` then read only that snapshot's data —
  uncommitted writes are invisible (snapshot isolation);
- ``rollback(n)`` re-points ``_current`` — the resume story's safety net.

``append`` mode creates a snapshot whose manifest unions the parent's data
dirs; ``overwrite`` replaces them. Partition pruning still works: data dirs
use Hive-style ``k=v`` layout and readers pass ``basePath`` so Spark prunes
on partition filters.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest plumbing ---------------------------------------------------
    def _current_path(self) -> str:
        return os.path.join(self.root, "_current")

    def current_snapshot(self) -> int | None:
        try:
            with open(self._current_path()) as f:
                return json.load(f)["snapshot"]
        except FileNotFoundError:
            return None

    def _manifest(self, snap: int) -> dict:
        with open(os.path.join(self.root, f"snap-{snap}", "manifest.json")) as f:
            return json.load(f)

    def _commit(self, snap: int) -> None:
        tmp = self._current_path() + f".tmp-{snap}"
        with open(tmp, "w") as f:
            json.dump({"snapshot": snap}, f)
        os.replace(tmp, self._current_path())

    # -- write ---------------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        mode: str = "overwrite",
        properties: dict | None = None,
        file_format: str = "parquet",
    ) -> int:
        """``file_format``: 'parquet' (default) or 'orc' — the ORC path is the
        Hive-side S9 analogue (HiveCompareByFile.java reads ORC tables); a
        table keeps one format for its whole lineage."""
        parent = self.current_snapshot()
        snap = (parent + 1) if parent is not None else 0
        snap_dir = os.path.join(self.root, f"snap-{snap}")
        data_dir = os.path.join(snap_dir, "data")
        excluded: list[str] = []
        if parent is not None:
            pm = self._manifest(parent)
            pfmt = pm.get("format", "parquet")
            if pfmt != file_format and mode == "append":
                raise ValueError(
                    f"cannot append {file_format} to a {pfmt} table"
                )
            if mode == "append":
                # appends must not fork the table's schema: Spark silently
                # NULL-fills missing parquet columns on read, so a mixed
                # table reads back wrong instead of failing. Schema changes
                # require an explicit overwrite (migration rewrites data).
                parent_schema = StructType.fromJson(json.loads(pm["schema"]))
                # names + types only, order-insensitive: nullability varies
                # with how a DataFrame was derived (parquet re-reads are
                # all-nullable) and partitioned re-reads move the partition
                # columns last — neither is a read-back hazard (reads apply
                # the manifest schema by name)
                def _shape(s: StructType) -> list:
                    return sorted((f.name, f.dataType) for f in s.fields)

                if _shape(df.schema) != _shape(parent_schema):
                    raise ValueError(
                        "append schema mismatch vs committed table schema "
                        f"in {self.root}: appending {df.schema.simpleString()} "
                        f"to {parent_schema.simpleString()}; overwrite (with "
                        "a migration) to change a table's schema"
                    )
                excluded = pm.get("excluded_files", [])
        w = df.write.mode("errorifexists")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.format(file_format).save(data_dir)

        data_dirs = [os.path.relpath(data_dir, self.root)]
        if mode == "append" and parent is not None:
            data_dirs = self._manifest(parent)["data_dirs"] + data_dirs
        manifest = {
            "snapshot": snap,
            "parent": parent,
            "mode": mode,
            "created_ms": int(time.time() * 1000),
            "partition_by": partition_by or [],
            "data_dirs": data_dirs,
            "format": file_format,
            "excluded_files": excluded,
            # schema travels in metadata (Iceberg-style): readers never pay
            # inference, and empty snapshots stay readable
            "schema": df.schema.json(),
            "properties": properties or {},
        }
        with open(os.path.join(snap_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        self._commit(snap)
        return snap

    def exclude_files(self, files: list[str]) -> int:
        """Metadata-only snapshot that drops the given data files from the
        table (paths absolute or root-relative) — the structural-quarantine
        commit for corrupt output files (ListCorruptAvroFile.java:34-44:
        unreadable Avro files are moved aside so the table stays readable).
        No data is touched; the parent snapshot still serves the old view."""
        parent = self.current_snapshot()
        if parent is None:
            raise FileNotFoundError(f"no committed snapshot in {self.root}")
        m = self._manifest(parent)
        rel = {
            os.path.relpath(p, self.root) if os.path.isabs(p) else p
            for p in files
        }
        snap = parent + 1
        snap_dir = os.path.join(self.root, f"snap-{snap}")
        os.makedirs(snap_dir, exist_ok=True)
        manifest = {
            **m,
            "snapshot": snap,
            "parent": parent,
            "mode": "exclude",
            "created_ms": int(time.time() * 1000),
            "excluded_files": sorted(set(m.get("excluded_files", [])) | rel),
        }
        with open(os.path.join(snap_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        self._commit(snap)
        return snap

    def data_files(self, snapshot: int | None = None) -> list[str]:
        """Absolute paths of the data files the given (default current)
        snapshot reads, exclusions applied."""
        snap = self.current_snapshot() if snapshot is None else snapshot
        if snap is None:
            return []
        m = self._manifest(snap)
        ext = "." + ("orc" if m.get("format", "parquet") == "orc" else "parquet")
        excluded = set(m.get("excluded_files", []))
        out = []
        for d in m["data_dirs"]:
            base = os.path.join(self.root, d)
            for dirpath, _, files in os.walk(base):
                for f in files:
                    if f.endswith(ext):
                        p = os.path.join(dirpath, f)
                        if os.path.relpath(p, self.root) not in excluded:
                            out.append(p)
        return sorted(out)

    # -- read ----------------------------------------------------------------
    def read(self, spark: SparkSession, snapshot: int | None = None) -> DataFrame:
        snap = self.current_snapshot() if snapshot is None else snapshot
        if snap is None:
            raise FileNotFoundError(f"no committed snapshot in {self.root}")
        m = self._manifest(snap)
        fmt = m.get("format", "parquet")
        ext = "." + ("orc" if fmt == "orc" else "parquet")
        excluded = set(m.get("excluded_files", []))
        schema = StructType.fromJson(json.loads(m["schema"]))

        def _files_under(p: str) -> list[str]:
            out = []
            for dirpath, _, files in os.walk(p):
                for f in files:
                    if f.endswith(ext):
                        fp = os.path.join(dirpath, f)
                        if os.path.relpath(fp, self.root) not in excluded:
                            out.append(fp)
            return out

        def _scan(p: str, explicit: list[str] | None = None) -> DataFrame:
            r = spark.read.schema(schema).option("basePath", p).format(fmt)
            return r.load(explicit if explicit is not None else p)

        paths = [os.path.join(self.root, d) for d in m["data_dirs"]]
        branches = []
        for p in paths:
            files = _files_under(p)
            if not files:
                continue
            # with exclusions the scan must list files explicitly (partition
            # values still resolve from each file's dir via basePath)
            branches.append(_scan(p, files if excluded else None))
        if not branches:
            return spark.createDataFrame([], schema)
        out = branches[0]
        for d in branches[1:]:
            out = out.unionByName(d)
        return out

    def rollback(self, snapshot: int) -> None:
        self._manifest(snapshot)  # existence check
        self._commit(snapshot)

    def history(self) -> list[dict]:
        out, snap = [], self.current_snapshot()
        while snap is not None:
            m = self._manifest(snap)
            out.append(m)
            snap = m["parent"]
        return out
