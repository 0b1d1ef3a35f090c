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
    ) -> int:
        parent = self.current_snapshot()
        snap = (parent + 1) if parent is not None else 0
        snap_dir = os.path.join(self.root, f"snap-{snap}")
        data_dir = os.path.join(snap_dir, "data")
        w = df.write.mode("errorifexists")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data_dir)

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
            # schema travels in metadata (Iceberg-style): readers never pay
            # inference, and empty snapshots stay readable
            "schema": df.schema.json(),
            "properties": properties or {},
        }
        with open(os.path.join(snap_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        self._commit(snap)
        return snap

    # -- read ----------------------------------------------------------------
    def read(self, spark: SparkSession, snapshot: int | None = None) -> DataFrame:
        snap = self.current_snapshot() if snapshot is None else snapshot
        if snap is None:
            raise FileNotFoundError(f"no committed snapshot in {self.root}")
        m = self._manifest(snap)
        paths = [os.path.join(self.root, d) for d in m["data_dirs"]]
        schema = StructType.fromJson(json.loads(m["schema"]))

        def _has_data(p: str) -> bool:
            for _, _, files in os.walk(p):
                if any(f.endswith(".parquet") for f in files):
                    return True
            return False

        paths = [p for p in paths if _has_data(p)]
        if not paths:
            return spark.createDataFrame([], schema)
        if m["partition_by"]:
            # each snapshot dir is its own partition-discovery root; the union
            # still pushes partition filters into every branch's scan
            out = None
            for p in paths:
                d = spark.read.schema(schema).option("basePath", p).parquet(p)
                out = d if out is None else out.unionByName(d)
            return out
        return spark.read.schema(schema).parquet(*paths)

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
