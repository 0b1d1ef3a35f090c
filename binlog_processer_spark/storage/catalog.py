"""Warehouse catalog — one atomic pointer over MANY snapshot tables.

Each ``SnapshotTable`` commit is atomic per table, but a pipeline run
commits several tables (routed + its rollups): a reader arriving between
the routed commit and the sink_counts commit sees new data with stale
counts. The reference has the same exposure between its Avro landing and
t_binlog_process_log bookkeeping writes (PartitionWriterManager.java vs
DataBaseHandler.java) and simply tolerates it; Iceberg solves it at the
catalog layer (a REST/Hive catalog swaps N table pointers in one
transaction). Same contract here, one level up from the table:

- a catalog VERSION is a JSON file pinning ``{table_name: snapshot}``;
- ``commit`` writes the version file then atomically flips ``_current`` —
  the same temp→rename promotion ``SnapshotTable`` uses, so readers see
  either the old set or the new set, never a mix;
- ``read`` serves a table AT THE PINNED SNAPSHOT, ignoring later table
  commits until the catalog advances — cross-table consistency costs one
  JSON read at plan time, nothing at scan time;
- ``rollback`` re-points the whole warehouse (every table together) to a
  prior version — the multi-table form of ``SnapshotTable.rollback``.

Table snapshots pinned by ANY retained catalog version should be kept
when expiring table history; ``pinned_snapshots`` reports the set so a
vacuum job can pass the floor to ``expire_snapshots``.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession

from . import fs as fsmod
from .table import SnapshotTable


class Catalog:
    def __init__(self, root: str):
        self.root = root
        self._dir = fsmod.join(root, "_catalog")
        self._fsimpl: fsmod.FS | None = None

    @property
    def _fs(self) -> fsmod.FS:
        if self._fsimpl is None:
            self._fsimpl = fsmod.fs_for(self.root)
        return self._fsimpl

    def _current_path(self) -> str:
        return fsmod.join(self._dir, "_current")

    def current_version(self) -> int | None:
        try:
            return json.loads(self._fs.read_text(self._current_path()))[
                "version"
            ]
        except FileNotFoundError:
            return None

    def _version_doc(self, v: int) -> dict:
        return json.loads(
            self._fs.read_text(fsmod.join(self._dir, f"v-{v}.json"))
        )

    def table(self, name: str) -> SnapshotTable:
        return SnapshotTable(fsmod.join(self.root, name))

    def pins(self, version: int | None = None) -> dict[str, int]:
        """{table_name: snapshot} of the given (default current) version.
        Empty when the warehouse has no catalog commit yet."""
        v = self.current_version() if version is None else version
        if v is None:
            return {}
        return self._version_doc(v)["pins"]

    _UNCHECKED = object()

    def _existing_version_ids(self) -> list[int]:
        out = []
        for p in self._fs.list_files(self._dir, ".json"):
            name = p.rsplit("/", 1)[-1]
            if name.startswith("v-"):
                try:
                    out.append(int(name[2:-5]))
                except ValueError:
                    continue
        return out

    def commit(
        self,
        pins: dict[str, int],
        note: str = "",
        expected_version=_UNCHECKED,
    ) -> int:
        """Atomically publish a consistent set of table snapshots. Every
        pinned snapshot must exist (manifest check — catches committing a
        snapshot id that a failed write never produced). Unlisted tables
        are simply not governed by this version.

        ``expected_version``: optimistic CAS — raise CommitConflict if the
        catalog no longer points at the version this writer read its pins
        from (read-modify-write callers like ``advance_pin`` MUST pass it,
        or a concurrent commit's pins are silently reverted).

        Version ids are minted past every existing version FILE, not just
        ``current + 1`` — after a rollback the rolled-past versions still
        exist (their pins still guard expiry) and must not be clobbered."""
        for name, snap in pins.items():
            self.table(name)._manifest(snap)  # raises if absent
        self._fs.mkdirs(self._dir)
        from .table import CommitConflict, SnapshotTable

        try:
            with fsmod.commit_lock(
                self._fs,
                fsmod.join(self._dir, "_commit.lock"),
                SnapshotTable._LOCK_TTL_S,
            ):
                parent = self.current_version()
                if (
                    expected_version is not self._UNCHECKED
                    and parent != expected_version
                ):
                    raise CommitConflict(
                        f"concurrent catalog commit on {self.root}: built "
                        f"on version {expected_version} but the catalog "
                        f"now points at {parent}; re-read and retry"
                    )
                v = (parent + 1) if parent is not None else 0
                ids = self._existing_version_ids()
                if ids:
                    v = max(v, max(ids) + 1)
                doc = {
                    "version": v,
                    "parent": parent,
                    "created_ms": int(time.time() * 1000),
                    "pins": dict(sorted(pins.items())),
                    "note": note,
                }
                self._fs.write_text_atomic(
                    fsmod.join(self._dir, f"v-{v}.json"),
                    json.dumps(doc, indent=1),
                )
                self._fs.write_text_atomic(
                    self._current_path(), json.dumps({"version": v})
                )
        except fsmod.LockHeld:
            raise CommitConflict(
                f"catalog commit lock on {self.root} is held by another "
                "writer; retry"
            ) from None
        return v

    def read(
        self,
        spark: SparkSession,
        name: str,
        version: int | None = None,
    ) -> DataFrame:
        """Scan ``name`` at the snapshot the catalog version pins — later
        table-level commits are invisible until the catalog advances."""
        pins = self.pins(version)
        if name not in pins:
            raise KeyError(
                f"table {name!r} not pinned by catalog version "
                f"{version if version is not None else self.current_version()}"
            )
        return self.table(name).read(spark, pins[name])

    def rollback(self, version: int) -> None:
        self._version_doc(version)  # existence check
        self._fs.write_text_atomic(
            self._current_path(), json.dumps({"version": version})
        )

    def history(self) -> list[dict]:
        """Current version's lineage, newest first (same walk contract as
        ``SnapshotTable.history``)."""
        out, v = [], self.current_version()
        while v is not None:
            try:
                doc = self._version_doc(v)
            except FileNotFoundError:
                break
            out.append(doc)
            v = doc["parent"]
        return out

    def pinned_snapshots(self, name: str) -> set[int]:
        """Every snapshot of ``name`` pinned by any retained catalog
        version — the keep-floor for table-level ``expire_snapshots``."""
        return {
            doc["pins"][name]
            for doc in self.history()
            if name in doc["pins"]
        }

    def expire_versions(self, keep_last: int = 2) -> dict:
        """Drop catalog versions older than the last ``keep_last`` of the
        current lineage (plus rollback orphans) — the catalog-level
        ``expire_snapshots``. Run BEFORE expiring table history so
        ``pinned_snapshots`` reflects only versions that can still be
        read."""
        if keep_last < 1:
            raise ValueError("expire_versions: keep_last must be >= 1")
        current = self.current_version()
        if current is None:
            return {"kept": [], "versions_removed": []}
        kept = {doc["version"] for doc in self.history()[:keep_last]}
        removed = []
        for p in self._fs.list_files(self._dir, ".json"):
            name = p.rsplit("/", 1)[-1]
            if not name.startswith("v-"):
                continue
            v = int(name[2:-5])
            if v in kept:
                continue
            self._fs.delete_file(p)
            removed.append(v)
        return {"kept": sorted(kept), "versions_removed": sorted(removed)}


def advance_pin(
    warehouse_root: str,
    table: str,
    new_snapshot: int,
    note: str = "compact",
    max_retries: int = 3,
) -> int | None:
    """After a maintenance rewrite of one table, advance the warehouse
    catalog (if one exists and governs the table) so catalog readers see
    the rewritten snapshot as part of a consistent set. No-op (returns
    None) when the warehouse has no catalog, the table is unpinned, or
    the pin already matches.

    Read-modify-write under CAS: the pins are re-read and the single-pin
    update retried if another commit (e.g. a concurrent pipeline run)
    landed between the read and the commit — without this, the wholesale
    re-commit would silently revert the other writer's pins."""
    from .table import CommitConflict

    cat = Catalog(warehouse_root)
    for _ in range(max_retries):
        v = cat.current_version()
        if v is None:
            return None
        pins = cat.pins(v)
        if table not in pins or pins[table] == new_snapshot:
            return None
        try:
            return cat.commit(
                {**pins, table: new_snapshot}, note=note, expected_version=v
            )
        except CommitConflict:
            continue  # catalog moved: re-read pins and re-apply
    raise CommitConflict(
        f"advance_pin on {warehouse_root}/{table} lost the catalog race "
        f"{max_retries} times; retry"
    )
