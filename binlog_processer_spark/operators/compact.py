"""Small-file compaction for snapshot tables (bin-packing rewrite).

The reference's sink writes one Avro file per (partition, binlog file)
(PartitionWriterManager.java:60-96), so a day of minute-grained binlogs
leaves thousands of tiny files per partition — the classic CDC-sink
pathology. The reference never solves it (its Hive jobs just eat the
listing cost); at 100 TB it is THE read-amplification killer, and our own
repair path refuses to run on such tables (structural._bounded_collect
says "compact small files first"). This is that compactor.

Spark-first restatement of Iceberg's ``rewriteDataFiles`` action:

1. Plan from METADATA only — group the manifest's file inventory by logical
   Hive partition (files from different append/rewrite snapshots of the
   same ``k=v`` path are one group) and pick groups whose file count can
   shrink: ``ceil(bytes/target) < n_files``. Sizes come from the manifest's
   commit-time record (``file_bytes``); no data file is opened or statted.
2. Read ONLY the affected files (``read_files`` plans a scan over exactly
   that subset), cluster with a REBALANCE hint on the partition columns —
   AQE both coalesces small shuffle partitions and splits skewed ones at
   ``spark.sql.adaptive.advisoryPartitionSizeInBytes``, so output files
   land near the target size without a row-count heuristic.
3. Commit via ``rewrite_files``: untouched files are carried by reference
   (never read, moved, or copied), readers see the old snapshot until the
   atomic pointer flip, and rollback undoes a bad compaction.

Cost scales with the bytes being compacted, never with table size.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from ..storage.table import SnapshotTable

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # one HDFS block / Iceberg default


@dataclass
class CompactionGroup:
    """One logical partition's mergeable files."""

    partition: str  # 'k=v/k2=v2' path, '' for an unpartitioned table
    files: list[str]  # root-relative
    bytes: int
    target_files: int  # ceil(bytes/target) — what the group shrinks to


@dataclass
class CompactionResult:
    snapshot: int
    groups: list[CompactionGroup] = field(default_factory=list)

    @property
    def files_removed(self) -> int:
        return sum(len(g.files) for g in self.groups)


def _partition_of(rel: str, data_dirs: list[str]) -> str:
    """Logical partition of a data file: its directory path relative to the
    snapshot data dir that contains it ('' when unpartitioned). Distinct
    snapshots' dirs collapse onto one key — exactly the fragmentation an
    append-per-run sink accumulates."""
    d = next(
        (d for d in sorted(data_dirs, key=len, reverse=True)
         if rel.startswith(d + "/")),
        None,
    )
    if d is None:
        raise ValueError(f"{rel} not under any data_dir")
    sub = rel[len(d) + 1:]
    return sub.rsplit("/", 1)[0] if "/" in sub else ""


def compaction_plan(
    table: SnapshotTable,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    min_files: int = 2,
) -> list[CompactionGroup]:
    """Metadata-only plan: which partitions' files merge, and into how many.

    A group qualifies when it has at least ``min_files`` files AND merging
    actually reduces the file count (``ceil(bytes/target) < n``) — a
    partition of two 120 MB files at a 128 MB target is left alone."""
    snap = table.current_snapshot()
    if snap is None:
        return []
    m = table._manifest(snap)
    sizes = table.file_sizes(snap)
    by_part: dict[str, list[str]] = {}
    for rel in table._files_rel(m):
        by_part.setdefault(_partition_of(rel, m["data_dirs"]), []).append(rel)
    out = []
    for part in sorted(by_part):
        files = sorted(by_part[part])
        total = sum(sizes[f] for f in files)
        want = max(1, math.ceil(total / target_bytes))
        if len(files) >= min_files and want < len(files):
            out.append(CompactionGroup(part, files, total, want))
    return out


def compact(
    spark: SparkSession,
    table: SnapshotTable,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    min_files: int = 2,
) -> CompactionResult:
    """Merge each qualifying partition's small files toward ``target_bytes``
    and commit the rewrite as a new snapshot. No-op (current snapshot,
    empty groups) when nothing qualifies."""
    groups = compaction_plan(table, target_bytes, min_files)
    if not groups:
        return CompactionResult(table.current_snapshot())
    affected = [f for g in groups for f in g.files]
    m = table._manifest(table.current_snapshot())
    replacement = table.read_files(spark, affected)
    partition_by = m.get("partition_by") or []
    if partition_by:
        # REBALANCE (AQE) over the partition columns: small partitions
        # coalesce into shared tasks (the directory split still yields one
        # file per partition value), oversized ones split at the advisory
        # size — no row-count guessing, no whole-table shuffle (only the
        # affected bytes move)
        replacement = replacement.hint("rebalance", *partition_by)
    else:
        replacement = replacement.coalesce(
            max(1, sum(g.target_files for g in groups))
        )
    snap = table.rewrite_files(affected, replacement)
    return CompactionResult(snap, groups)


def rewrite_zordered(
    spark: SparkSession,
    table: SnapshotTable,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
) -> int:
    """Re-cluster the whole table on the Morton key of ``cols`` (Delta's
    ``OPTIMIZE ... ZORDER BY`` shape) and commit it as one rewrite
    snapshot: after this, zone-map pruning works on EVERY listed column,
    not just a leading sort key. Stats for ``cols`` are recorded even if
    the table never tracked them (``extra_stats_columns``). Whole-table
    by construction — z-ordering is a global re-layout; run it off the
    ingest path like any compaction."""
    from ..storage.zorder import zorder_cluster

    snap = table.current_snapshot()
    if snap is None:
        raise FileNotFoundError(f"no committed snapshot in {table.root}")
    files = [table._rel(p) for p in table.data_files(snap)]
    if num_files is None:
        num_files = max(1, len(files))
    partition_by = table._manifest(snap).get("partition_by") or []
    replacement = zorder_cluster(
        table.read(spark, snap), cols, bits=bits, num_files=num_files,
        prefix_cols=partition_by,
    )
    return table.rewrite_files(files, replacement, extra_stats_columns=cols)
