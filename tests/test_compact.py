"""Small-file compaction: metadata-only planning, partition-scoped rewrite,
untouched files carried by reference (Iceberg rewriteDataFiles analogue over
the snapshot store — the answer to the reference sink's file-per-binlog
fragmentation, PartitionWriterManager.java:60-96)."""

import json
import os

from pyspark.sql import functions as F

from binlog_processer_spark.operators.compact import (
    compact,
    compaction_plan,
)
from binlog_processer_spark.storage.table import SnapshotTable


def _fragmented(spark, root, n_appends=3, partitioned=True, skip_last=False):
    """A table fragmented the way an append-per-run sink fragments it:
    every append lands one file per partition in a fresh data dir.
    ``skip_last``: appends after the first omit partition k=3, leaving it a
    single-file (non-qualifying) group."""
    t = SnapshotTable(os.path.join(root, "t"))
    for i in range(n_appends):
        df = spark.range(i * 100, i * 100 + 100).select(
            F.col("id"),
            (F.col("id") % (3 if skip_last and i else 4))
            .cast("string")
            .alias("k"),
        ).coalesce(1)
        t.write(
            df,
            partition_by=["k"] if partitioned else None,
            mode="overwrite" if i == 0 else "append",
        )
    return t


def _ids(spark, t):
    return sorted(r.id for r in t.read(spark).select("id").collect())


def _files_per_partition(t):
    out = {}
    for rel, size in t.file_sizes().items():
        part = rel.split("/data/", 1)[1].rsplit("/", 1)[0] if "=" in rel else ""
        out.setdefault(part, []).append(rel)
        assert size > 0
    return out


def test_plan_is_metadata_only_and_groups_by_logical_partition(spark, tmp_path):
    t = _fragmented(spark, str(tmp_path))
    groups = compaction_plan(t)  # default 128MB target >> tiny files
    # 4 partition values × 3 appends = 4 groups of 3 files each
    assert sorted(g.partition for g in groups) == [f"k={i}" for i in range(4)]
    assert all(len(g.files) == 3 and g.target_files == 1 for g in groups)
    assert all(g.bytes == sum(t.file_sizes()[f] for f in g.files) for g in groups)
    # sizes were recorded at commit: the whole inventory is in the manifest
    m = t._manifest(t.current_snapshot())
    assert set(m["file_bytes"]) == set(m["files"])


def test_compact_merges_preserves_rows_and_converges(spark, tmp_path):
    t = _fragmented(spark, str(tmp_path))
    before = _ids(spark, t)
    snap0 = t.current_snapshot()
    res = compact(spark, t)
    assert res.snapshot == snap0 + 1 and res.files_removed == 12
    assert _ids(spark, t) == before
    assert all(len(v) == 1 for v in _files_per_partition(t).values())
    # idempotent: a second pass finds nothing to do and commits nothing
    res2 = compact(spark, t)
    assert res2.snapshot == res.snapshot and not res2.groups


def test_untouched_partition_files_carried_by_reference(spark, tmp_path):
    t = _fragmented(spark, str(tmp_path), skip_last=True)
    lone = _files_per_partition(t)["k=3"]
    assert len(lone) == 1
    abs_path = os.path.join(t.root, lone[0])
    ino, mtime = os.stat(abs_path).st_ino, os.stat(abs_path).st_mtime_ns
    compact(spark, t)
    # still served, same physical file — never read, moved, or rewritten
    assert lone[0] in t.file_sizes()
    st = os.stat(abs_path)
    assert (st.st_ino, st.st_mtime_ns) == (ino, mtime)
    assert _files_per_partition(t)["k=3"] == lone


def test_noop_when_merging_cannot_reduce_file_count(spark, tmp_path):
    t = _fragmented(spark, str(tmp_path))
    snap0 = t.current_snapshot()
    # 1-byte target: every group already needs >= its file count
    res = compact(spark, t, target_bytes=1)
    assert res.snapshot == snap0 and not res.groups


def test_unpartitioned_table_compacts_to_planned_count(spark, tmp_path):
    t = _fragmented(spark, str(tmp_path), partitioned=False)
    before = _ids(spark, t)
    groups = compaction_plan(t)
    assert [g.partition for g in groups] == [""] and groups[0].target_files == 1
    compact(spark, t)
    assert _ids(spark, t) == before
    assert len(t.file_sizes()) == 1


def test_legacy_manifest_without_sizes_stats_lazily(spark, tmp_path):
    t = _fragmented(spark, str(tmp_path))
    snap = t.current_snapshot()
    mpath = os.path.join(t.root, f"snap-{snap}", "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    recorded = m.pop("file_bytes")
    with open(mpath, "w") as f:
        json.dump(m, f)
    assert t.file_sizes() == recorded  # stat fallback agrees with the record
    groups = compaction_plan(t)
    assert len(groups) == 4
    compact(spark, t)
    assert all(len(v) == 1 for v in _files_per_partition(t).values())
