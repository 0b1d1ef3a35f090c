"""Snapshot-table maintenance: incremental (delta) scans and snapshot
expiry/vacuum — manifest-set operations, no data-tree walks (Iceberg's
incrementalScan + expireSnapshots over the JSON-manifest stand-in)."""

import os

import pytest
from pyspark.sql import functions as F

from binlog_processer_spark.operators.compact import compact
from binlog_processer_spark.storage.table import SnapshotTable


def _t(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.write(
        spark.range(0, 100).select(
            "id", (F.col("id") % 4).cast("string").alias("k")
        ),
        partition_by=["k"],
    )
    return t


def _append(spark, t, lo, hi):
    t.write(
        spark.range(lo, hi).select(
            "id", (F.col("id") % 4).cast("string").alias("k")
        ),
        partition_by=["k"],
        mode="append",
    )


def test_incremental_scan_reads_only_the_delta(spark, tmp_path):
    t = _t(spark, tmp_path)
    _append(spark, t, 100, 150)
    assert t.added_files(0)  # manifest diff is non-empty
    delta = sorted(r.id for r in t.read_incremental(spark, since=0).collect())
    assert delta == list(range(100, 150))
    # no change since current snapshot -> empty delta, schema preserved
    empty = t.read_incremental(spark, since=t.current_snapshot())
    assert empty.count() == 0 and set(empty.columns) == {"id", "k"}


def test_expire_vacuums_rewritten_files_after_compaction(spark, tmp_path):
    t = _t(spark, tmp_path)
    _append(spark, t, 100, 150)
    _append(spark, t, 150, 200)
    old_files = [os.path.join(t.root, p) for p in t.file_sizes()]
    compact(spark, t)  # rewrites every fragmented file into snap-3
    before = sorted(r.id for r in t.read(spark).select("id").collect())

    res = t.expire_snapshots(keep_last=1)
    assert res["snapshots_removed"] == [0, 1, 2]
    # every superseded file physically vacuumed
    assert res["files_deleted"] == len(old_files) and res["bytes_freed"] > 0
    assert not any(os.path.exists(p) for p in old_files)
    # expired snapshot dirs are gone entirely (nothing in them referenced)
    assert sorted(os.listdir(t.root)) == ["_current", "snap-3"]
    assert sorted(r.id for r in t.read(spark).select("id").collect()) == before
    for p in t.data_files():
        assert os.path.exists(p)


def test_expire_keeps_data_dirs_a_kept_snapshot_still_reads(spark, tmp_path):
    t = _t(spark, tmp_path)
    _append(spark, t, 100, 150)  # snap-1 references snap-0/data files
    res = t.expire_snapshots(keep_last=1)
    assert res["snapshots_removed"] == [0] and res["files_deleted"] == 0
    # snap-0's data survives (referenced), only its manifest is dropped
    assert os.path.isdir(os.path.join(t.root, "snap-0", "data"))
    assert not os.path.exists(
        os.path.join(t.root, "snap-0", "manifest.json")
    )
    assert t.read(spark).count() == 150
    assert len(t.history()) == 1  # chain stops at the expiry horizon
    with pytest.raises(FileNotFoundError):
        t.rollback(0)  # beyond the kept window


def test_expire_deletes_orphan_branches_left_by_rollback(spark, tmp_path):
    t = _t(spark, tmp_path)
    _append(spark, t, 100, 150)
    t.rollback(0)  # snap-1 is now an orphan branch
    res = t.expire_snapshots(keep_last=1)
    assert res["snapshots_removed"] == [1] and res["files_deleted"] > 0
    assert not os.path.exists(os.path.join(t.root, "snap-1"))
    assert t.read(spark).count() == 100


def test_expire_default_keeps_a_rollback_window(spark, tmp_path):
    t = _t(spark, tmp_path)
    _append(spark, t, 100, 150)
    res = t.expire_snapshots()  # keep_last=2
    assert res["snapshots_removed"] == [] and res["files_deleted"] == 0
    t.rollback(0)
    assert t.read(spark).count() == 100
    with pytest.raises(ValueError):
        t.expire_snapshots(keep_last=0)


def test_time_travel_by_timestamp(spark, tmp_path):
    import time as _time

    t = _t(spark, tmp_path)
    m0 = t._manifest(0)["created_ms"]
    _time.sleep(0.002)  # distinct created_ms across the two commits
    _append(spark, t, 100, 150)
    m1 = t._manifest(1)["created_ms"]
    assert m1 > m0

    assert t.snapshot_as_of(m0) == 0
    assert t.snapshot_as_of(m1 - 1) == 0
    assert t.snapshot_as_of(m1) == 1
    assert t.read_as_of(spark, m0).count() == 100
    assert t.read_as_of(spark, m1 + 10_000).count() == 150
    with pytest.raises(FileNotFoundError):
        t.snapshot_as_of(m0 - 1)  # predates the whole history

    # expiry trims the resolvable window but never mis-resolves: the
    # expired ancestor's timestamp now raises instead of answering wrong
    t.expire_snapshots(keep_last=1)
    assert t.snapshot_as_of(m1) == 1
    with pytest.raises(FileNotFoundError):
        t.snapshot_as_of(m0)


def test_tags_pin_snapshots_through_expiry(spark, tmp_path):
    t = _t(spark, tmp_path)  # snap 0: ids 0..99
    _append(spark, t, 100, 150)  # snap 1
    t.tag("v1", 0)
    _append(spark, t, 150, 160)  # snap 2
    assert t.refs() == {"v1": 0}
    assert t.resolve("v1") == 0 and t.resolve(None) == 2
    assert t.read(spark, "v1").count() == 100

    res = t.expire_snapshots(keep_last=1)
    assert 0 not in res["snapshots_removed"]  # pinned by the tag
    assert 1 in res["snapshots_removed"]
    assert t.read(spark, "v1").count() == 100  # release stays readable

    t.drop_tag("v1")
    res2 = t.expire_snapshots(keep_last=1)
    assert 0 in res2["snapshots_removed"]
    with pytest.raises(KeyError):
        t.read(spark, "v1")
    with pytest.raises(KeyError):
        t.drop_tag("nope")
    # re-tagging re-points; default tags the current snapshot
    t.tag("head")
    assert t.resolve("head") == t.current_snapshot()
    t.tag("head", t.current_snapshot())
    assert t.refs()["head"] == t.current_snapshot()


def test_optimistic_commit_conflict(spark, tmp_path):
    """Two writers building on the same parent: the second commit must
    FAIL with CommitConflict instead of silently orphaning the first
    (Iceberg's compare-and-swap contract)."""
    import json
    import time as _time

    from binlog_processer_spark.storage.table import CommitConflict

    t = _t(spark, tmp_path)  # snap 0
    # writer A advances the table...
    _append(spark, t, 100, 120)  # snap 1
    # ...writer B, who built on parent 0, tries to publish its snapshot
    with pytest.raises(CommitConflict):
        t._commit(5, expected_parent=0)
    assert t.current_snapshot() == 1  # winner untouched

    # a FRESH foreign lock blocks the commit (another writer mid-flip)
    lock = os.path.join(t.root, "_commit.lock")
    with open(lock, "w") as f:
        json.dump({"ts": _time.time(), "pid": 0}, f)
    with pytest.raises(CommitConflict):
        t._commit(1, expected_parent=1)
    os.remove(lock)

    # a STALE lock (crashed committer) is broken and the commit proceeds
    with open(lock, "w") as f:
        json.dump({"ts": _time.time() - 3600, "pid": 0}, f)
    t._commit(1, expected_parent=1)  # no-op re-point, but must succeed
    assert not os.path.exists(lock)
    assert t.current_snapshot() == 1

    # normal writes still work end-to-end after all that
    _append(spark, t, 120, 130)
    assert t.read(spark).count() == 130


def test_catalog_commit_conflict(spark, tmp_path):
    from binlog_processer_spark.storage.catalog import Catalog
    from binlog_processer_spark.storage.table import CommitConflict

    wh = str(tmp_path / "wh")
    cat = Catalog(wh)
    cat.table("t").write(spark.range(5).select("id"))
    cat.commit({"t": 0})

    import json
    import time as _time

    lock = os.path.join(wh, "_catalog", "_commit.lock")
    with open(lock, "w") as f:
        json.dump({"ts": _time.time(), "pid": 0}, f)
    with pytest.raises(CommitConflict):
        cat.commit({"t": 0})
    os.remove(lock)
    assert cat.commit({"t": 0}) == 1


def test_partition_spec_evolution_guarded_and_readable(spark, tmp_path):
    t = _t(spark, tmp_path)  # partitioned by k
    df = spark.range(100, 120).select(
        "id", (F.col("id") % 4).cast("string").alias("k")
    )
    # accidental spec change is rejected...
    with pytest.raises(ValueError):
        t.write(df, mode="append")  # unpartitioned append to a k-table
    with pytest.raises(ValueError):
        t.write(df, partition_by=["id"], mode="append")
    # ...explicit evolution is legal: new data in the new layout, old dirs
    # keep theirs, and reads serve the full table with correct values
    t.write(df, mode="append", evolve_partitioning=True)
    got = t.read(spark)
    assert got.count() == 120
    assert got.filter("k = '1'").count() == 25 + 5  # old path + new data
    # spec recorded for future appends: matching the NEW spec now passes
    t.write(
        spark.range(120, 125).select(
            "id", (F.col("id") % 4).cast("string").alias("k")
        ),
        mode="append",
    )
    assert t.read(spark).count() == 125


def test_concurrent_appends_serialize_without_lost_updates(spark, tmp_path):
    """8 threads append concurrently with bounded retries: every batch
    must land exactly once (no lost updates, no duplicates) and the
    lineage must be a clean chain — the end-to-end property the
    optimistic CAS commit exists to provide. Losers see CommitConflict
    (or the snap-dir mint collision's errorifexists) and retry."""
    import threading

    from binlog_processer_spark.storage.table import CommitConflict

    t = _t(spark, tmp_path)  # snap 0: ids 0..99
    errors: list[str] = []

    def worker(i):
        lo = 1000 * (i + 1)
        df = spark.range(lo, lo + 10).select(
            "id", (F.col("id") % 4).cast("string").alias("k")
        )
        for _ in range(30):
            try:
                t.write(df, partition_by=["k"], mode="append")
                return
            except CommitConflict:
                continue
            except Exception as e:  # snap-dir mint collision: also retry
                if "already exists" in str(e):
                    continue
                errors.append(f"{type(e).__name__}: {e}")
                return
        errors.append(f"worker {i} exhausted retries")

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    got = [r.id for r in t.read(spark).select("id").collect()]
    assert len(got) == len(set(got)) == 100 + 8 * 10  # exactly once each
    # lineage is a chain of 9 snapshots ending at the root
    chain = t.history()
    assert len(chain) == 9 and chain[-1]["parent"] is None
    assert not os.path.exists(os.path.join(t.root, "_commit.lock"))


def test_expire_spares_live_reservation_vacuums_stale(spark, tmp_path):
    """expire_snapshots must not rmtree a concurrent writer's freshly
    reserved (marker, no manifest yet) snap dir — Spark may be mid-save
    into it. A stale reservation past the grace TTL is vacuumed."""
    import json as _json
    import time as _time

    t = _t(spark, tmp_path)
    _append(spark, t, 100, 110)
    _append(spark, t, 110, 120)
    # simulate an in-flight writer: reserved dir + staged data, no manifest
    live = os.path.join(t.root, "snap-99")
    os.makedirs(live)
    with open(os.path.join(live, ".reserved"), "w") as f:
        f.write(_json.dumps({"ts": _time.time(), "pid": 1}))
    with open(os.path.join(live, "part-0.parquet"), "w") as f:
        f.write("staged")
    # and a crashed writer long past the grace window
    stale = os.path.join(t.root, "snap-98")
    os.makedirs(stale)
    with open(os.path.join(stale, ".reserved"), "w") as f:
        f.write(_json.dumps({"ts": _time.time() - 10_000, "pid": 2}))

    res = t.expire_snapshots(keep_last=2)
    assert os.path.isdir(live), "live reservation was vacuumed"
    assert os.path.exists(os.path.join(live, "part-0.parquet"))
    assert not os.path.isdir(stale), "stale reservation survived"
    assert 99 not in res["snapshots_removed"]
    assert 98 in res["snapshots_removed"]
