"""Corrupt-output structural scrub: detect → quarantine → rewrite → replay
(ListCorruptAvroFile.java:34-44 + Repair.java:179-260 analogue), plus the
ORC storage path (S9)."""

import os

from pyspark.sql import functions as F

from binlog_processer_spark.functions.parse import serialize_expr
from binlog_processer_spark.operators.resume import ProcessedManifest
from binlog_processer_spark.operators.structural import (
    affected_file_ids,
    drop_file_ids,
    quarantine_corrupt,
    scan_corrupt_files,
)
from binlog_processer_spark.plans.pipeline import run_pipeline
from binlog_processer_spark.sources.generator import generate_corpus, routing_dim
from binlog_processer_spark.storage.table import SnapshotTable


def _raw(spark, n_docs=200):
    return generate_corpus(spark, n_docs, partitions=4).select(
        serialize_expr().alias("raw")
    )


def _counts(df):
    return {
        (r.tree, r.database_name, r.table_name, str(r.part_date)): r.cnt
        for r in df.groupBy(
            "tree", "database_name", "table_name", "part_date"
        ).agg(F.count("*").alias("cnt")).collect()
    }


def test_scrub_detects_quarantines_and_replays(spark, tmp_path):
    wh = str(tmp_path / "wh")
    run_pipeline(spark, _raw(spark), routing_dim(spark), wh)
    routed = SnapshotTable(os.path.join(wh, "routed"))
    lineage = SnapshotTable(os.path.join(wh, "lineage"))
    pristine = _counts(routed.read(spark))
    n_rows = routed.read(spark).count()

    # clean scan: all files ok
    assert scan_corrupt_files(spark, routed).filter(~F.col("ok")).count() == 0

    # bitrot one data file (truncate its footer)
    victim = routed.data_files()[0]
    with open(victim, "r+b") as f:
        f.truncate(max(os.path.getsize(victim) // 2, 8))

    scan = scan_corrupt_files(spark, routed)
    corrupt = [r.path for r in scan.filter(~F.col("ok")).collect()]
    assert corrupt == [victim]

    # quarantine: table readable again immediately, rows missing
    quarantine_corrupt(routed, corrupt)
    n_after = routed.read(spark).count()
    assert 0 < n_after < n_rows

    # lineage diff names the source files that lost rows
    affected = affected_file_ids(spark, routed, lineage)
    assert affected

    # rewrite without affected sources, reset manifest, replay
    drop_file_ids(spark, routed, affected)
    manifest = ProcessedManifest(os.path.join(wh, "_processed.json"))
    manifest.unmark(affected)
    replay = _raw(spark)  # full input; resume skips the still-done files
    run_pipeline(spark, replay, routing_dim(spark), wh)

    assert _counts(routed.read(spark)) == pristine
    assert routed.read(spark).count() == n_rows


def test_orc_table_roundtrip(spark, tmp_path):
    """S9: the Hive-side ORC format is a first-class storage path — write,
    append, read-back, file inventory, and corruption scan all work on ORC."""
    tbl = SnapshotTable(str(tmp_path / "orc_tbl"))
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 3).alias("k")
    )
    tbl.write(df, partition_by=["k"], file_format="orc")
    tbl.write(
        spark.range(100, 120).select(F.col("id"), (F.col("id") % 3).alias("k")),
        partition_by=["k"],
        mode="append",
        file_format="orc",
    )
    back = tbl.read(spark)
    assert back.count() == 120
    assert {r.k for r in back.select("k").distinct().collect()} == {0, 1, 2}
    files = tbl.data_files()
    assert files and all(f.endswith(".orc") for f in files)
    assert scan_corrupt_files(spark, tbl).filter(~F.col("ok")).count() == 0
    # format mixing is refused on append
    try:
        tbl.write(df, mode="append", file_format="parquet")
        raise AssertionError("expected format-mix ValueError")
    except ValueError:
        pass


def test_file_scoped_rewrite_carries_untouched_files_by_reference(
    spark, tmp_path
):
    """drop_file_ids rewrites ONLY the physical files containing affected
    rows; every other file survives by manifest reference — same path, same
    inode, same mtime (never read, moved, or copied)."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    # 4 files, file_id localized per file via repartition on it
    df = spark.range(400).select(
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias(
            "file_id"
        ),
        F.col("id").alias("doc_id"),
    )
    tbl.write(df.repartition(4, "file_id"))
    before = {p: (os.stat(p).st_ino, os.stat(p).st_mtime_ns)
              for p in tbl.data_files()}

    snap = drop_file_ids(spark, tbl, ["src2"])
    assert snap == 1

    after = set(tbl.data_files())
    kept = after & set(before)
    assert kept, "untouched files must stay referenced"
    for p in kept:
        st = os.stat(p)
        assert (st.st_ino, st.st_mtime_ns) == before[p], p
    # table content: all rows except src2, no duplicates
    back = tbl.read(spark)
    assert back.count() == 300
    assert back.filter(F.col("file_id") == "src2").count() == 0
    # no-op drop: nothing committed
    assert drop_file_ids(spark, tbl, ["srcX"]) == snap
