"""Snapshot table isolation/rollback + resume-from-manifest semantics
(reference: temp→rename commits HdfsStorage.java:40-51, status-table resume
ProcessCheck.java:36-80, TransferProcess.java:48-67)."""

import datetime

from pyspark.sql import functions as F

from binlog_processer_spark.operators.resume import ProcessedManifest, remaining_events
from binlog_processer_spark.storage.table import SnapshotTable


def test_snapshot_write_read_append_rollback(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    df1 = spark.range(5).withColumn("v", F.lit("a"))
    s0 = t.write(df1)
    assert t.read(spark).count() == 5

    df2 = spark.range(3).withColumn("v", F.lit("b"))
    s1 = t.write(df2, mode="append")
    assert t.read(spark).count() == 8
    assert t.read(spark, snapshot=s0).count() == 5  # time travel

    s2 = t.write(df2, mode="overwrite")
    assert t.read(spark).count() == 3

    t.rollback(s1)
    assert t.read(spark).count() == 8
    assert [m["snapshot"] for m in t.history()] == [s1, s0]
    assert s2 == 2


def test_partitioned_snapshot_prunes(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "part"))
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, v int"
    )
    t.write(df, partition_by=["k"])
    out = t.read(spark).filter(F.col("k") == "a")
    assert out.count() == 2
    # partition filter reaches the scan (pruning, not post-filter)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(k" in plan or "k#" in plan


def test_resume_manifest_antijoin(spark, tmp_path):
    m = ProcessedManifest(str(tmp_path / "m" / "_processed.json"))
    assert m.load() == set()
    m.mark(["f1", "f2"])
    m.mark(["f2", "f3"])
    assert m.load() == {"f1", "f2", "f3"}

    ev = spark.createDataFrame(
        [("f1", 1), ("f4", 2), ("f4", 3)], "file_id string, x int"
    )
    rem = remaining_events(ev, m.load())
    assert sorted(r.x for r in rem.collect()) == [2, 3]
    assert remaining_events(ev, set()).count() == 3


def test_append_schema_mismatch_raises(spark, tmp_path):
    """Appends must not fork a table's schema: Spark NULL-fills missing
    parquet columns on read, so a mixed table silently reads back wrong
    (ADVICE r2). Column ORDER and nullability differences are fine."""
    import pytest

    tbl = SnapshotTable(str(tmp_path / "t"))
    df = spark.range(3).select(F.col("id"), F.lit("x").alias("s"))
    tbl.write(df)
    # reordered columns: legal append
    tbl.write(df.select("s", "id"), mode="append")
    # new column: must raise, not commit
    with pytest.raises(ValueError, match="append schema mismatch"):
        tbl.write(df.withColumn("extra", F.lit(1)), mode="append")
    # type change: must raise
    with pytest.raises(ValueError, match="append schema mismatch"):
        tbl.write(
            df.select(F.col("id").cast("int").alias("id"), "s"),
            mode="append",
        )
    assert tbl.read(spark).count() == 6
