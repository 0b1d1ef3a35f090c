"""Snapshot change-data-feed: manifest-planned file diff, EXCEPT ALL
cancellation of rewrite-copied rows, Delta-CDF change classification, and
the only-churned-files-scanned guarantee (via DataFrame.inputFiles)."""

import pytest
from pyspark.sql import functions as F

from binlog_processer_spark.storage.changes import table_changes
from binlog_processer_spark.storage.table import SnapshotTable


def _t(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.range(0, 100).select("id", (F.col("id") * 2).alias("v"))
    t.write(df.repartition(4))
    return t


def _scanned_rel(df, t):
    return {p.split(t.root.rstrip("/") + "/", 1)[1] for p in df.inputFiles()}


def test_append_only_diff_is_the_delta_scanned_from_new_files_only(
    spark, tmp_path
):
    t = _t(spark, tmp_path)
    t.write(
        spark.range(100, 120).select("id", (F.col("id") * 2).alias("v")),
        mode="append",
    )
    ch = table_changes(spark, t, since=0, key_cols=["id"])
    rows = {(r.id, r._change_type) for r in ch.collect()}
    assert rows == {(i, "insert") for i in range(100, 120)}
    churn = set(t.added_files(since=0))
    assert _scanned_rel(ch, t) <= churn  # snap-0 files never opened


def test_rewrite_copied_rows_cancel_and_updates_classify(spark, tmp_path):
    t = _t(spark, tmp_path)
    f7 = (
        t.read(spark)
        .withColumn("f", F.input_file_name())
        .filter("id = 7")
        .collect()[0]["f"]
    )
    sub = t.read_files(spark, [f7])
    n_copied = sub.count() - 1
    assert n_copied > 0  # the rewrite copies unchanged neighbours
    mod = sub.withColumn(
        "v", F.when(F.col("id") == 7, F.lit(-1)).otherwise(F.col("v"))
    ).filter(F.col("id") != 13)  # and deletes one row if present
    t.rewrite_files([f7], mod)

    ch = table_changes(spark, t, since=0, key_cols=["id"])
    rows = {(r.id, r._change_type, r.v) for r in ch.collect()}
    expect = {(7, "update_preimage", 14), (7, "update_postimage", -1)}
    had_13 = any(r.id == 13 for r in sub.collect())
    if had_13:
        expect.add((13, "delete", 26))
    assert rows == expect
    # phantom-free: copied rows never surface, untouched files never read
    old = set(t._files_rel(t._manifest(0)))
    new = set(t._files_rel(t._manifest(t.current_snapshot())))
    assert _scanned_rel(ch, t) <= (old - new) | (new - old)


def test_no_keys_gives_insert_delete_only(spark, tmp_path):
    t = _t(spark, tmp_path)
    f = t.data_files()[0]
    sub = t.read_files(spark, [f])
    t.rewrite_files([f], sub.withColumn("v", F.col("v") + 1))
    ch = table_changes(spark, t, since=0)
    kinds = {r._change_type for r in ch.collect()}
    assert kinds == {"insert", "delete"}
    assert (
        ch.filter("_change_type = 'insert'").count()
        == ch.filter("_change_type = 'delete'").count()
        == sub.count()
    )


def test_same_snapshot_diff_is_empty(spark, tmp_path):
    t = _t(spark, tmp_path)
    cur = t.current_snapshot()
    assert table_changes(spark, t, since=cur, snapshot=cur).count() == 0


def test_diff_across_schema_widening(spark, tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    t = SnapshotTable(str(tmp_path / "t"))
    t.write(
        spark.range(0, 10).select(
            "id", (F.col("id") * 2).cast("int").alias("v")
        )
    )
    t.migrate_schema(
        StructType(
            [StructField("id", LongType()), StructField("v", LongType())]
        )
    )
    t.write(
        spark.range(10, 12).select("id", (F.col("id") * 2).alias("v")),
        mode="append",
    )
    ch = table_changes(spark, t, since=0, key_cols=["id"])
    assert {(r.id, r._change_type, r.v) for r in ch.collect()} == {
        (10, "insert", 20),
        (11, "insert", 22),
    }
    assert dict(ch.dtypes)["v"] == "bigint"


def test_unknown_snapshot_raises(spark, tmp_path):
    t = _t(spark, tmp_path)
    with pytest.raises(FileNotFoundError):
        table_changes(spark, t, since=99)


def test_changes_plan_single_aggregate_no_sort_merge(spark, tmp_path):
    """The residue is ONE signed-count aggregate over the churned files —
    a regression back to per-branch exceptAlls re-scans the churn 4x and
    multiplies exchanges (measured 12 -> 4 when this landed)."""
    t = _t(spark, tmp_path)
    f = t.data_files()[0]
    sub = t.read_files(spark, [f])
    t.rewrite_files([f], sub.withColumn("v", F.col("v") + 1))
    ch = table_changes(spark, t, since=0, key_cols=["id"])
    plan = ch._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SortMergeJoin") == 0, plan
    assert plan.count("Exchange") <= 5, plan


def test_change_feed_cursor_at_least_once(spark, tmp_path):
    from binlog_processer_spark.storage.changes import ChangeFeed

    t = _t(spark, tmp_path)  # snap 0: ids 0..99
    feed = ChangeFeed(t, str(tmp_path / "consumer" / "cursor"),
                      key_cols=["id"])
    # latest start: head committed, nothing to process
    df, snap = feed.poll(spark)
    assert df is None and snap == 0 and feed.position() == 0

    t.write(
        spark.range(100, 110).select("id", (F.col("id") * 2).alias("v")),
        mode="append",
    )
    df, snap = feed.poll(spark)
    assert snap == 1
    assert {(r.id, r._change_type) for r in df.collect()} == {
        (i, "insert") for i in range(100, 110)
    }
    # crash before commit: the SAME batch re-polls (at-least-once)
    df2, snap2 = feed.poll(spark)
    assert snap2 == 1 and df2.count() == 10
    feed.commit(snap2)
    df3, _ = feed.poll(spark)
    assert df3 is None

    # a second, independent consumer bootstraps with the full snapshot
    boot = ChangeFeed(t, str(tmp_path / "other" / "cursor"),
                      initial="earliest")
    df4, snap4 = boot.poll(spark)
    assert snap4 == 1 and df4.count() == 110
    assert {r._change_type for r in df4.collect()} == {"insert"}
    boot.commit(snap4)
    assert boot.poll(spark)[0] is None


def test_null_keyed_changes_survive_key_classification(spark, tmp_path):
    """A NULL-keyed insert/delete must not vanish when key_cols is set:
    the classifier groups per key null-safely (window partitionBy), where
    a plain equi-join against a per-key sides table drops NULL keys."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.write(
        spark.createDataFrame([("a", 1)], "k string, v long").coalesce(1)
    )
    t.write(
        spark.createDataFrame([(None, 9), ("b", 2)], "k string, v long")
        .coalesce(1),
        mode="append",
    )
    ch = table_changes(spark, t, since=0, key_cols=["k"])
    rows = {(r.k, r.v, r._change_type) for r in ch.collect()}
    assert rows == {(None, 9, "insert"), ("b", 2, "insert")}

    # and a NULL-keyed update classifies as pre/postimage, not insert+delete
    f = t.read(spark).withColumn("f", F.input_file_name()).filter(
        "k IS NULL"
    ).collect()[0]["f"]
    mod = t.read_files(spark, [f]).withColumn(
        "v", F.when(F.col("k").isNull(), F.lit(-9)).otherwise(F.col("v"))
    )
    t.rewrite_files([f], mod)
    ch2 = table_changes(spark, t, since=1, key_cols=["k"])
    rows2 = {(r.k, r.v, r._change_type) for r in ch2.collect()}
    assert rows2 == {
        (None, 9, "update_preimage"),
        (None, -9, "update_postimage"),
    }
