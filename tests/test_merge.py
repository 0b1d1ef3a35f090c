"""Generic MERGE INTO: update-all / set-expression / delete / insert arms,
file-scoped commits (untouched files carried by inode), cardinality
validation, and bootstrap-by-insert."""

import os

import pytest
from pyspark.sql import functions as F

from binlog_processer_spark.operators.merge import (
    MergeCardinalityError,
    merge_into,
)
from binlog_processer_spark.storage.table import SnapshotTable


def _t(spark, tmp_path, bloom=False):
    t = SnapshotTable(str(tmp_path / "t"))
    t.write(
        spark.range(0, 100).select(
            F.col("id").cast("string").alias("k"),
            (F.col("id") * 2).alias("v"),
        ).repartition(5),
        bloom_columns=["k"] if bloom else None,
    )
    return t


def _src(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def test_merge_update_all_insert_and_file_scope(spark, tmp_path):
    t = _t(spark, tmp_path, bloom=True)
    before = {p: os.stat(p).st_ino for p in t.data_files()}
    merge_into(
        spark, t,
        _src(spark, [("7", -1), ("13", -2), ("900", 900)]),
        on=["k"],
    )
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got["7"] == -1 and got["13"] == -2  # matched: updated
    assert got["900"] == 900                   # not matched: inserted
    assert got["50"] == 100 and len(got) == 101
    # file-scoped: files without a source key are carried by reference
    kept = set(t.data_files()) & set(before)
    assert kept and all(os.stat(p).st_ino == before[p] for p in kept)


def test_merge_set_expressions_and_delete_arm(spark, tmp_path):
    t = _t(spark, tmp_path)
    merge_into(
        spark, t,
        _src(spark, [("7", 1000), ("13", 0), ("901", 1)]),
        on=["k"],
        matched_delete="s.v = 0",                 # 13 deleted
        matched_update={"v": "t.v + s.v"},        # 7 -> 14 + 1000
        not_matched_insert=False,                 # 901 NOT inserted
    )
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got["7"] == 1014
    assert "13" not in got and "901" not in got
    assert len(got) == 99


def test_merge_matched_none_keeps_target(spark, tmp_path):
    t = _t(spark, tmp_path)
    merge_into(
        spark, t, _src(spark, [("7", -1), ("902", 2)]),
        on=["k"], matched_update=None,
    )
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got["7"] == 14 and got["902"] == 2


def test_merge_cardinality_and_shape_guards(spark, tmp_path):
    t = _t(spark, tmp_path)
    with pytest.raises(MergeCardinalityError):
        merge_into(spark, t, _src(spark, [("7", 1), ("7", 2)]), on=["k"])
    # duplicate TARGET rows for a matched key
    t.write(_src(spark, [("7", 999)]), mode="append")
    with pytest.raises(MergeCardinalityError):
        merge_into(spark, t, _src(spark, [("7", 1)]), on=["k"])
    # validate=False applies the action to every matched row
    merge_into(spark, t, _src(spark, [("7", 1)]), on=["k"], validate=False)
    assert [r.v for r in t.read(spark).filter("k = '7'").collect()] == [1, 1]
    with pytest.raises(ValueError):
        merge_into(
            spark, t,
            spark.createDataFrame([("7",)], "k string"), on=["k"],
        )


def test_merge_bootstraps_empty_table(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "fresh"))
    snap = merge_into(spark, t, _src(spark, [("a", 1)]), on=["k"])
    assert snap == 0 and t.read(spark).count() == 1


def test_merge_null_keys_are_planned_and_matched(spark, tmp_path):
    """NULL-keyed rows ride the null-safe join AND the hit planner: with a
    bloom index the planner must fall back to the scan (a bloom cannot
    prove NULL absent) instead of crashing, and the NULL-keyed target row
    must be updated, not duplicated."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [("a", 1), (None, 2), ("b", 3)], "k string, v long"
        ).repartition(3),
        bloom_columns=["k"],
    )
    merge_into(
        spark, t,
        spark.createDataFrame([(None, -2), ("c", 4)], "k string, v long"),
        on=["k"],
    )
    got = sorted(
        (r.k, r.v) for r in t.read(spark).collect()
        if r.k is not None
    )
    nulls = [r.v for r in t.read(spark).collect() if r.k is None]
    assert nulls == [-2]  # updated in place, not duplicated
    assert got == [("a", 1), ("b", 3), ("c", 4)]


def test_matched_delete_null_condition_keeps_the_row(spark, tmp_path):
    """SQL MERGE deletes only on cond = TRUE: a condition that evaluates
    to NULL (predicate over a NULL column) must keep the matched row."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [("a", 1), ("b", 2)], "k string, v long"
        ).coalesce(1)
    )
    src = spark.createDataFrame(
        [("a", None), ("b", 99)],
        "k string, v long",
    )
    # s.v = 99 is NULL for k='a' (s.v NULL) — 'a' must survive, updated
    merge_into(
        spark, t, src, on=["k"],
        matched_update="all", matched_delete="s.v = 99",
    )
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == {"a": None}  # 'b' deleted, 'a' kept (updated to NULL)


def test_cardinality_check_catches_null_key_multimatch(spark, tmp_path):
    """Validation must use the same null-safe join as the merge itself:
    one NULL-keyed source row matching two NULL-keyed target rows is
    ambiguous and must raise, not apply the update to both."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [(None, 1), (None, 2), ("b", 3)], "k string, v long"
        ).coalesce(1)
    )
    src = spark.createDataFrame([(None, 99)], "k string, v long")
    with pytest.raises(MergeCardinalityError):
        merge_into(spark, t, src, on=["k"], matched_update="all")
