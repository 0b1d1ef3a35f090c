"""Merge-on-read equality deletes (Iceberg v2 semantics): delete files,
sequence-scoped application, materialization, CDF visibility, expiry."""

import pytest
from pyspark.sql import functions as F

from binlog_processer_spark.storage.changes import table_changes
from binlog_processer_spark.storage.table import SnapshotTable


def _t(spark, tmp_path, n=100):
    t = SnapshotTable(str(tmp_path / "t"))
    t.write(
        spark.range(0, n).select(
            "id",
            (F.col("id") % 4).cast("string").alias("k"),
            (F.col("id") * 10).alias("v"),
        )
    )
    return t


def _ids(spark, t, snapshot=None):
    return sorted(r.id for r in t.read(spark, snapshot).collect())


def test_delete_roundtrip_and_time_travel(spark, tmp_path):
    t = _t(spark, tmp_path)
    pre = t.current_snapshot()
    keys = spark.range(0, 100).filter(F.col("id") % 7 == 3).select("id")
    snap = t.write_deletes(keys, ["id"])
    assert snap > pre
    got = _ids(spark, t)
    assert got == [i for i in range(100) if i % 7 != 3]
    # no data file was touched: inventory identical, mode is 'delete'
    assert t.data_files(snap) == t.data_files(pre)
    assert t._manifest(snap)["mode"] == "delete"
    # time travel to the parent still serves every row
    assert _ids(spark, t, pre) == list(range(100))


def test_sequence_scoping_reappend_survives(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write_deletes(spark.createDataFrame([(5,), (6,)], "id bigint"))
    # re-append id=5 AFTER the delete: the delete must not kill it
    t.write(
        spark.createDataFrame([(5, "1", 999)], "id bigint, k string, v bigint"),
        mode="append",
    )
    rows = {(r.id, r.v) for r in t.read(spark).filter("id in (5, 6)").collect()}
    assert rows == {(5, 999)}
    # a SECOND delete of id=5 kills the re-appended row too (max-seq scoping)
    t.write_deletes(spark.createDataFrame([(5,)], "id bigint"))
    assert t.read(spark).filter("id = 5").count() == 0


def test_deletes_accumulate_and_append_carries_them(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write_deletes(spark.createDataFrame([(1,)], "id bigint"))
    t.write_deletes(spark.createDataFrame([(2,)], "id bigint"))
    t.write(
        spark.range(100, 110).select(
            "id", F.lit("x").alias("k"), (F.col("id") * 10).alias("v")
        ),
        mode="append",
    )
    got = _ids(spark, t)
    assert got == [i for i in range(100) if i not in (1, 2)] + list(
        range(100, 110)
    )
    assert len(t._manifest(t.current_snapshot())["delete_files"]) >= 2


def test_materialize_folds_debt_and_preserves_rows(spark, tmp_path):
    t = _t(spark, tmp_path)
    first_files = set(t.data_files())
    t.write(
        spark.range(100, 150).select(
            "id", F.lit("x").alias("k"), (F.col("id") * 10).alias("v")
        ),
        mode="append",
    )
    t.write_deletes(
        spark.range(0, 150).filter(F.col("id") % 11 == 0).select("id")
    )
    before = _ids(spark, t)
    snap = t.materialize_deletes(spark)
    assert _ids(spark, t) == before
    m = t._manifest(snap)
    assert not m.get("delete_files")
    # idempotent: a second materialize is a no-op returning current
    assert t.materialize_deletes(spark) == snap
    # every pre-delete file was rewritten (none of the old paths survive)
    assert not (first_files & set(t.data_files()))


def test_materialize_skips_files_newer_than_every_delete(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.write_deletes(spark.createDataFrame([(3,)], "id bigint"))
    t.write(
        spark.range(200, 220).select(
            "id", F.lit("y").alias("k"), (F.col("id") * 10).alias("v")
        ),
        mode="append",
    )
    post_delete_files = {
        f for f in t.data_files() if "/snap-2/" in f or f.rsplit("/", 2)[0].endswith("snap-2")
    }
    t.materialize_deletes(spark)
    # files appended after the last delete are carried by reference
    assert post_delete_files <= set(t.data_files())
    assert 3 not in _ids(spark, t)


def test_cdf_sees_mor_delete_commit(spark, tmp_path):
    t = _t(spark, tmp_path, n=20)
    pre = t.current_snapshot()
    t.write_deletes(spark.createDataFrame([(4,), (9,)], "id bigint"))
    ch = table_changes(spark, t, since=pre).collect()
    got = {(r.id, r._change_type) for r in ch}
    assert got == {(4, "delete"), (9, "delete")}
    # and the reverse direction of history still balances: no changes
    # between a snapshot and itself
    assert table_changes(spark, t, since=t.current_snapshot()).count() == 0


def test_expire_keeps_live_delete_files(spark, tmp_path):
    t = _t(spark, tmp_path, n=30)
    t.write_deletes(spark.createDataFrame([(7,)], "id bigint"))
    # push history: two more commits so the delete commit leaves the
    # kept window while its delete files stay referenced by the head
    t.write(
        spark.createDataFrame([(100, "z", 0)], "id bigint, k string, v bigint"),
        mode="append",
    )
    t.write(
        spark.createDataFrame([(101, "z", 0)], "id bigint, k string, v bigint"),
        mode="append",
    )
    t.expire_snapshots(keep_last=2)
    got = _ids(spark, t)
    assert 7 not in got and 100 in got and 101 in got


def test_write_deletes_validates_key_cols(spark, tmp_path):
    t = _t(spark, tmp_path, n=10)
    with pytest.raises(ValueError):
        t.write_deletes(spark.createDataFrame([(1,)], "nope bigint"))
    with pytest.raises(ValueError):
        t.write_deletes(spark.range(1), key_cols=[])


def test_delete_join_is_anti_join_and_clean_tables_pay_nothing(
    spark, tmp_path
):
    t = _t(spark, tmp_path)
    plan = (
        t.read(spark)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Anti" not in plan  # no delete debt -> no join at all
    t.write_deletes(spark.createDataFrame([(1,)], "id bigint"))
    plan = t.read(spark)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "__mor_seq__" not in [
        f.name for f in t.read(spark).schema.fields
    ]


def test_null_keys_match_null_safe(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "nt"))
    t.write(
        spark.createDataFrame(
            [(1, "a"), (2, None), (3, "c")], "id bigint, k string"
        )
    )
    t.write_deletes(
        spark.createDataFrame([(None,)], "k string"), key_cols=["k"]
    )
    assert sorted(r.id for r in t.read(spark).collect()) == [1, 3]
