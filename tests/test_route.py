"""Routing semantics: ignore filter, soft-delete window, image selection,
dual partition trees (reference: BinlogFileReader.java:188-234,
PartitionWriterManager.java:62-152)."""

import datetime

from pyspark.sql import functions as F

from binlog_processer_spark.operators.route import (
    apply_soft_delete,
    fan_out_trees,
    filter_system_schemas,
    split_ignored,
    with_envelope,
)

TS = datetime.datetime(2024, 1, 2, 3, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "database_name string, table_name string, event_seq bigint, op string,"
        " sign int, doc_id string, tokens array<int>, n_tok int,"
        " commit_ts timestamp, create_ts timestamp, ignored boolean",
    )


def test_system_schema_filter(spark):
    df = _events(
        spark,
        [
            ("mysql", "t", 1, "Create", None, "1", [1], 1, TS, TS, False),
            ("infra", "t", 2, "Create", None, "2", [1], 1, TS, TS, False),
            ("db_a", "t", 3, "Create", None, "3", [1], 1, TS, TS, False),
        ],
    )
    assert [r.database_name for r in filter_system_schemas(df).collect()] == ["db_a"]


def test_ignore_split_counts(spark):
    df = _events(
        spark,
        [
            ("db_a", "t0", 1, "Create", None, "1", [1], 1, TS, TS, False),
            ("db_a", "t3", 2, "Create", None, "2", [1], 1, TS, TS, True),
            ("db_a", "t3", 3, "Update", None, "3", [1], 1, TS, TS, True),
        ],
    )
    kept, ign = split_ignored(df)
    assert kept.count() == 1
    row = ign.collect()[0]
    assert (row.table_name, row.ignored_cnt) == ("t3", 2)


def test_soft_delete_order_dependence(spark):
    """Deletes drop only while the most recent sign event set the flag —
    exact IgnoreStrategy.java:10-30 forward-scan semantics."""
    rows = [
        ("db", "t", 1, "Delete", None, "a", [1], 1, TS, TS, False),  # keep: no flag yet
        ("db", "t", 2, "Create", 1, "b", [1], 1, TS, TS, False),     # sets flag
        ("db", "t", 3, "Delete", None, "c", [1], 1, TS, TS, False),  # dropped
        ("db", "t", 4, "Update", 0, "d", [1], 1, TS, TS, False),     # clears flag
        ("db", "t", 5, "Delete", None, "e", [1], 1, TS, TS, False),  # keep
        ("db2", "t", 6, "Delete", None, "f", [1], 1, TS, TS, False), # other sink: keep
    ]
    out = apply_soft_delete(_events(spark, rows))
    assert sorted(r.event_seq for r in out.collect()) == [1, 2, 4, 5, 6]


def test_image_selection(spark):
    df = _events(
        spark,
        [
            ("db", "t", 1, "Create", None, "c1", [1, 2], 2, TS, TS, False),
            ("db", "t", 2, "Update", None, "u1", [3], 1, TS, TS, False),
            ("db", "t", 3, "Delete", None, "d1", [4], 1, TS, TS, False),
        ],
    )
    env = {r.op: r for r in with_envelope(df).collect()}
    assert env["Create"].before is None and env["Create"].after is not None
    assert env["Update"].before is not None and env["Update"].after is not None
    assert env["Delete"].after is None and env["Delete"].before is not None
    # img = After for C/U, Before for D (PartitionWriterManager.java:141-152)
    assert list(env["Create"].img.tokens) == [1, 2]
    assert list(env["Delete"].img.tokens) == [4]


def test_dual_tree_fanout(spark):
    create_ts = datetime.datetime(2024, 1, 1, 0, 0, 0)
    update_ts = datetime.datetime(2024, 2, 5, 0, 0, 0)
    df = _events(
        spark,
        [("db", "t", 1, "Create", None, "x", [1], 1, update_ts, create_ts, False)],
    )
    out = fan_out_trees(df).select("tree", "part_date").collect()
    got = {(r.tree, str(r.part_date)) for r in out}
    assert got == {("create", "2024-01-01"), ("update", "2024-02-05")}
