"""Reconciliation + repair: injected mutations produce exactly the expected
finding classes (TiDBCompareByFile.java:156-229 semantics); repair restores
the replica to the routed truth; clean replica → zero findings."""

import datetime

from pyspark.sql import functions as F

from binlog_processer_spark.operators.aggregate import final_state
from binlog_processer_spark.operators.repair import repair
from binlog_processer_spark.operators.verify import reconcile

TS = datetime.datetime(2024, 1, 2)
EV = (
    "database_name string, table_name string, doc_id string, event_seq bigint,"
    " op string, commit_ts timestamp, tokens array<int>"
)


def _events(spark):
    rows = [
        # doc a: Create then Update → final Update
        ("db", "t", "a", 1, "Create", TS, [1]),
        ("db", "t", "a", 2, "Update", TS + datetime.timedelta(minutes=5), [2]),
        # doc b: Create only
        ("db", "t", "b", 3, "Create", TS, [3]),
        # doc c: Create then Delete → final Delete
        ("db", "t", "c", 4, "Create", TS, [4]),
        ("db", "t", "c", 5, "Delete", TS + datetime.timedelta(minutes=1), [4]),
        # doc d: Update only
        ("db", "t", "d", 6, "Update", TS + datetime.timedelta(minutes=9), [5]),
    ]
    return spark.createDataFrame(rows, EV)


def _replica(spark, rows):
    return spark.createDataFrame(
        rows,
        "database_name string, table_name string, doc_id string,"
        " replica_ts timestamp, replica_tokens array<int>",
    )


def test_clean_replica_zero_findings(spark):
    ev = _events(spark)
    truth = final_state(ev).filter(F.col("final_op") != "Delete")
    replica = truth.select(
        "database_name", "table_name", "doc_id",
        F.col("final_ts").alias("replica_ts"),
        F.col("final_tokens").alias("replica_tokens"),
    )
    assert reconcile(ev, replica).count() == 0


def test_finding_classes(spark):
    ev = _events(spark)
    replica = _replica(
        spark,
        [
            # a present but STALE (older than final Update ts)
            ("db", "t", "a", TS, [2]),
            # b MISSING (no row) → missing_create
            # c still present → ghost_delete
            ("db", "t", "c", TS, [4]),
            # d missing → missing_update
        ],
    )
    got = {(r.doc_id, r.finding) for r in reconcile(ev, replica).collect()}
    assert got == {
        ("a", "stale_update"),
        ("b", "missing_create"),
        ("c", "ghost_delete"),
        ("d", "missing_update"),
    }


def test_repair_restores_truth(spark):
    ev = _events(spark)
    replica = _replica(
        spark, [("db", "t", "a", TS, [2]), ("db", "t", "c", TS, [4])]
    )
    findings = reconcile(ev, replica)
    repaired = repair(ev, replica, findings)
    got = {r.doc_id: (r.replica_ts, list(r.replica_tokens)) for r in repaired.collect()}
    truth = {
        r.doc_id: (r.final_ts, list(r.final_tokens))
        for r in final_state(ev).filter(F.col("final_op") != "Delete").collect()
    }
    assert got == truth
    # idempotence: reconciling the repaired replica finds nothing
    assert reconcile(ev, repaired).count() == 0


def test_repair_commits_replica_snapshot(spark, tmp_path):
    """The repair closes the transaction loop (TransactionOperate.java:29-66):
    the repaired replica is committed as a NEW snapshot of the SAME replica
    table, reconcile-after-repair against the COMMITTED snapshot is clean,
    and the parent snapshot remains rollback-able."""
    from binlog_processer_spark.storage.table import SnapshotTable

    ev = _events(spark)
    tbl = SnapshotTable(str(tmp_path / "replica"))
    snap0 = tbl.write(
        _replica(spark, [("db", "t", "a", TS, [2]), ("db", "t", "c", TS, [4])])
    )

    fs = final_state(ev)
    replica = tbl.read(spark)
    findings = reconcile(None, replica, fs=fs)
    assert findings.count() == 4
    snap1 = tbl.write(repair(None, replica, findings, fs=fs))
    assert snap1 == snap0 + 1
    assert tbl.history()[0]["parent"] == snap0

    # reconcile against the COMMITTED snapshot → zero findings
    assert reconcile(None, tbl.read(spark, snapshot=snap1), fs=fs).count() == 0
    # the broken state is still addressable: rollback → findings reappear
    tbl.rollback(snap0)
    assert reconcile(None, tbl.read(spark), fs=fs).count() == 4
