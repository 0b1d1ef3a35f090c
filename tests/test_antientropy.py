"""Merkle-style anti-entropy compare: bucket digests localize divergence,
the drill-down reproduces exactly what a full-table reconcile reports, and
agreeing stores terminate at digest cost (zero suspect buckets)."""

import datetime

import pytest
from pyspark.sql import functions as F

from binlog_processer_spark.operators.aggregate import final_state
from binlog_processer_spark.operators.antientropy import (
    antientropy_reconcile,
    bucket_digests,
    bucket_id,
    diff_buckets,
    expected_replica,
)
from binlog_processer_spark.operators.verify import reconcile

TS = datetime.datetime(2024, 1, 2)
EV = (
    "database_name string, table_name string, doc_id string, event_seq bigint,"
    " op string, commit_ts timestamp, tokens array<int>"
)


def _events(spark, n=40):
    rows = []
    seq = 0
    for i in range(n):
        seq += 1
        rows.append(("db", "t", f"doc{i}", seq, "Create", TS, [i]))
        if i % 3 == 0:
            seq += 1
            rows.append(
                ("db", "t", f"doc{i}", seq, "Update",
                 TS + datetime.timedelta(minutes=i + 1), [i, i]),
            )
        if i % 11 == 10:
            seq += 1
            rows.append(
                ("db", "t", f"doc{i}", seq, "Delete",
                 TS + datetime.timedelta(minutes=i + 2), [i]),
            )
    return spark.createDataFrame(rows, EV)


def _mutate(replica):
    """Inject one of each drift class: drop doc3 (missing), age doc6
    (stale), resurrect nothing here — ghost rows are added by callers."""
    return replica.filter(F.col("doc_id") != "doc3").withColumn(
        "replica_ts",
        F.when(
            F.col("doc_id") == "doc6",
            F.col("replica_ts") - F.expr("make_interval(0,0,0,0,0,30,0)"),
        ).otherwise(F.col("replica_ts")),
    )


def test_agreeing_stores_zero_suspects(spark):
    fs = final_state(_events(spark))
    replica = expected_replica(fs)
    suspects, findings = antientropy_reconcile(fs, replica, n_buckets=16)
    assert suspects.count() == 0
    assert findings.count() == 0


def test_digest_localizes_and_drilldown_matches_full_reconcile(spark):
    fs = final_state(_events(spark)).persist()
    clean = expected_replica(fs)
    replica = _mutate(clean)

    suspects, findings = antientropy_reconcile(fs, replica, n_buckets=16)
    n_suspect = suspects.count()
    # divergence localized: 2 drifted keys touch at most 2 of 16 buckets
    assert 1 <= n_suspect <= 2

    full = reconcile(None, replica, fs=fs)
    key = lambda r: (r.database_name, r.table_name, r.doc_id, r.finding)  # noqa: E731
    assert sorted(map(key, findings.collect())) == sorted(
        map(key, full.collect())
    )
    found = {(r.doc_id, r.finding) for r in findings.collect()}
    assert ("doc3", "missing_update") in found or ("doc3", "missing_create") in found
    assert ("doc6", "stale_update") in found
    fs.unpersist()


def test_bucket_is_key_only_and_digest_is_order_independent(spark):
    fs = final_state(_events(spark))
    rep = expected_replica(fs)
    # same rows, different physical order → identical digests
    a = bucket_digests(rep, ["database_name", "table_name", "doc_id"],
                       [F.unix_micros("replica_ts")], 8)
    b = bucket_digests(
        rep.orderBy(F.col("doc_id").desc()).repartition(3),
        ["database_name", "table_name", "doc_id"],
        [F.unix_micros("replica_ts")], 8,
    )
    assert diff_buckets(a, b).count() == 0
    # a value change moves the digest but NOT the bucket
    drifted = rep.withColumn(
        "replica_ts", F.col("replica_ts") + F.expr("interval 1 minute")
    )
    cols = ["database_name", "table_name", "doc_id"]
    same_bucket = (
        rep.select(bucket_id(cols, 8).alias("b1"), "doc_id")
        .join(
            drifted.select(bucket_id(cols, 8).alias("b2"), "doc_id"),
            "doc_id",
        )
        .filter(F.col("b1") != F.col("b2"))
    )
    assert same_bucket.count() == 0
    c = bucket_digests(drifted, cols, [F.unix_micros("replica_ts")], 8)
    assert diff_buckets(a, c).count() > 0


def test_extra_replica_row_is_a_suspect_bucket(spark):
    fs = final_state(_events(spark)).persist()
    clean = expected_replica(fs)
    ghost = clean.limit(0).union(
        fs.filter(F.col("final_op") == "Delete")
        .select(
            "database_name", "table_name", "doc_id",
            F.col("final_ts").alias("replica_ts"),
        )
    )
    replica = clean.union(ghost)
    suspects, findings = antientropy_reconcile(fs, replica, n_buckets=16)
    assert suspects.count() >= 1
    assert {r.finding for r in findings.collect()} == {"ghost_delete"}
    fs.unpersist()


def test_digest_state_incremental_equals_recompute(spark, tmp_path):
    from binlog_processer_spark.operators.antientropy import digest_state
    from binlog_processer_spark.storage.table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.write(
        spark.range(0, 200).select(
            F.col("id").cast("string").alias("k"), (F.col("id") * 3).alias("v")
        ).repartition(4)
    )
    state = SnapshotTable(str(tmp_path / "dig"))

    def _fresh():
        return bucket_digests(t.read(spark), ["k"], [F.expr("v")], 32)

    # bootstrap: full compute
    d = digest_state(spark, t, state, ["k"], ["v"], 32)
    assert diff_buckets(d, _fresh()).count() == 0
    snap_after_boot = state.current_snapshot()

    # no table change -> served from state, no new state commit
    digest_state(spark, t, state, ["k"], ["v"], 32)
    assert state.current_snapshot() == snap_after_boot

    # append: fold-in only (scans the new files)
    t.write(
        spark.range(200, 260).select(
            F.col("id").cast("string").alias("k"), (F.col("id") * 3).alias("v")
        ),
        mode="append",
    )
    d = digest_state(spark, t, state, ["k"], ["v"], 32)
    assert diff_buckets(d, _fresh()).count() == 0

    # rewrite: update one row, delete another -> fold-out + fold-in
    f = (
        t.read(spark).withColumn("f", F.input_file_name())
        .filter("k = '7'").collect()[0]["f"]
    )
    sub = t.read_files(spark, [f])
    t.rewrite_files(
        [f],
        sub.withColumn(
            "v", F.when(F.col("k") == "7", F.lit(-1)).otherwise(F.col("v"))
        ).filter(F.col("k") != "13"),
    )
    d = digest_state(spark, t, state, ["k"], ["v"], 32)
    assert diff_buckets(d, _fresh()).count() == 0

    # config drift is rejected (digests are comparable only like-for-like)
    with pytest.raises(ValueError):
        digest_state(spark, t, state, ["k"], ["v"], 64)
    with pytest.raises(ValueError):
        digest_state(spark, t, state, ["k"], ["v + 1"], 32)


def test_two_maintained_stores_verify_without_data_scan(spark, tmp_path):
    from binlog_processer_spark.operators.antientropy import digest_state
    from binlog_processer_spark.storage.table import SnapshotTable

    src = SnapshotTable(str(tmp_path / "src"))
    dst = SnapshotTable(str(tmp_path / "dst"))
    rows = spark.range(0, 100).select(
        F.col("id").cast("string").alias("k"), (F.col("id") * 2).alias("v")
    )
    src.write(rows)
    dst.write(rows)
    s_src = SnapshotTable(str(tmp_path / "src_dig"))
    s_dst = SnapshotTable(str(tmp_path / "dst_dig"))
    a = digest_state(spark, src, s_src, ["k"], ["v"], 16)
    b = digest_state(spark, dst, s_dst, ["k"], ["v"], 16)
    assert diff_buckets(a, b).count() == 0  # agree: metadata-only verify

    # dst drifts by one row
    f = (
        dst.read(spark).withColumn("f", F.input_file_name())
        .filter("k = '42'").collect()[0]["f"]
    )
    sub = dst.read_files(spark, [f])
    dst.rewrite_files(
        [f],
        sub.withColumn(
            "v", F.when(F.col("k") == "42", F.lit(0)).otherwise(F.col("v"))
        ),
    )
    b = digest_state(spark, dst, s_dst, ["k"], ["v"], 16)
    sus = diff_buckets(a, b)
    assert sus.count() == 1  # exactly the drifted key's bucket
