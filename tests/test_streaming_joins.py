import datetime


SCHEMA_E = (
    "database_name string, table_name string, doc_id string, "
    "event_seq long, commit_ts timestamp"
)
SCHEMA_A = (
    "database_name string, table_name string, doc_id string, "
    "event_seq long, ack_ts timestamp"
)


def _t(minute, second=0):
    return datetime.datetime(2024, 1, 1, 10, minute, second)


def test_ack_lag_join_cross_batch(spark, tmp_path):
    """Interval-join semantics across micro-batches: an ack arriving a
    batch AFTER its event still attributes (join state carries it);
    an ack outside the lag window never does; an ack with no event
    never does."""
    from binlog_processer_spark.streaming.joins import ack_lag_join_stream

    ed, ad = str(tmp_path / "events"), str(tmp_path / "acks")
    ef1 = [("db", "t", "d1", 1, _t(0)), ("db", "t", "d2", 2, _t(1))]
    ef2 = [("db", "t", "d3", 3, _t(2))]
    af1 = [("db", "t", "d1", 1, _t(3))]  # lag 180 s — in window
    af2 = [
        ("db", "t", "d2", 2, _t(7)),  # lag 360 s > 300 — dropped
        ("db", "t", "d2", 2, _t(5)),  # lag 240 s — CROSS-BATCH match
        ("db", "t", "d3", 3, _t(4)),  # lag 120 s — in window
        ("db", "t", "d9", 9, _t(4)),  # no such event — dropped
    ]
    for rows, schema, d in [
        (ef1, SCHEMA_E, ed), (af1, SCHEMA_A, ad),
    ]:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)
    for rows, schema, d in [
        (ef2, SCHEMA_E, ed), (af2, SCHEMA_A, ad),
    ]:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    ev = (
        spark.readStream.schema(SCHEMA_E)
        .option("maxFilesPerTrigger", 1)
        .parquet(ed)
    )
    ak = (
        spark.readStream.schema(SCHEMA_A)
        .option("maxFilesPerTrigger", 1)
        .parquet(ad)
    )
    out = ack_lag_join_stream(ev, ak, max_lag_min=5)
    q = (
        out.writeStream.format("memory")
        .queryName("t_ack_lag")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.doc_id, r.event_seq): r.lag_s
        for r in spark.table("t_ack_lag").collect()
    }
    assert got == {("d1", 1): 180, ("d2", 2): 240, ("d3", 3): 120}


def test_ack_lag_left_outer_heartbeat_flush(spark, tmp_path):
    """Left-outer arm: unacked events (no ack, or ack outside the lag
    window) emit with null ack columns once trailing watermark-heartbeat
    batches close their join windows. Each heartbeat pair matches itself
    at lag 0, so sentinels only ever emit as matched rows — never as
    unacked — and are filtered out."""
    import time

    from binlog_processer_spark.streaming.joins import ack_lag_join_stream

    ed, ad = str(tmp_path / "events"), str(tmp_path / "acks")
    hb1, hb2 = datetime.datetime(2024, 1, 2, 10), datetime.datetime(
        2024, 1, 3, 10
    )
    ev = [
        ("db", "t", "d1", 1, _t(0)),   # acked in window
        ("db", "t", "d2", 2, _t(1)),   # never acked
        ("db", "t", "d3", 3, _t(2)),   # ack 6 min late — out of window
        ("db", "t", "d9", 9, _t(40)),  # acked in window, late event
    ]
    ak = [
        ("db", "t", "d1", 1, _t(3)),
        ("db", "t", "d3", 3, _t(8)),
        ("db", "t", "d9", 9, _t(41)),
    ]
    spark.createDataFrame(ev, SCHEMA_E).coalesce(1).write.mode(
        "append"
    ).parquet(ed)
    spark.createDataFrame(ak, SCHEMA_A).coalesce(1).write.mode(
        "append"
    ).parquet(ad)
    for hb in (hb1, hb2):
        time.sleep(1.1)  # file-stream orders by mtime; keep hb batches last
        spark.createDataFrame(
            [("__wm__", "__wm__", "__wm__", -1, hb)], SCHEMA_E
        ).coalesce(1).write.mode("append").parquet(ed)
        spark.createDataFrame(
            [("__wm__", "__wm__", "__wm__", -1, hb)], SCHEMA_A
        ).coalesce(1).write.mode("append").parquet(ad)

    ev_s = (
        spark.readStream.schema(SCHEMA_E)
        .option("maxFilesPerTrigger", 1)
        .parquet(ed)
    )
    ak_s = (
        spark.readStream.schema(SCHEMA_A)
        .option("maxFilesPerTrigger", 1)
        .parquet(ad)
    )
    out = ack_lag_join_stream(ev_s, ak_s, max_lag_min=5, how="left_outer")
    q = (
        out.writeStream.format("memory")
        .queryName("t_ack_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("t_ack_outer").collect()
    # sentinels pair with themselves at lag 0 (eager inner emission);
    # they must never surface as UNACKED rows
    assert all(r.lag_s == 0 for r in rows if r.doc_id == "__wm__")
    got = {
        (r.doc_id, r.event_seq): r.lag_s
        for r in rows
        if r.doc_id != "__wm__"
    }
    assert got == {
        ("d1", 1): 180,
        ("d2", 2): None,
        ("d3", 3): None,
        ("d9", 9): 60,
    }
