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
