import datetime


SCHEMA = "source string, doc_id string, event_seq long, commit_ts timestamp"


def _rows(seqs):
    return [
        ("s1", f"d{i}", i, datetime.datetime(2024, 1, 1, 10, 0, i % 60))
        for i in seqs
    ]


def test_dedup_ingest_stream_drops_redelivered(spark, tmp_path):
    from binlog_processer_spark.streaming.dedup import dedup_ingest_stream

    raw = str(tmp_path / "raw")
    # segment 1: events 0..5; segment 2: re-delivery of events 2,3
    spark.createDataFrame(_rows(range(6)), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(raw)
    spark.createDataFrame(_rows([2, 3]), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(raw)

    # maxFilesPerTrigger=1 forces the replay into a LATER micro-batch, so
    # the drop exercises cross-batch dedup state, not in-batch distinct
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw)
    )
    sq = (
        dedup_ingest_stream(stream)
        .writeStream.format("memory")
        .queryName("t_dedup_ingest")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    got = spark.table("t_dedup_ingest")
    assert got.count() == 6
    assert sorted(r.event_seq for r in got.collect()) == list(range(6))


def test_dedup_ingest_stream_keeps_distinct_events(spark, tmp_path):
    from binlog_processer_spark.streaming.dedup import dedup_ingest_stream

    raw = str(tmp_path / "raw")
    spark.createDataFrame(_rows(range(4)), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(raw)
    stream = spark.readStream.schema(SCHEMA).parquet(raw)
    sq = (
        dedup_ingest_stream(stream)
        .writeStream.format("memory")
        .queryName("t_dedup_keep")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    assert spark.table("t_dedup_keep").count() == 4


def test_merge_final_state_monotone_and_idempotent(spark):
    """Out-of-order batches can't regress a key; replaying a batch is a
    no-op; deletes persist as tombstones."""
    from binlog_processer_spark.streaming.upsert import merge_final_state

    schema = (
        "database_name string, table_name string, doc_id string,"
        " final_op string, final_ts timestamp, final_tokens array<int>,"
        " final_seq bigint"
    )
    ts = datetime.datetime(2024, 1, 1)
    cur = spark.createDataFrame(
        [
            ("db", "t", "d1", "Update", ts, [1, 2], 10),
            ("db", "t", "d2", "Delete", ts, [3], 20),
        ],
        schema,
    )
    late = spark.createDataFrame(
        [
            ("db", "t", "d1", "Create", ts, [9], 5),   # older -> ignored
            ("db", "t", "d2", "Create", ts, [8], 7),   # older than tombstone
            ("db", "t", "d3", "Create", ts, [7], 1),   # new key -> inserted
        ],
        schema,
    )
    got = {
        r.doc_id: (r.final_op, r.final_seq, list(r.final_tokens))
        for r in merge_final_state(cur, late).collect()
    }
    assert got == {
        "d1": ("Update", 10, [1, 2]),
        "d2": ("Delete", 20, [3]),     # tombstone survives older Create
        "d3": ("Create", 1, [7]),
    }
    # replay of the CURRENT state is a no-op (>= keeps the batch side,
    # which equals the table side)
    replay = {
        r.doc_id: (r.final_op, r.final_seq)
        for r in merge_final_state(cur, cur).collect()
    }
    assert replay == {"d1": ("Update", 10), "d2": ("Delete", 20)}
