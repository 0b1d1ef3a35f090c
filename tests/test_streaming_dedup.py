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
