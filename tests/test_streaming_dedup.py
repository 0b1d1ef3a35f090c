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


def test_streaming_upsert_carries_untouched_files(spark, tmp_path):
    """A micro-batch whose keys live in none of the state files must not
    rewrite them: snapshot N+1 carries every snapshot-N file by
    reference (same inode/mtime) and only adds the new keys' files."""
    import os

    from pyspark.sql import functions as F

    from binlog_processer_spark.functions.parse import serialize_expr
    from binlog_processer_spark.sources.generator import (
        generate_corpus,
        routing_dim,
    )
    from binlog_processer_spark.streaming.upsert import run_streaming_upsert

    corpus = generate_corpus(spark, 200, partitions=2)
    raw = corpus.select("source", serialize_expr().alias("raw"))
    d = str(tmp_path / "stream")
    # two stream files with DISJOINT sources -> disjoint (db, table) keys
    raw.filter(F.col("source") == "src0").select("raw").coalesce(1).write.mode(
        "append"
    ).parquet(d + "/raw")
    raw.filter(F.col("source") != "src0").select("raw").coalesce(1).write.mode(
        "append"
    ).parquet(d + "/raw")

    table = run_streaming_upsert(
        spark, d + "/raw", routing_dim(spark), d + "/out",
        max_files_per_trigger=1,
    )
    assert table.current_snapshot() == 1  # two commits
    f0 = set(table.data_files(0))
    f1 = set(table.data_files(1))
    assert f0 and f0 <= f1, "batch 2 must carry batch 1's files untouched"
    for p in f0:
        assert os.path.exists(p)
    # and the merged table equals batch final_state over the whole corpus
    from binlog_processer_spark.operators import aggregate as agg
    from binlog_processer_spark.operators.enrich import enrich_routing
    from binlog_processer_spark.operators.route import (
        filter_system_schemas,
        split_ignored,
    )

    enriched = enrich_routing(
        corpus.withColumn(
            "table_key",
            F.concat_ws("#", F.col("source"), F.col("bucket").cast("string")),
        ),
        routing_dim(spark),
    )
    kept, _ = split_ignored(filter_system_schemas(enriched))
    want = {
        (r.database_name, r.table_name, r.doc_id): (r.final_op, r.final_seq)
        for r in agg.final_state(kept).collect()
    }
    got = {
        (r.database_name, r.table_name, r.doc_id): (r.final_op, r.final_seq)
        for r in table.read(spark).collect()
    }
    assert got == want


def test_expire_tombstones_file_scoped(spark, tmp_path):
    """Tombstones at/below the low-water mark are dropped; live rows and
    newer tombstones survive; files with no expirable tombstone are
    carried by reference (never rewritten); a no-op call commits
    nothing."""
    from binlog_processer_spark.storage.table import SnapshotTable
    from binlog_processer_spark.streaming.upsert import expire_tombstones

    schema = (
        "database_name string, table_name string, doc_id string, "
        "final_op string, final_ts timestamp, final_tokens array<int>, "
        "final_seq bigint"
    )
    ts = datetime.datetime(2024, 1, 1, 10, 0, 0)
    # file A: one live row + one OLD tombstone (expirable at mark 10)
    file_a = [
        ("db", "t", "d1", "Update", ts, [1], 8),
        ("db", "t", "d2", "Delete", ts, None, 5),
    ]
    # file B: one live row + one NEW tombstone (above the mark)
    file_b = [
        ("db", "t", "d3", "Create", ts, [2], 30),
        ("db", "t", "d4", "Delete", ts, None, 20),
    ]
    t = SnapshotTable(str(tmp_path / "state"))
    t.write(
        spark.createDataFrame(file_a, schema).coalesce(1),
        mode="overwrite",
        bloom_columns=["doc_id", "final_op"],
        stats_columns=["final_seq"],
    )
    t.rewrite_files([], spark.createDataFrame(file_b, schema).coalesce(1))
    files_before = set(t.data_files())
    file_a_paths = set(t.data_files(0))
    assert len(files_before) == 2 and len(file_a_paths) == 1

    # expiry planning: file B's final_seq zone map ([20, 30] vs mark 10)
    # prunes it before any data is read — only file A is a candidate
    cand = t.prune_files(
        {"final_op": ("Delete", "Delete"), "final_seq": (None, 10)}
    )
    assert {str(t._join(p)) for p in cand} == file_a_paths

    snap = expire_tombstones(spark, t, low_water_seq=10)
    assert snap == t.current_snapshot() == 2
    got = {
        r.doc_id: (r.final_op, r.final_seq)
        for r in t.read(spark).collect()
    }
    # d2's tombstone (seq 5 <= 10) expired; d4's (seq 20 > 10) kept
    assert got == {
        "d1": ("Update", 8),
        "d3": ("Create", 30),
        "d4": ("Delete", 20),
    }
    # file B held no expirable tombstone -> carried by reference
    file_b_paths = files_before - file_a_paths
    assert file_b_paths <= set(t.data_files())
    # file A was rewritten (old path dropped from the manifest)
    assert not (file_a_paths & set(t.data_files()))

    # nothing left at/below the mark -> no-op, no new snapshot
    assert expire_tombstones(spark, t, low_water_seq=10) == 2
    assert t.current_snapshot() == 2
