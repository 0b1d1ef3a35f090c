"""Streaming pipeline (AvailableNow + foreachBatch + stateful op) and
multimodal binary-column plumbing."""

import pytest
from pyspark.sql import functions as F

from binlog_processer_spark.functions.parse import parse_raw, serialize_expr, split_quarantine
from binlog_processer_spark.multimodal import (
    extract_features,
    frame_sample_plan,
    synthesize_media,
)
from binlog_processer_spark.operators import aggregate as agg
from binlog_processer_spark.operators.enrich import enrich_routing
from binlog_processer_spark.operators.route import route
from binlog_processer_spark.sources.generator import generate_corpus, routing_dim
from binlog_processer_spark.streaming.stateful import stateful_running_counts
from binlog_processer_spark.streaming.stream_pipeline import (
    merged_stream_counts,
    run_streaming_pipeline,
    streaming_running_counts,
)


def _write_raw(spark, tmp_path, n=120, files=1):
    raw = generate_corpus(spark, n, partitions=4).select(
        serialize_expr().alias("raw")
    )
    path = str(tmp_path / "raw")
    raw.coalesce(files).write.mode("overwrite").parquet(path)
    return path


def test_streaming_equals_batch_counts(spark, tmp_path):
    raw_dir = _write_raw(spark, tmp_path)
    table = run_streaming_pipeline(
        spark, raw_dir, routing_dim(spark), str(tmp_path / "out")
    )
    got = {
        (r.tree, r.database_name, r.table_name, str(r.part_date)): (
            r.insert_cnt, r.update_cnt, r.delete_cnt)
        for r in merged_stream_counts(spark, table).collect()
    }
    good, _ = split_quarantine(parse_raw(spark.read.parquet(raw_dir)))
    good = good.withColumn(
        "table_key", F.concat_ws("#", "source", F.col("bucket").cast("string"))
    )
    routed, _ = route(enrich_routing(good, routing_dim(spark)))
    exp = {
        (r.tree, r.database_name, r.table_name, str(r.part_date)): (
            r.insert_cnt, r.update_cnt, r.delete_cnt)
        for r in agg.sink_counts(routed).collect()
    }
    assert got == exp


def test_streaming_running_aggregation(spark, tmp_path):
    raw_dir = _write_raw(spark, tmp_path)
    out = streaming_running_counts(spark, raw_dir, query_name="t_run_counts")
    rows = out.collect()
    assert sum(r.cnt for r in rows) > 0
    batch_total = spark.read.parquet(raw_dir).count()
    assert sum(r.cnt for r in rows) == batch_total  # no malformed rows here


def test_stateful_counts_across_batches(spark, tmp_path):
    raw_dir = _write_raw(spark, tmp_path, files=2)
    raw = (
        spark.readStream.schema("raw string")
        .option("maxFilesPerTrigger", 1)
        .parquet(raw_dir)
    )
    good, _ = split_quarantine(parse_raw(raw))
    out = stateful_running_counts(good)
    q = (
        out.writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits one row per source per batch; the LAST emission per
    # source holds the accumulated totals
    final = (
        spark.table("t_stateful")
        .groupBy("source")
        .agg(
            F.max("insert_cnt").alias("i"),
            F.max("update_cnt").alias("u"),
            F.max("delete_cnt").alias("d"),
        )
    )
    got = {r.source: r.i + r.u + r.d for r in final.collect()}
    exp = {
        r.source: r.cnt
        for r in parse_raw(spark.read.parquet(raw_dir))
        .filter("status = 'OK'")
        .groupBy("source")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == exp


def test_multimodal_features_fake(spark):
    docs = spark.createDataFrame(
        [(1, "hello world", "en", "s"), (2, "", "en", "s")],
        "doc_id bigint, text string, lang string, source string",
    )
    media = synthesize_media(docs)
    feats = {r.doc_id: r for r in extract_features(media, fake=True).collect()}
    assert feats[1].n_bytes == len("hello world")
    assert feats[1].checksum == sum(b"hello world")
    assert len(feats[1].feat) == 4
    assert abs(sum(feats[1].feat) - 1.0) < 1e-5
    assert feats[2].n_bytes == 0 and feats[2].checksum == 0


def test_multimodal_real_decode_is_stubbed(spark):
    docs = spark.createDataFrame(
        [(1, "x", "en", "s")],
        "doc_id bigint, text string, lang string, source string",
    )
    with pytest.raises(Exception, match="NotImplementedError|real decode"):
        extract_features(synthesize_media(docs), fake=False).collect()


def test_frame_sample_plan(spark):
    docs = spark.createDataFrame(
        [(2, "abcdefghijklmnopqrstuvwxyz0123456789", "en", "s")],
        "doc_id bigint, text string, lang string, source string",
    )
    media = synthesize_media(docs)  # doc 2 % 3 == 2 → 'video'
    frames = frame_sample_plan(media, every_n=10).collect()
    assert len(frames) == 1
    assert len(frames[0].frames) >= 3


def test_streaming_windowed_append_emits_closed_windows_once(spark, tmp_path):
    """Append-mode event-time windows + watermark (streaming/windowed.py):
    a window emits EXACTLY ONCE, when the watermark passes its end; windows
    the final watermark has not closed are withheld. (Spark's late-data
    drop is best-effort state cleanup, not a semantic guarantee — a late
    row whose window still gets state IS aggregated, so the test asserts
    the guaranteed contract, not drops.)"""
    import glob
    import os
    import shutil
    import time as _time

    from pyspark.sql import functions as F

    from binlog_processer_spark.streaming.windowed import (
        windowed_op_counts_stream,
    )

    d = str(tmp_path / "wstream")
    os.makedirs(d + "/raw")
    ev = "source string, op string, commit_ts timestamp"

    def mk(rows):
        return spark.createDataFrame(
            rows, "source string, op string, commit_ts string"
        ).select("source", "op", F.col("commit_ts").cast("timestamp"))

    batches = [
        [("s", "Create", "2024-01-05 10:00:00"),
         ("s", "Update", "2024-01-05 11:00:00")],
        [("s", "Create", "2024-01-01 00:00:00"),   # late (allowed to aggregate)
         ("s", "Delete", "2024-01-05 12:00:00")],
        [("s", "Create", "2024-01-10 00:00:00")],  # advances watermark past Jan-6
    ]
    now = _time.time()
    for i, rows in enumerate(batches):
        tmp = d + f"/tmp{i}"
        mk(rows).coalesce(1).write.parquet(tmp)
        dst = d + f"/raw/b{i}.parquet"
        shutil.move(glob.glob(tmp + "/part-*.parquet")[0], dst)
        t = now - (len(batches) - 1 - i) * 120
        os.utime(dst, (t, t))  # file source orders by mtime: b0 -> b1 -> b2

    src = (
        spark.readStream.schema(ev)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/raw")
    )
    out = windowed_op_counts_stream(src, window="1 day", watermark="2 hours")
    sq = (
        out.writeStream.format("memory")
        .queryName("q_watermark_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    rows = {
        str(r.win_start): r for r in spark.table("q_watermark_test").collect()
    }
    # each closed window emitted exactly once, with complete counts
    assert len(rows) == len(spark.table("q_watermark_test").collect())
    w5 = rows["2024-01-05 00:00:00"]
    assert (w5.insert_cnt, w5.update_cnt, w5.delete_cnt) == (1, 1, 1)
    # the Jan-10 window is still open at the final watermark (Jan-9 22:00)
    # and must be withheld by append mode
    assert "2024-01-10 00:00:00" not in rows
    # watermark advanced across micro-batches (state actually bounded)
    wm = sq.recentProgress[-1]["eventTime"].get("watermark", "")
    assert wm.startswith("2024-01-09")


def test_resize_plan_aspect_and_passthrough(spark):
    from binlog_processer_spark.multimodal import resize_plan, synthesize_media

    docs = spark.createDataFrame(
        # doc_id%3==0 -> image; widths/heights from doc_id arithmetic
        [(0, "x" * 4000), (3, "y" * 10), (6, "z" * 2000)],
        "doc_id bigint, text string",
    )
    media = synthesize_media(docs)
    got = {r.doc_id: r for r in resize_plan(media, max_dim=100).collect()}
    for r in got.values():
        assert r.modality == "image"
        if max(r.src_width, r.src_height) <= 100:
            assert (r.dst_width, r.dst_height) == (r.src_width, r.src_height)
        else:
            assert max(r.dst_width, r.dst_height) <= 100
            # aspect preserved within integer floor
            assert abs(
                r.dst_width / r.dst_height - r.src_width / r.src_height
            ) < 0.1
            assert 0 < len(r.payload) <= 4000


def test_resize_plan_real_path_raises_without_pil_or_works(spark):
    from binlog_processer_spark.multimodal import resize_plan, synthesize_media

    docs = spark.createDataFrame([(0, "x" * 500)], "doc_id bigint, text string")
    try:
        import PIL  # noqa: F401
        import pytest

        pytest.skip("PIL present: the real path would need real image bytes")
    except ImportError:
        pass
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError)) as ei:
        resize_plan(
            synthesize_media(docs), max_dim=8, fake=False
        ).collect()
    assert "NotImplementedError" in str(ei.value) or "PIL" in str(ei.value)
