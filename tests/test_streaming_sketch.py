"""Streaming HLL (streaming/sketch_stream.py): the per-micro-batch
register fold must reproduce the batch sketch bit-for-bit."""

import numpy as np

import pyspark.sql.functions as F

from binlog_processer_spark.operators.sketch import hll_distinct
from binlog_processer_spark.streaming.sketch_stream import (
    streaming_hll_distinct,
)


def test_streaming_fold_equals_batch_sketch(spark, tmp_path):
    rng = np.random.default_rng(3)
    rows = [
        (f"s{i % 2}", rng.integers(0, 4000, size=30).tolist())
        for i in range(300)
    ]
    kept = spark.createDataFrame(rows, "source string, tokens array<int>")
    raw_dir = str(tmp_path / "raw")
    # encode each row as "source|csv-tokens" so the stream carries ONE
    # string column and to_kept rebuilds the kept relation exactly
    kept.select(
        F.concat_ws(
            "|",
            F.col("source"),
            F.concat_ws(",", F.col("tokens").cast("array<string>")),
        ).alias("raw")
    ).repartition(3).write.mode("overwrite").parquet(raw_dir)

    def to_kept(batch):
        return batch.select(
            F.substring_index("raw", "|", 1).alias("source"),
            F.split(F.substring_index("raw", "|", -1), ",")
            .cast("array<int>")
            .alias("tokens"),
        )

    streamed = streaming_hll_distinct(
        spark, raw_dir, to_kept, b=8, max_files_per_trigger=1
    ).collect()
    batch = (
        hll_distinct(kept, b=8, with_exact=False).orderBy("source").collect()
    )
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]
    # the drain really was multi-batch: 3 input files, 1 per trigger
    import glob

    assert len(glob.glob(raw_dir + "/part-*")) == 3


def test_streaming_quantiles_equals_batch_sketch(spark, tmp_path):
    """The per-batch sample merge (union + re-truncate) must reproduce
    the one-shot batch quantile sketch bit-for-bit."""
    from binlog_processer_spark.operators.sketch import (
        kmv_sample_quantiles,
    )
    from binlog_processer_spark.streaming.sketch_stream import (
        streaming_quantiles,
    )

    rows = [
        (f"s{i % 2}", i, (i * 37) % 211 + 1)
        for i in range(400)
    ]
    kept = spark.createDataFrame(
        rows, "source string, event_seq bigint, n_tok int"
    )
    raw_dir = str(tmp_path / "rawq")
    kept.select(
        F.concat_ws(
            "|",
            F.col("source"),
            F.col("event_seq").cast("string"),
            F.col("n_tok").cast("string"),
        ).alias("raw")
    ).repartition(4).write.mode("overwrite").parquet(raw_dir)

    def to_kept(batch):
        p = F.split(F.col("raw"), "\\|")
        return batch.select(
            p.getItem(0).alias("source"),
            p.getItem(1).cast("bigint").alias("event_seq"),
            p.getItem(2).cast("int").alias("n_tok"),
        )

    streamed = streaming_quantiles(
        spark, raw_dir, to_kept, k=32, qs=(50, 95), max_files_per_trigger=1
    ).collect()
    batch = (
        kmv_sample_quantiles(kept, k=32, qs=(50, 95), with_exact=False)
        .orderBy("source")
        .collect()
    )
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]


def test_streaming_cms_equals_batch_counters(spark, tmp_path):
    """Addition-merged per-batch CMS counters must reproduce the batch
    counter table bit-for-bit."""
    from binlog_processer_spark.operators.sketch import cms_counters
    from binlog_processer_spark.streaming.sketch_stream import (
        streaming_cms_counters,
    )

    rng = np.random.default_rng(7)
    rows = [
        (f"s{i % 2}", rng.integers(0, 500, size=20).tolist())
        for i in range(200)
    ]
    kept = spark.createDataFrame(rows, "source string, tokens array<int>")
    raw_dir = str(tmp_path / "rawc")
    kept.select(
        F.concat_ws(
            "|",
            F.col("source"),
            F.concat_ws(",", F.col("tokens").cast("array<string>")),
        ).alias("raw")
    ).repartition(3).write.mode("overwrite").parquet(raw_dir)

    def to_kept(batch):
        return batch.select(
            F.substring_index("raw", "|", 1).alias("source"),
            F.split(F.substring_index("raw", "|", -1), ",")
            .cast("array<int>")
            .alias("tokens"),
        )

    streamed = streaming_cms_counters(
        spark, raw_dir, to_kept, depth=3, width=64, max_files_per_trigger=1
    ).collect()
    batch = (
        cms_counters(kept, depth=3, width=64)
        .orderBy("row", "bucket")
        .collect()
    )
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]
