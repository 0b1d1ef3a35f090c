"""SparkSession factory tuned for the pipeline.

Scale posture (100 TB / 1000-executor design, tested on local[N]):
- AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  replaces the reference's hand-rolled thread-pool sizing
  (binlog-resovler TaskProcessor.java:44-52).
- Arrow on: every Python-side transform is an Arrow-batched pandas UDF
  (never per-row Python), per BASELINE.json input_hint.
- Session timezone pinned UTC so the reference's ±8h CST shifts
  (SchemaData.java:60-68) become explicit expressions, never ambient state.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "binlog-processer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # python workers (pandas UDF subprocesses) must resolve this package; on a
    # real cluster --py-files ships it, in local mode PYTHONPATH covers it
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in os.environ.get("PYTHONPATH", ""):
        os.environ["PYTHONPATH"] = (
            repo_root + os.pathsep + os.environ.get("PYTHONPATH", "")
        )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # snappy + dictionary ON. A zstd/dict-off variant was tried and
        # REVERTED: re-measured A/B on a quiet host at 7.4M routed rows,
        # local[16], the write-heavy pipeline ran 30.1s with snappy+dict vs
        # 50.0s zstd+dict, 35.3s snappy+nodict, 91.4s zstd+nodict — zstd's
        # compressor CPU dominates on token-array payloads, and turning the
        # dictionary off inflates the plain-encoded bytes zstd must chew.
        # On an IO-constrained real cluster the tradeoff may flip; it's one
        # conf key, and the default stays the measured CPU-side winner.
        .config("spark.sql.parquet.compression.codec", "snappy")
        # parity with DuckDB oracle: no legacy rebase surprises on timestamps
        .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
        # INT96 (Spark's legacy default) is deprecated AND writes no footer
        # min/max, which blanks timestamp zone maps (SnapshotTable
        # stats_columns); micros is what Iceberg mandates for v2 tables
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        # v2: tasks move their files into the final dirs at task commit
        # (parallel) instead of a sequential driver-side move at job commit —
        # the fan-out write touches hundreds of partition dirs, so v1's
        # serial rename pass is a fixed multi-second tail on every write.
        # Safe here: every write targets a fresh immutable snap-<n> dir
        # (storage/table.py), so a failed job leaves only an uncommitted dir.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # local mode runs every task thread in the driver JVM: 8g across 16
        # slots leaves ~0.5g/slot — quiet-host A/B at 7.4M routed rows,
        # local[16]: 48.2s at 8g vs 30.1s at 24g (memory-pressure spills,
        # not GC time, carry the cost). A real cluster gives each executor
        # its own heap — size the one local JVM like the sum of a small
        # executor group, not like a driver.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
