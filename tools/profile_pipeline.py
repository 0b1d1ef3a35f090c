"""Phase-timing profile of the batch pipeline (tools-only, not shipped).

Mirrors plans/pipeline.py phase-for-phase with wall-clock marks.
Usage: python tools/profile_pipeline.py <cpus> <n_docs>
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from binlog_processer_spark.functions.parse import (
    parse_raw,
    serialize_expr,
    split_quarantine,
)
from binlog_processer_spark.operators import aggregate as agg
from binlog_processer_spark.operators.enrich import enrich_routing
from binlog_processer_spark.operators.route import PARTITION_COLS, route
from binlog_processer_spark.session import get_spark
from binlog_processer_spark.sources.generator import generate_corpus, routing_dim
from binlog_processer_spark.storage.table import SnapshotTable


def main() -> None:
    cpus, n_docs = int(sys.argv[1]), int(sys.argv[2])
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="blp_prof_", dir=shm)
    spark = get_spark(
        f"prof-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.local.dir": os.path.join(tmp, "spark_local")},
    )

    def mark(name, t0):
        print(f"  {name}: {time.time() - t0:.2f}s", flush=True)

    try:
        raw_path = os.path.join(tmp, "raw")
        (
            generate_corpus(spark, n_docs, partitions=64)
            .select(serialize_expr().alias("raw"))
            .write.mode("overwrite")
            .parquet(raw_path)
        )
        raw = spark.read.parquet(raw_path)
        raw.count()

        T0 = time.time()
        t = time.time()
        parsed = parse_raw(raw).persist(StorageLevel.MEMORY_AND_DISK)
        parsed.count()
        mark("parse+persist", t)

        good, quarantine = split_quarantine(parsed)
        good = good.withColumn(
            "table_key",
            F.concat_ws("#", F.col("source"), F.col("bucket").cast("string")),
        )
        enriched = enrich_routing(good, routing_dim(spark))
        routed, _ign = route(enriched, cluster_for_write=True)
        routed = routed.select(
            "tree", "db_instance", "database_name", "table_name",
            "part_month", "part_date", "doc_id", "op", "event_seq",
            "commit_ts", "create_ts", "file_id", "source", "img",
        )
        t = time.time()
        tbl = SnapshotTable(os.path.join(tmp, "out", "routed"))
        tbl.write(routed, partition_by=PARTITION_COLS, mode="overwrite")
        mark("route+write", t)

        t = time.time()
        committed = tbl.read(spark)
        sc, wm, hist, lineage, base = agg.single_pass_rollups(committed)
        sc.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "o1"))
        wm.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "o2"))
        hist.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "o3"))
        rows = lineage.collect()
        base.unpersist()
        mark("rollups", t)

        t = time.time()
        quarantine.count()
        mark("quarantine_cnt", t)
        print(f"TOTAL {time.time() - T0:.2f}s cpus={cpus} docs={n_docs} "
              f"lineage_rows={len(rows)}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
