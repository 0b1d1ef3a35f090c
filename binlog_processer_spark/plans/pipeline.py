"""End-to-end batch plan: parse → enrich → route → write → aggregate.

This is the Spark restatement of the reference's resolve entry point
(SURVEY.md §3.1, binlog-main BinlogMain.java → TaskProcessor → BinlogFileReader
→ PartitionWriterManager): one linear DataFrame DAG instead of MQ + thread
pools. The raw-event scan + parse + broadcast enrich + routing expressions run
shuffle-free inside one codegen stage; the only shuffles are the soft-delete
window / final aggregates (keyed by sink) and the fan-out write clustering.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parse import parse_raw, split_quarantine
from ..operators import aggregate as agg
from ..operators.enrich import enrich_routing
from ..operators.resume import ProcessedManifest, remaining_events
from ..operators.route import PARTITION_COLS, route
from ..storage.table import SnapshotTable


@dataclass
class PipelineResult:
    metrics: dict = field(default_factory=dict)
    tables: dict = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    raw_df: DataFrame,
    routing_df: DataFrame,
    out_dir: str,
    resume: bool = True,
) -> PipelineResult:
    """raw_df: one `raw` string column (the serialized event log).
    routing_df: broadcast dimension (table_key → sink attributes).
    Writes snapshot tables under out_dir; returns metrics + table handles.
    """
    t0 = time.time()
    manifest = ProcessedManifest(os.path.join(out_dir, "_processed.json"))

    # one physical parse pass feeds both the good path and the quarantine
    # side-output (MEMORY_AND_DISK: spills instead of re-parsing at scale)
    parsed = parse_raw(raw_df).persist(StorageLevel.MEMORY_AND_DISK)
    good, quarantine = split_quarantine(parsed)
    # the wire's (source, bucket) is the TABLE_MAP key (tableId analogue)
    good = good.withColumn(
        "table_key",
        F.concat_ws("#", F.col("source"), F.col("bucket").cast("string")),
    )
    if resume:
        good = remaining_events(good, manifest.load())

    enriched = enrich_routing(good, routing_df)
    routed, ignored_counts = route(enriched)
    # cluster by the write's partition key BEFORE the fan-out write: without
    # this every task touches ~every (tree, db, table, day) dir — O(tasks ×
    # partitions) tiny files and commit storms; with it each partition dir is
    # written by one task (the reference's one-writer-per-sink-path invariant,
    # PartitionWriterManager.java:139-167, recovered at shuffle cost instead
    # of writer-cache cost). AQE coalesces the shuffle to the real key count.
    routed = routed.repartition(*PARTITION_COLS)
    # single scan feeds the write and four aggregates
    routed = routed.persist()
    try:
        tables = {
            name: SnapshotTable(os.path.join(out_dir, name))
            for name in (
                "routed",
                "sink_counts",
                "watermarks",
                "histograms",
                "lineage",
                "quarantine",
            )
        }
        tables["routed"].write(
            routed.select(
                "tree",
                "db_instance",
                "database_name",
                "table_name",
                "part_month",
                "part_date",
                "doc_id",
                "op",
                "event_seq",
                "commit_ts",
                "create_ts",
                "file_id",
                "source",
                "before",
                "after",
                "img",
            ),
            partition_by=PARTITION_COLS,
            mode="overwrite" if not resume else "append",
        )
        # aggregates must reflect the committed table (not just the increment)
        # so a resumed run republishes complete counts — the reference
        # re-derives counts from t_binlog_process_log the same way
        # (BaseDataCompare.java:38-67). On a fresh table the increment IS the
        # table, so reuse the in-memory `routed` and skip the disk rescan.
        fresh = tables["routed"].current_snapshot() == 0
        committed = routed if fresh else tables["routed"].read(spark).persist()
        sink_counts = agg.sink_counts(committed)
        wm = agg.watermarks(committed.filter(F.col("tree") == "update"))
        hist = agg.windowed_histogram(committed.filter(F.col("tree") == "update"))
        lineage = agg.lineage_manifest(committed)

        # aggregate tables are small (per-sink cardinality) — one file each
        tables["sink_counts"].write(sink_counts.coalesce(1))
        tables["watermarks"].write(wm.coalesce(1))
        tables["histograms"].write(hist.coalesce(1))
        # lineage is tiny (one row per file×sink): collect once, reuse for the
        # manifest instead of a second distinct-scan of routed
        lineage_rows = lineage.collect()
        tables["lineage"].write(
            spark.createDataFrame(lineage_rows, lineage.schema)
        )
        if not fresh:
            committed.unpersist()

        n_quarantine = quarantine.count()
        if n_quarantine:
            tables["quarantine"].write(quarantine)

        n_routed = routed.count()
        files_done = sorted({r.file_id for r in lineage_rows})
        manifest.mark(files_done)

        metrics = {
            "rows_routed": n_routed,
            "rows_failed": n_quarantine,
            "files_processed": len(files_done),
            "wall_sec": round(time.time() - t0, 3),
        }
        return PipelineResult(metrics=metrics, tables=tables)
    finally:
        routed.unpersist()
        parsed.unpersist()
