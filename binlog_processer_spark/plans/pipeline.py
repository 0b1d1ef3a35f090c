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

    parsed = parse_raw(raw_df)
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
        # aggregates derive from the committed table (not the increment) so a
        # resumed run republishes complete counts — the reference re-derives
        # counts from t_binlog_process_log the same way (BaseDataCompare.java:38-67)
        committed = tables["routed"].read(spark)
        sink_counts = agg.sink_counts(committed)
        wm = agg.watermarks(committed.filter(F.col("tree") == "update"))
        hist = agg.windowed_histogram(committed.filter(F.col("tree") == "update"))
        lineage = agg.lineage_manifest(committed)

        tables["sink_counts"].write(sink_counts)
        tables["watermarks"].write(wm)
        tables["histograms"].write(hist)
        tables["lineage"].write(lineage)

        n_quarantine = quarantine.count()
        if n_quarantine:
            tables["quarantine"].write(quarantine)

        n_routed = routed.count()
        files_done = [r.file_id for r in routed.select("file_id").distinct().collect()]
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
