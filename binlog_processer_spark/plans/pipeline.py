"""End-to-end batch plan: parse → enrich → route → write → aggregate.

This is the Spark restatement of the reference's resolve entry point
(SURVEY.md §3.1, binlog-main BinlogMain.java → TaskProcessor → BinlogFileReader
→ PartitionWriterManager): one linear DataFrame DAG instead of MQ + thread
pools. The raw-event scan + parse + broadcast enrich + routing expressions run
shuffle-free inside one codegen stage; the only shuffles are the soft-delete
window (which doubles as the fan-out write clustering) and the final
aggregates (keyed by sink).
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
    with_metrics: bool = True,
    profile: bool = False,
) -> PipelineResult:
    """raw_df: one `raw` string column (the serialized event log).
    routing_df: broadcast dimension (table_key → sink attributes).
    Writes snapshot tables under out_dir; returns metrics + table handles.

    ``with_metrics=False`` drops the per-batch parse-latency stamping (and
    its percentiles from the result) — the latency column rides the persisted
    relation through the whole job, so benchmarks measure both settings.
    ``profile=True`` materializes the parse cache as its own action so
    ``phase_sec`` attributes parse separately from the write (same total
    work — the write then reads the cache — but one extra cache pass).
    """
    t0 = time.time()
    phases: dict[str, float] = {}
    manifest = ProcessedManifest(os.path.join(out_dir, "_processed.json"))
    already_done = manifest.load() if resume else set()

    # one physical parse pass feeds both the good path and the quarantine
    # side-output (MEMORY_AND_DISK: spills instead of re-parsing at scale);
    # with_metrics stamps each Arrow batch's wall parse time for the
    # latency-percentile metrics without a second pass
    parsed = parse_raw(raw_df, with_metrics=with_metrics).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if profile:
        t = time.time()
        parsed.count()
        phases["parse_persist"] = round(time.time() - t, 3)
    good, quarantine = split_quarantine(parsed)
    if with_metrics:
        good = good.drop("parse_batch_us")
    # the wire's (source, bucket) is the TABLE_MAP key (tableId analogue)
    good = good.withColumn(
        "table_key",
        F.concat_ws("#", F.col("source"), F.col("bucket").cast("string")),
    )
    if resume:
        good = remaining_events(good, already_done)

    enriched = enrich_routing(good, routing_df)
    # cluster_for_write: the one fact shuffle in the whole plan — pre-explode
    # repartition by sink so each partition dir is written by one task.
    # The envelope keeps `before`/`after` as derived views for queries, but
    # only `img` is persisted/written: the three structs share one token
    # array, and tripling it would triple shuffle, cache, and parquet bytes
    # (the dominant cost at 10^12 rows).
    # Written directly, never cached: caching would columnar-encode every
    # token array a second time, and no consumer needs the arrays again —
    # the aggregates below re-read the committed parquet with the token
    # column pruned away (a few % of the written bytes).
    routed, ignored_counts = route(enriched, cluster_for_write=True)
    # storage flattens the image: img.doc_id / img.n_tok always equal the
    # top-level columns (with_envelope builds the image from the same row),
    # so persisting the struct would carry a second doc_id STRING and n_tok
    # through the shuffle, the cache, and the parquet encode — at 10^12 rows
    # that duplication is real bytes. Readers reconstruct the envelope from
    # (doc_id, n_tok, img_tokens).
    routed = routed.select(
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
        "n_tok",
        F.col("img.tokens").alias("img_tokens"),
    )
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
        t = time.time()
        tables["routed"].write(
            routed,
            partition_by=PARTITION_COLS,
            mode="overwrite" if not resume else "append",
        )
        phases["route_write"] = round(time.time() - t, 3)
        # aggregates reflect the committed table (not just the increment) so
        # a resumed run republishes complete counts — the reference
        # re-derives counts from t_binlog_process_log the same way
        # (BaseDataCompare.java:38-67). One column-pruned scan feeds all four
        # outputs via a shared super-key rollup.
        t = time.time()
        committed = tables["routed"].read(spark)
        sink_counts, wm, hist, lineage, rollup_base = agg.single_pass_rollups(committed)

        # materialize the shared rollup ONCE before fanning out publishes —
        # otherwise the concurrent jobs below race to compute the same cached
        # partitions
        rollup_base.count()
        phases["rollup"] = round(time.time() - t, 3)

        # the four aggregate outputs are tiny (per-sink cardinality, one file
        # each) but each publish is its own Spark job whose submit + commit
        # tail is serial; at higher core counts those fixed tails dominate the
        # wall clock (they don't parallelize), so publish CONCURRENTLY —
        # Spark's scheduler handles multi-threaded job submission natively
        from concurrent.futures import ThreadPoolExecutor

        def _publish_lineage():
            # lineage is one row per file×sink: collect once, reuse for the
            # manifest and the routed-row metric without further scans
            rows = lineage.collect()
            tables["lineage"].write(spark.createDataFrame(rows, lineage.schema))
            return rows

        def _parse_latency_pcts():
            if not with_metrics:
                return [None, None, None]
            row = parsed.select(
                F.expr(
                    "percentile_approx(parse_batch_us,"
                    " array(0.5D, 0.95D, 0.99D))"
                ).alias("p")
            ).collect()[0]
            return row.p or [None, None, None]

        t = time.time()
        with ThreadPoolExecutor(max_workers=6) as ex:
            f_lineage = ex.submit(_publish_lineage)
            f_quar = ex.submit(quarantine.count)
            f_lat = ex.submit(_parse_latency_pcts)
            f_pub = [
                ex.submit(tables["sink_counts"].write, sink_counts.coalesce(1)),
                ex.submit(tables["watermarks"].write, wm.coalesce(1)),
                ex.submit(tables["histograms"].write, hist.coalesce(1)),
            ]
            lineage_rows = f_lineage.result()
            n_quarantine = f_quar.result()
            lat_p50, lat_p95, lat_p99 = f_lat.result()
            for f in f_pub:
                f.result()
        rollup_base.unpersist()
        phases["publish"] = round(time.time() - t, 3)

        if n_quarantine:
            tables["quarantine"].write(quarantine)

        # lineage spans the whole committed table; metrics report THIS run's
        # increment (the reference's per-run t_binlog_process_log semantics)
        files_done = sorted({r.file_id for r in lineage_rows})
        new_files = [f for f in files_done if f not in already_done]
        n_routed = sum(
            r.routed_cnt for r in lineage_rows if r.file_id not in already_done
        )
        manifest.mark(files_done)

        metrics = {
            "rows_routed": n_routed,
            "rows_failed": n_quarantine,
            "files_processed": len(new_files),
            # per-Arrow-batch parse wall time percentiles (BASELINE metrics
            # contract: rows parsed/routed/failed + parse-latency pcts)
            "parse_batch_us_p50": lat_p50,
            "parse_batch_us_p95": lat_p95,
            "parse_batch_us_p99": lat_p99,
            "wall_sec": round(time.time() - t0, 3),
            "phase_sec": phases,
        }
        return PipelineResult(metrics=metrics, tables=tables)
    finally:
        parsed.unpersist()
