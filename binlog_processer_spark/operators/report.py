"""Per-run process-health report — the ops surface the reference
publishes to ``t_binlog_process_report`` every five minutes plus its
Prometheus counters (binlog-processer RabbitMqProcessor.java:199-242,
DBbiz.java:133-156, PrometheusMetrics.java:11-28), restated as a
snapshot table written by every pipeline run alongside lineage.

The reference's report row carries queue/pool/semaphore gauges because
its engine IS a queue of threads; the Spark engine's equivalents are
the run's phase wall times, throughput, and cache/pin gauges. Counter
metrics (rows routed/failed, files, sinks) are pure functions of the
input corpus — those carry the DuckDB oracle in the contract query —
while gauges (wall times, file counts under AQE sizing, pin counts)
are run-specific and published for operators, not for the hash gate.

Layout is the reference's narrow metric/value shape (one row per
metric, bigint value) so downstream monitoring can union reports
across runs and pivot freely; ``run_ts`` stamps the run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# metrics that are pure functions of the input corpus (the oracle set);
# everything else in the report is a run gauge
DETERMINISTIC_METRICS = (
    "files_processed",
    "quarantine_ppm",
    "rows_failed",
    "rows_routed",
    "sinks",
    "trees",
)


REPORT_SCHEMA_DDL = "metric string, value bigint, run_ts timestamp"


def process_report_rows(
    metrics: dict,
    routed: DataFrame | None = None,
    routed_files: int | None = None,
    lineage_rows: list | None = None,
) -> list:
    """Build the one-run report ROWS (metric, value, run_ts) from the
    pipeline's metrics dict. Sink/tree cardinalities come from the
    ALREADY-COLLECTED lineage rows when the caller has them (the
    pipeline always does — one row per file x sink, driver-tiny), so
    the report costs zero extra scans; ``routed`` is the fallback for
    callers without lineage (one tiny aggregate). All values are
    bigint; wall times are published in milliseconds so the value
    column is integer-typed.
    """
    rows: list[tuple[str, int]] = []

    def put(metric: str, value) -> None:
        if value is not None:
            rows.append((metric, int(value)))

    n_routed = int(metrics.get("rows_routed") or 0)
    n_failed = int(metrics.get("rows_failed") or 0)
    put("rows_routed", n_routed)
    put("rows_failed", n_failed)
    put("files_processed", metrics.get("files_processed"))
    # quarantine rate over SOURCE events: routed rows count each
    # surviving event twice (the dual create/update trees), so the event
    # denominator is routed/2 + failed
    denom = n_routed // 2 + n_failed
    put(
        "quarantine_ppm",
        (n_failed * 1_000_000) // denom if denom else 0,
    )
    if lineage_rows is not None:
        put(
            "sinks",
            len({(r["database_name"], r["table_name"]) for r in lineage_rows}),
        )
        put("trees", len({r["tree"] for r in lineage_rows}))
    elif routed is not None:
        card = routed.agg(
            F.countDistinct("database_name", "table_name").alias("sinks"),
            F.countDistinct("tree").alias("trees"),
        ).collect()[0]
        put("sinks", card["sinks"])
        put("trees", card["trees"])
    # --- run gauges (not oracle-gated: wall clock, AQE-sized files,
    # session cache state) ---
    if metrics.get("wall_sec") is not None:
        put("wall_ms", round(float(metrics["wall_sec"]) * 1000))
        if metrics["wall_sec"]:
            put(
                "rows_per_sec",
                round(n_routed / float(metrics["wall_sec"])),
            )
    for phase, sec in (metrics.get("phase_sec") or {}).items():
        put(f"phase_ms_{phase}", round(float(sec) * 1000))
    for pct in ("p50", "p95", "p99"):
        put(
            f"parse_batch_us_{pct}",
            metrics.get(f"parse_batch_us_{pct}"),
        )
    put("routed_files", routed_files)
    from binlog_processer_spark.operators import _cache

    put("pinned_relations", len(getattr(_cache, "_PINNED", ())))
    import datetime as _dt

    ts = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    return [(m, v, ts) for m, v in sorted(rows)]


def process_report_df(
    spark: SparkSession,
    metrics: dict,
    routed: DataFrame | None = None,
    routed_files: int | None = None,
    lineage_rows: list | None = None,
) -> DataFrame:
    """DataFrame face of ``process_report_rows`` (ad-hoc callers; the
    pipeline itself commits the rows driver-side via
    ``SnapshotTable.write_rows`` — no Spark job for 20 rows)."""
    return spark.createDataFrame(
        process_report_rows(
            metrics,
            routed=routed,
            routed_files=routed_files,
            lineage_rows=lineage_rows,
        ),
        schema=REPORT_SCHEMA_DDL,
    )


def deterministic_view(report: DataFrame) -> DataFrame:
    """The oracle-gated slice: corpus-derived counters only, stable
    order — what the contract query publishes."""
    return (
        report.filter(F.col("metric").isin(*DETERMINISTIC_METRICS))
        .select("metric", "value")
        .orderBy("metric")
    )
