"""Gap-based sessionization — the telemetry-side aggregate family.

A log/telemetry pipeline's per-entity rollup unit is the SESSION: a run of
events for one key with no silence longer than a gap threshold. The
reference's per-file/per-sink counters (BinlogCount.java) are the CDC
analogue; this module adds the general form for the telemetry half of the
log-pipeline tier.

Two Spark-first implementations, same semantics:

- ``sessionize``: the relational form — a lag/flag/cumulative-sum window
  per key assigns session ordinals. One shuffle on the key (the window's
  partitionBy); every step is whole-stage-codegen, no UDFs. Exactly
  reproducible in ANSI SQL, so it is the oracle-gated path.
- ``session_window_agg``: Spark's native ``session_window`` grouping —
  the same gap semantics fused into a single aggregation (and the form
  that carries over verbatim to Structured Streaming with a watermark,
  where state eviction is managed for you).

Scale: both plans shuffle each key's events to one place once — the
minimum any sessionizer must move — and aggregate map-side first where
possible. Skewed keys (one chatty device) salt the same way sink counts
do (operators/skew.py); session assignment itself cannot be salted
(ordinals are sequential per key), which is why the gap flag + sum runs
AFTER one partition-local sort, not via repeated self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int,
    keys: list[str] | None = None,
    ts_col: str = "commit_ts",
) -> DataFrame:
    """Assign a session ordinal per key: a new session starts where the
    gap since the key's previous event exceeds ``gap_minutes``. Adds
    ``session_id`` (0-based per key, in time order)."""
    keys = keys or ["database_name", "table_name", "doc_id"]
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc(), F.col("event_seq").asc()
    )
    gap_s = gap_minutes * 60
    # ``>``, not ``>=``: Spark's session_window merges TOUCHING windows —
    # an event arriving at exactly last + gap still lands inside
    # [last, last + gap] and extends the session (verified empirically;
    # tests assert both paths agree on a boundary-exact input) — so a
    # new session starts only when the gap strictly exceeds the threshold
    new_sess = (
        F.unix_timestamp(ts_col)
        - F.unix_timestamp(F.lag(ts_col).over(w))
        > gap_s
    )
    return events.withColumn(
        "session_id",
        F.sum(
            F.when(new_sess, 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )


def session_stats(
    events: DataFrame,
    gap_minutes: int,
    keys: list[str] | None = None,
    ts_col: str = "commit_ts",
) -> DataFrame:
    """Per-session rollup: event count, start/end, duration seconds."""
    keys = keys or ["database_name", "table_name", "doc_id"]
    return (
        sessionize(events, gap_minutes, keys, ts_col)
        .groupBy(*keys, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            (
                F.unix_timestamp(F.max(ts_col))
                - F.unix_timestamp(F.min(ts_col))
            ).alias("duration_s"),
        )
    )


def session_window_agg(
    events: DataFrame,
    gap_minutes: int,
    keys: list[str] | None = None,
    ts_col: str = "commit_ts",
) -> DataFrame:
    """The same rollup via Spark's native ``session_window`` — one fused
    aggregation, and the exact expression a streaming job reuses under a
    watermark (state store evicts closed sessions automatically)."""
    keys = keys or ["database_name", "table_name", "doc_id"]
    return (
        events.groupBy(
            *keys, F.session_window(ts_col, f"{gap_minutes} minutes")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .drop("session_window")
    )
