"""Event-time windowed streaming aggregates with watermark-based late-data
handling (SURVEY §2.9).

The reference has no streaming watermark — late files are handled after the
fact by the comparer/repair modules. A Structured-Streaming deployment of the
same pipeline gets the standard form: per-sink tumbling windows over
``commit_ts`` with a watermark bounding state and dropping too-late events
(binlog events arriving later than the watermark delay after the max seen
commit_ts). The batch twin of this aggregate is
operators/aggregate.windowed_histogram — same keys, same pivoted op counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_op_counts_stream(
    events: DataFrame,
    window: str = "1 day",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming per-sink tumbling-window op histogram.

    - ``withWatermark(commit_ts, watermark)``: state for a window is freed
      once the event-time watermark (max commit_ts − delay) passes its end,
      and events older than the watermark are dropped instead of resurrecting
      closed windows — the bounded-state requirement at 10^12 events.
    - append output emits each window exactly once, on close.
    """
    return (
        events.withWatermark("commit_ts", watermark)
        .groupBy(
            "source",
            F.window("commit_ts", window).alias("win"),
        )
        .agg(
            F.sum(F.when(F.col("op") == "Create", 1).otherwise(0)).alias(
                "insert_cnt"
            ),
            F.sum(F.when(F.col("op") == "Update", 1).otherwise(0)).alias(
                "update_cnt"
            ),
            F.sum(F.when(F.col("op") == "Delete", 1).otherwise(0)).alias(
                "delete_cnt"
            ),
            F.max("commit_ts").alias("win_watermark"),
        )
        .select(
            "source",
            F.col("win.start").alias("win_start"),
            "insert_cnt",
            "update_cnt",
            "delete_cnt",
            "win_watermark",
        )
    )


def session_counts_stream(
    events: DataFrame,
    gap: str = "240 minutes",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("source", "doc_id"),
) -> DataFrame:
    """Streaming gap-sessionization via native ``session_window`` — the
    form operators/sessions.py documents as the streaming carryover, here
    actually under a watermark: Spark merges a key's events into variable-
    length windows (end = last event + gap, touching windows merge), holds
    each open session in the state store, and in append mode emits a
    session exactly once — when the event-time watermark passes its end.
    State is bounded by open sessions inside the watermark horizon, not by
    the stream's history (the 10^12-event requirement).
    """
    return (
        events.withWatermark("commit_ts", watermark)
        .groupBy(*keys, F.session_window("commit_ts", gap).alias("win"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.min("commit_ts").alias("session_start"),
            F.max("commit_ts").alias("session_end"),
        )
        .select(*keys, "n_events", "session_start", "session_end")
    )
