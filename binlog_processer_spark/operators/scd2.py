"""SCD Type-2 history build: change events → versioned dimension rows.

The reference lands raw change events and leaves "what did this row
look like on date D" to downstream Hive SQL (its dual create_time/
update_time trees exist exactly to serve those queries cheaply,
PartitionWriterManager.java:60-96). The standard warehouse answer is a
type-2 slowly-changing dimension: one row per (key, version) with
``valid_from`` / ``valid_to`` / ``is_current``, where each version's
validity closes when the next event for the same key commits.

Spark-first shape: ONE window per key ordered by event order —
``lead(commit_ts)`` closes each version, ``lead(op)`` is only needed
implicitly (a Delete closes its predecessor and contributes no open
version). No self-join, no iterative driver loop: a single hash
exchange on the key, the same partitioning every other keyed stage
uses. Point-in-time reads are then a plain filter
(``valid_from <= T AND (valid_to IS NULL OR valid_to > T)``) — at
10^12 rows that filter rides zone maps if the history lands clustered
on ``valid_from``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEYS = ["database_name", "table_name", "doc_id"]


def scd2_history(
    events: DataFrame,
    keys: list[str] | None = None,
    order_col: str = "event_seq",
    ts_col: str = "commit_ts",
) -> DataFrame:
    """One row per surviving version: Creates/Updates open a version at
    their ``ts_col``; the next event for the key (any op) closes it at
    ITS timestamp (``valid_to`` null = still open). Deletes open no
    version — a key whose last event is a Delete has only closed rows.
    ``is_current`` marks the open version. Ties on ``ts_col`` are
    resolved by ``order_col`` (the binlog file order, which is the
    reference's source of truth for replay order)."""
    keys = keys or KEYS
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).asc(), F.col(ts_col).asc()
    )
    closed = events.withColumn("valid_to", F.lead(ts_col).over(w))
    return (
        closed.filter(F.col("op") != "Delete")
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def as_of_state(history: DataFrame, ts, keys: list[str] | None = None) -> DataFrame:
    """Point-in-time read over an SCD2 history: the version of each key
    valid AT ``ts`` (half-open intervals: ``valid_from <= ts <
    valid_to``). A plain filter — no window, no join."""
    return history.filter(
        (F.col("valid_from") <= F.lit(ts))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(ts)))
    )
