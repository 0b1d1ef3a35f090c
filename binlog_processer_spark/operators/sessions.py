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


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-step funnel over an event stream: for steps [A, B, C],
    how many users performed A, then B strictly AFTER their first A, then
    C strictly after that reach time — the conversion report every
    telemetry stack publishes.

    Relational chained-minima plan (the production pattern): step i is
    one filtered scan aggregated to per-user first-reach times, joined to
    step i-1's reach frame ON THE USER KEY. Every join input is a
    per-user aggregate (|users| rows, not |events|), co-partitioned by
    the same key, so k steps cost k column-pruned scans + k user-keyed
    hash joins — no window over the event stream, no per-user event
    collection (hot users never blow a group). Output: one row per step
    with users_reached and conversion from step 0 in basis points.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    # each reach frame is persisted before its count: the count action and
    # the next step's join both consume it, and without the persist step i
    # re-executes steps 0..i-1 from raw events (O(k^2) stream scans).
    # Frames are per-user aggregates — |users| rows, safe to cache.
    handles = []
    try:
        reach = (
            events.filter(F.col(type_col) == steps[0])
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("t0"))
            .persist()
        )
        handles.append(reach)
        counts = [reach.count()]
        for i, step in enumerate(steps[1:], start=1):
            nxt = (
                events.filter(F.col(type_col) == step)
                .join(reach, user_col)
                .filter(F.col(ts_col) > F.col(f"t{i - 1}"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias(f"t{i}"))
                .persist()
            )
            handles.append(nxt)
            # carry the reach time forward: next step is strictly-after
            reach = nxt
            counts.append(nxt.count())
    finally:
        # unpersist even when a mid-funnel count fails — these persists
        # bypass the _cache pin registry, so a leak here outlives retries
        for h in handles:
            h.unpersist()
    spark = events.sparkSession
    base = counts[0]
    rows = [
        (i, s, counts[i], (counts[i] * 10000) // base if base else 0)
        for i, s in enumerate(steps)
    ]
    return spark.createDataFrame(
        rows, "step_idx int, step string, users_reached bigint, conversion_bp bigint"
    )


def retention_cohorts(
    events: DataFrame,
    max_day: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: users grouped by first-activity date; for each
    (cohort_day, day_offset) the distinct users active that many days
    later and retention in basis points of cohort size.

    One per-user min aggregate + one user-keyed join back to events +
    one bounded (cohorts × offsets) aggregate — the join's small side is
    |users| rows and shares the event shuffle's key. Day-0 retention is
    10000 by construction (every user is active on their cohort day).
    """
    first = events.groupBy(user_col).agg(
        F.to_date(F.min(ts_col)).alias("cohort_day")
    )
    act = (
        events.select(user_col, F.to_date(ts_col).alias("day"))
        .distinct()
        .join(first, user_col)
        .withColumn("day_offset", F.datediff("day", "cohort_day"))
        .filter(F.col("day_offset") <= max_day)
    )
    sizes = first.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_users")
    )
    return (
        act.groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("bigint").alias("active_users"))
        .join(sizes, "cohort_day")
        .select(
            "cohort_day",
            F.col("day_offset").cast("int").alias("day_offset"),
            "active_users",
            F.col("cohort_users").cast("bigint").alias("cohort_users"),
            F.floor(F.col("active_users") * 10000 / F.col("cohort_users"))
            .cast("bigint")
            .alias("retention_bp"),
        )
    )
