"""Aggregates: per-sink op counters, per-file counters, windowed histograms,
watermarks, last-wins/cancellation final state, gap detection, lineage.

Reference parity (SURVEY.md §2.4):
- A1 per-sink {insert,update,delete} counts keyed by
  (tree, instance, db, table, partition) — PartitionWriterManager.java:171-182,
  WriteResultValue.java:22-35. THE primary correctness aggregate.
- A2 per-file event counters — BinlogFileReader.java:243-281.
- A4 last-event-per-id (HashMap overwrite in file order) —
  AvroDataReader.java:95-127 → max_by(…, event_seq).
- A5 cross-op cancellation (create∖update∖delete) —
  AvroDataReader.java:128-135 → single-pass final-state groupBy.
- A6 group-by + HAVING + GROUP_CONCAT — BaseDataCompare.java:38-67.
- A8 max-commit-ts watermark — AliBinLogFileTransfer.java:100-134.
- A9 missing-file-number gap detection — ResolveCheck.java:34-139 → lag window.
- lineage manifest per (file, sink) — t_binlog_process_log, DBbiz.java:85-112.

Scale posture: every aggregate here is a hash aggregate with map-side partial
combine (Spark default); grouping keys are the sink key (low cardinality ⇒
tiny shuffle) or doc_id (high cardinality ⇒ even shuffle, salting helper in
operators/skew.py for the hot-sink histogram case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SINK_KEY = ["tree", "db_instance", "database_name", "table_name", "part_date"]


def _op_counts():
    return [
        F.sum(F.when(F.col("op") == "Create", 1).otherwise(0)).alias("insert_cnt"),
        F.sum(F.when(F.col("op") == "Update", 1).otherwise(0)).alias("update_cnt"),
        F.sum(F.when(F.col("op") == "Delete", 1).otherwise(0)).alias("delete_cnt"),
    ]


def sink_counts(routed: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """A1: pivoted op counts per sink partition."""
    return routed.groupBy(*(keys or SINK_KEY)).agg(*_op_counts())


def file_event_counts(events: DataFrame) -> DataFrame:
    """A2: per input-file totals + per-op counts."""
    return events.groupBy("file_id").agg(
        F.count("*").alias("total_cnt"), *_op_counts()
    )


def last_wins_per_id(events: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """A4: final event per (sink, doc_id) by file order (event_seq)."""
    keys = keys or ["database_name", "table_name", "doc_id"]
    w = Window.partitionBy(*keys).orderBy(F.col("event_seq").desc())
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def final_state(events: DataFrame) -> DataFrame:
    """A4+A5 in one pass: last op/ts per doc — single groupBy with max_by,
    no per-op maps and no anti-join cascade (the HashMap-overwrite +
    cancellation law collapses to last-op-wins)."""
    return events.groupBy("database_name", "table_name", "doc_id").agg(
        F.max_by("op", "event_seq").alias("final_op"),
        F.max_by("commit_ts", "event_seq").alias("final_ts"),
        F.max_by("tokens", "event_seq").alias("final_tokens"),
        F.max("event_seq").alias("final_seq"),
    )


def watermarks(events: DataFrame) -> DataFrame:
    """A8: high-water commit timestamp per sink."""
    return events.groupBy("database_name", "table_name").agg(
        F.max("commit_ts").alias("max_commit_ts")
    )


def merge_counts(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str] | None = None,
    count_cols: list[str] | None = None,
) -> DataFrame:
    """Incremental maintenance of an additive rollup: merge a committed
    counts table with the counts of ONLY the newly-added rows, giving
    the same result as recomputing over the full history.

    The reference recomputes its t_binlog_record counters per run over
    whatever it just wrote (DBbiz.java:85-112) and relies on SQL-side
    accumulation; at 10^12 rows the Spark equivalent must never rescan
    the base table — the delta comes from the snapshot manifest diff
    (SnapshotTable.read_incremental), so maintenance cost is O(delta).

    union + re-aggregate is ONE tiny shuffle on the rollup keys (rollup
    cardinality, not fact cardinality); it also handles keys appearing
    only in the delta, and negative counts (retractions) fall out of
    the same algebra. Absent count columns on either side merge as 0.
    """
    keys = keys or SINK_KEY
    if count_cols is None:
        count_cols = [c for c in base.columns if c not in keys]
    both = base.select(*keys, *count_cols).unionByName(
        delta.select(*keys, *count_cols)
    )
    return both.groupBy(*keys).agg(
        *[
            F.coalesce(F.sum(c), F.lit(0)).cast("bigint").alias(c)
            for c in count_cols
        ]
    )


def ingestion_lag(events: DataFrame) -> DataFrame:
    """CDC freshness report per sink: the distribution of commit-to-event
    latency (commit_ts − create_ts) — the metric that tells you a
    downstream table is minutes vs hours behind its source, and the
    first thing paged on when replication stalls. Reported as count,
    floored mean, max, and a lag histogram in coarse buckets
    (<1m / <1h / <1d / ≥1d), all from ONE bounded hash aggregate —
    exact mean/max, bucketed shape instead of exact percentiles (a
    per-sink sort at 10^12 rows buys precision nobody pages on).
    """
    lag = F.col("commit_ts").cast("long") - F.col("create_ts").cast("long")
    b = lambda lo, hi: F.sum(  # noqa: E731 — tiny local bucket counter
        ((lag >= lo) & (lag < hi)).cast("int")
    ).cast("bigint")
    big = 1 << 62
    return events.groupBy("database_name", "table_name").agg(
        F.count("*").cast("bigint").alias("n"),
        F.floor(F.avg(lag)).cast("bigint").alias("mean_lag_s"),
        F.max(lag).cast("bigint").alias("max_lag_s"),
        b(F.lit(-big), F.lit(60)).alias("lt_1m"),
        b(F.lit(60), F.lit(3600)).alias("lt_1h"),
        b(F.lit(3600), F.lit(86400)).alias("lt_1d"),
        b(F.lit(86400), F.lit(big)).alias("ge_1d"),
    )


def windowed_histogram(events: DataFrame, duration: str = "1 day") -> DataFrame:
    """Per-sink tumbling-window op histogram (reference day-partition
    granularity, TimeBasedPartitioner.java:15-38, as an event-time window)."""
    return (
        events.groupBy(
            "database_name",
            "table_name",
            F.window("commit_ts", duration).alias("win"),
        )
        .agg(*_op_counts(), F.max("commit_ts").alias("win_watermark"))
        .select(
            "database_name",
            "table_name",
            F.col("win.start").alias("win_start"),
            "insert_cnt",
            "update_cnt",
            "delete_cnt",
            "win_watermark",
        )
    )


def grouped_partitions_report(sink_cnts: DataFrame, min_files: int = 0,
                              min_rows: int = 1) -> DataFrame:
    """A6: per-table rollup with HAVING + GROUP_CONCAT(partitions)."""
    g = sink_cnts.groupBy("db_instance", "database_name", "table_name").agg(
        F.count("*").alias("partition_cnt"),
        F.sum(
            F.col("insert_cnt") + F.col("update_cnt") + F.col("delete_cnt")
        ).alias("total_rows"),
        F.concat_ws(
            ",", F.sort_array(F.collect_list(F.col("part_date").cast("string")))
        ).alias("partitions_concat"),
    )
    return g.filter(
        (F.col("partition_cnt") > min_files) & (F.col("total_rows") >= min_rows)
    )


def file_gap_detection(files: DataFrame) -> DataFrame:
    """A9: find gaps in per-directory sorted file numbers via a lag window.

    `files` has (dir, file_num); output rows mark each gap with its bounds.
    """
    w = Window.partitionBy("dir").orderBy("file_num")
    return (
        files.withColumn("prev_num", F.lag("file_num").over(w))
        .filter(F.col("file_num") - F.col("prev_num") > 1)
        .select(
            "dir",
            (F.col("prev_num") + 1).alias("gap_start"),
            (F.col("file_num") - 1).alias("gap_end"),
        )
    )


def single_pass_rollups(
    routed: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame]:
    """One scan → (sink_counts, watermarks, histograms, lineage, base).

    `base` is returned (persisted) so the caller can unpersist it once the
    four derived outputs have been materialized.

    The four pipeline aggregates share a common super-key
    (tree, db_instance, database, table, part_date, file_id) whose
    cardinality is sinks × days × files — tiny next to the fact. Aggregating
    to that key once and re-aggregating the result replaces four full scans
    of the routed relation with one (the reference computes all its counters
    in the same single pass over the file, BinlogFileReader.java:243-281 +
    PartitionWriterManager.java:171-182).

    The histogram derivation relies on an invariant of the update tree:
    part_date = to_date(commit_ts) (route.fan_out_trees), so the 1-day
    tumbling window start IS the partition date.
    """
    base = routed.groupBy(
        "tree", "db_instance", "database_name", "table_name",
        "part_date", "file_id",
    ).agg(
        F.count("*").alias("routed_cnt"),
        *_op_counts(),
        F.max("commit_ts").alias("max_commit_ts"),
    )
    base = base.persist()
    upd = base.filter(F.col("tree") == "update")
    sums = [
        F.sum("insert_cnt").alias("insert_cnt"),
        F.sum("update_cnt").alias("update_cnt"),
        F.sum("delete_cnt").alias("delete_cnt"),
    ]
    sink_cnts = base.groupBy(*SINK_KEY).agg(*sums)
    wm = upd.groupBy("database_name", "table_name").agg(
        F.max("max_commit_ts").alias("max_commit_ts")
    )
    hist = (
        upd.groupBy(
            "database_name",
            "table_name",
            F.col("part_date").cast("timestamp").alias("win_start"),
        )
        .agg(*sums, F.max("max_commit_ts").alias("win_watermark"))
    )
    lineage = base.groupBy(
        "file_id", "tree", "db_instance", "database_name", "table_name"
    ).agg(F.sum("routed_cnt").alias("routed_cnt"), *sums)
    return sink_cnts, wm, hist, lineage, base


def lineage_manifest(routed: DataFrame, quarantine_cnt_by_file: DataFrame | None = None) -> DataFrame:
    """Per-(file, sink) lineage row: the t_binlog_process_log analogue."""
    m = routed.groupBy(
        "file_id", "tree", "db_instance", "database_name", "table_name"
    ).agg(F.count("*").alias("routed_cnt"), *_op_counts())
    if quarantine_cnt_by_file is not None:
        m = m.join(quarantine_cnt_by_file, "file_id", "left").fillna(
            0, subset=["failed_cnt"]
        )
    return m


def sink_token_percentiles(
    kept: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Per-sink payload-size distribution: exact interpolated p50/p95/p99
    of ``n_tok``, published as centi-token bigints (float columns don't
    survive value-hash gates; cosine_bp convention).

    Exact (not approx) is affordable here because ``percentile()``
    aggregates a count-map keyed by DISTINCT value and token counts are
    small bounded ints — the buffer is O(distinct n_tok) per group, not
    O(rows), so it holds at 10^12 rows. For unbounded metrics (e.g.
    parse-latency micros, metrics.py) use ``percentile_approx`` instead.
    Matches ANSI/DuckDB ``quantile_cont`` bit-for-bit: both compute
    lower + ((n-1)·p mod 1)·(upper − lower) on the sorted values.
    """
    keys = keys or ["database_name", "table_name"]
    g = kept.groupBy(*keys).agg(
        F.expr("percentile(n_tok, array(0.5D, 0.95D, 0.99D))").alias("p")
    )
    cols = [
        F.round(F.element_at("p", i + 1) * 100)
        .cast("bigint")
        .alias(f"p{int(pp * 100)}_c")
        for i, pp in enumerate((0.5, 0.95, 0.99))
    ]
    return g.select(*keys, *cols)


def timeline_densify(events: DataFrame) -> DataFrame:
    """Dense per-sink daily activity timeline: zero-filled event counts
    and a forward-filled high-water commit timestamp for every calendar
    day in each sink's [first, last] activity span — including the days
    with no events at all.

    Why: the sparse per-day aggregate (`windowed_histogram`) answers
    "what happened"; freshness monitoring needs "what DIDN'T happen" —
    a silent sink shows up only when absent days exist as rows with
    events = 0 and a watermark stuck at the last seen commit_ts (the
    reference surfaces staleness the same way, by querying the max-ts
    watermark row per sink, DBbiz.java:85-112 / t_binlog_record; this
    operator materializes the gap days that query leaves implicit).

    Plan: one per-sink daily aggregate (map-side combined), then a
    driver-free calendar explode via `sequence(min_day, max_day)` —
    bounded by days-per-sink, NOT rows — left-joined back and
    forward-filled with a running `max` window (commit watermarks are
    monotone per day, so running max IS last-seen). At 10^12 rows the
    expensive thing is the one daily aggregate; the calendar join is
    |sinks| x |days|, metadata-scale.
    """
    daily = events.groupBy(
        "database_name",
        "table_name",
        F.to_date("commit_ts").alias("day"),
    ).agg(
        F.count("*").cast("bigint").alias("day_events"),
        F.max("commit_ts").alias("day_max_ts"),
    )
    spans = daily.groupBy("database_name", "table_name").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = spans.select(
        "database_name",
        "table_name",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    w = (
        Window.partitionBy("database_name", "table_name")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # both join sides are post-aggregate metadata-scale relations
    # (|sinks| x |days| at most); broadcast the daily side so the
    # calendar explode never sort-merge-shuffles
    return (
        calendar.join(
            F.broadcast(daily), ["database_name", "table_name", "day"], "left"
        )
        .select(
            "database_name",
            "table_name",
            "day",
            F.coalesce("day_events", F.lit(0)).cast("bigint").alias("events"),
            # max() skips nulls, so empty days inherit the last seen
            # watermark; the span starts at an active day, so the
            # running max is never null
            F.max("day_max_ts").over(w).alias("watermark_ts"),
        )
        .orderBy("database_name", "table_name", "day")
    )


def sink_op_pivot(events: DataFrame) -> DataFrame:
    """Wide-form per-sink op counters: one row per sink with
    n_create / n_update / n_delete columns — the PIVOT face of the
    long-form ``sink_counts`` (the reference's t_binlog_record holds
    counters long-form, DBbiz.java:85-112; dashboards want them wide).

    The pivot value set is the CLOSED op vocabulary (Create/Update/
    Delete — parse quarantines anything else), so the pivot lowers to
    conditional sums inside ONE map-side-combined hash aggregate.
    (DataFrame ``.pivot(values=...)`` plans an extra
    (keys, op)-grained pre-aggregate — a second full shuffle; with a
    closed vocabulary the CASE form is the strictly better plan, and
    it is exactly what the SQL PIVOT clause means.)
    """
    cnt = lambda v: F.sum(  # noqa: E731 — tiny local counter
        (F.col("op") == v).cast("int")
    ).cast("bigint")
    return (
        events.groupBy("database_name", "table_name")
        .agg(
            cnt("Create").alias("n_create"),
            cnt("Update").alias("n_update"),
            cnt("Delete").alias("n_delete"),
            F.count("*").cast("bigint").alias("n_total"),
        )
        .orderBy("database_name", "table_name")
    )


def sink_counts_rollup(events: DataFrame) -> DataFrame:
    """Exact multi-level event counts via ROLLUP — (database, table),
    (database), grand total in ONE aggregate pass (Spark plans a single
    Expand + hash aggregate with map-side partial combine; grouping-set
    rows cost one duplicated map row each, never a rescan). The exact
    counterpart of ``hll_rollup``'s sketch cube: additive measures
    roll up exactly, distinct counts need the sketch.

    Grouping columns surface as '*' on the rolled-up levels (driver
    canon can't hash NULL group keys consistently across engines).
    """
    return (
        events.rollup("database_name", "table_name")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            # grouping() is only legal inside the rollup aggregate
            F.grouping("database_name").alias("__gd"),
            F.grouping("table_name").alias("__gt"),
        )
        .select(
            F.when(F.col("__gd") == 1, F.lit("*"))
            .otherwise(F.col("database_name"))
            .alias("database_name"),
            F.when(F.col("__gt") == 1, F.lit("*"))
            .otherwise(F.col("table_name"))
            .alias("table_name"),
            "n_events",
        )
        .orderBy("database_name", "table_name")
    )
