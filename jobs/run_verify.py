"""spark-submit entry point for reconciliation (reference entry point B).

Replays the routed warehouse into per-id final state and probes it against a
replica table (the TiDB/Hive stand-in), emitting findings —
missing_create / missing_update / stale_update / ghost_delete
(binlog-comparer TiDBCompareByFile.java:31-265 restated as joins,
SURVEY.md §3.2).

Usage::

    spark-submit --py-files dist/engine.zip jobs/run_verify.py \
        --warehouse /path/to/wh [--replica /path/to/replica.parquet] \
        [--mutate] [--antientropy [N_BUCKETS]]

Without --replica, a replica is derived from the warehouse's own final state
(self-check: zero findings). --mutate deterministically injects
discrepancies (missing / stale / ghost rows) into the derived replica so the
finding classes can be demonstrated end-to-end. Findings are written to
<warehouse>/findings and a JSON summary line is printed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binlog_processer_spark.operators.verify import reconcile
from binlog_processer_spark.session import get_spark
from binlog_processer_spark.storage.table import SnapshotTable


def routed_events(
    spark: SparkSession,
    warehouse: str,
    date_lo=None,
    date_hi=None,
    evidence: dict | None = None,
) -> DataFrame:
    """Update-tree routed rows as change records (one row per event).

    Reads both storage generations: flattened ``img_tokens`` (current) and
    the legacy ``img`` struct — the schema-evolution read path.

    ``date_lo`` / ``date_hi`` (datetime.date, inclusive) scope the read to
    a ``part_date`` window — the reference's second compare entry point,
    keyed by date partition rather than file (binlog-comparer
    TiDBCompareByDate.java:66-127, HiveCompareByDate.java). The scan goes
    through ``SnapshotTable.read_where``, so committed zone maps prune
    out-of-range files at the manifest and the residual filter keeps the
    result exact; ``evidence`` (if passed) receives files_total /
    files_scanned so callers can report the pruning."""
    tbl = SnapshotTable(os.path.join(warehouse, "routed"))
    if date_lo is not None or date_hi is not None:
        preds = {"part_date": (date_lo, date_hi)}
        if evidence is not None:
            snap = tbl.current_snapshot()
            evidence["files_total"] = len(
                tbl._files_rel(tbl._manifest(snap))
            )
            evidence["files_scanned"] = len(tbl.prune_files(preds, snap))
        routed = tbl.read_where(spark, preds)
    else:
        routed = tbl.read(spark)
    tokens = (
        F.col("img_tokens")
        if "img_tokens" in routed.columns
        else F.col("img.tokens")
    )
    return routed.filter(F.col("tree") == "update").select(
        "database_name",
        "table_name",
        "doc_id",
        "op",
        "event_seq",
        "commit_ts",
        tokens.alias("tokens"),
    )


def derived_replica(
    events: DataFrame, mutate: bool, fs: DataFrame | None = None
) -> DataFrame:
    """Replica = live final state; --mutate injects deterministic faults
    (doc hash %37 missing, %41 stale, %43 ghost-delete) mirroring the test
    corpus's mutation scheme. Pass a precomputed (persisted) ``fs`` so the
    event replay is shared with reconcile/repair (one scan, not three)."""
    from binlog_processer_spark.operators.aggregate import final_state

    if fs is None:
        fs = final_state(events)
    fs = fs.withColumn("h", F.abs(F.xxhash64("doc_id")))
    live = fs.filter(F.col("final_op") != "Delete")
    if mutate:
        live = live.filter(F.col("h") % 37 != 5).withColumn(
            "replica_ts",
            F.when(
                (F.col("h") % 41 == 7) & (F.col("final_op") == "Update"),
                F.col("final_ts") - F.expr("make_interval(0,0,0,0,0,2000,0)"),
            ).otherwise(F.col("final_ts")),
        )
        ghosts = fs.filter(
            (F.col("final_op") == "Delete") & (F.col("h") % 43 == 9)
        ).withColumn("replica_ts", F.col("final_ts"))
        live = live.unionByName(ghosts)
    else:
        live = live.withColumn("replica_ts", F.col("final_ts"))
    return live.select(
        "database_name", "table_name", "doc_id", "replica_ts",
        F.col("final_tokens").alias("replica_tokens"),
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--replica", help="parquet path with replica rows")
    ap.add_argument("--mutate", action="store_true",
                    help="inject deterministic faults into the derived replica")
    ap.add_argument(
        "--antientropy", type=int, nargs="?", const=4096, default=None,
        metavar="N_BUCKETS",
        help="Merkle-style digest-gated reconcile: exchange N_BUCKETS "
        "(default 4096) digest rows between the two sides and run the "
        "row-level join only inside buckets whose digests disagree — the "
        "verify cycle on agreeing stores terminates at digest cost",
    )
    ap.add_argument(
        "--part-date", metavar="YYYY-MM-DD",
        help="scope the verify to ONE part_date day (the reference's "
        "compare-by-date entry point, TiDBCompareByDate.java:66-127); "
        "reads only files whose zone maps may contain the day",
    )
    ap.add_argument(
        "--date-range", nargs=2, metavar=("FROM", "TO"),
        help="scope the verify to an inclusive part_date range "
        "(YYYY-MM-DD YYYY-MM-DD); zone-map-pruned like --part-date",
    )
    ap.add_argument(
        "--freshness", action="store_true",
        help="publish <warehouse>/freshness — the dense per-sink daily "
        "timeline (zero-filled silent days, forward-filled watermark; "
        "aggregate.timeline_densify) — and report how many sink-days "
        "were silent",
    )
    args = ap.parse_args()

    import datetime as _dt

    date_lo = date_hi = None
    if args.part_date and args.date_range:
        ap.error("--part-date and --date-range are mutually exclusive")
    if args.part_date:
        date_lo = date_hi = _dt.date.fromisoformat(args.part_date)
    elif args.date_range:
        date_lo = _dt.date.fromisoformat(args.date_range[0])
        date_hi = _dt.date.fromisoformat(args.date_range[1])
        if date_hi < date_lo:
            ap.error("--date-range FROM must be <= TO")

    spark = get_spark("binlog-verify")
    scope: dict = {}
    events = routed_events(
        spark, args.warehouse, date_lo, date_hi, evidence=scope
    )
    from binlog_processer_spark.operators.aggregate import final_state

    fs = final_state(events).persist()
    if args.replica:
        if os.path.exists(os.path.join(args.replica, "_current")):
            replica = SnapshotTable(args.replica).read(spark)
        else:
            replica = spark.read.parquet(args.replica)
        if date_lo is not None:
            # scope the store side to the same day window (replica_ts is
            # the final commit ts, which IS the update tree's part_date
            # basis) so out-of-range store rows aren't flagged as ghosts
            replica = replica.filter(
                F.col("replica_ts").cast("date").between(date_lo, date_hi)
            )
    else:
        replica = derived_replica(events, args.mutate, fs=fs)
    if date_lo is not None:
        scope["date_from"] = str(date_lo)
        scope["date_to"] = str(date_hi)

    extra: dict = {}
    if args.antientropy:
        from binlog_processer_spark.operators.antientropy import (
            antientropy_reconcile,
        )

        suspects, findings = antientropy_reconcile(
            fs, replica, n_buckets=args.antientropy
        )
        extra = {
            "n_buckets": args.antientropy,
            "suspect_buckets": suspects.count(),
        }
    else:
        findings = reconcile(None, replica, fs=fs)
    if args.freshness:
        # staleness surfaced as data: a silent sink is a row with
        # events=0 and a watermark stuck at the last seen commit_ts
        from binlog_processer_spark.operators.aggregate import (
            timeline_densify,
        )

        tl = timeline_densify(events)
        SnapshotTable(os.path.join(args.warehouse, "freshness")).write(
            tl.coalesce(1)
        )
        tl = SnapshotTable(os.path.join(args.warehouse, "freshness")).read(
            spark
        )
        extra["timeline_days"] = tl.count()
        extra["silent_sink_days"] = tl.filter(F.col("events") == 0).count()
    tbl = SnapshotTable(os.path.join(args.warehouse, "findings"))
    tbl.write(findings.coalesce(1))
    counts = {
        r["finding"]: r["cnt"]
        for r in findings.groupBy("finding")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    print(json.dumps(
        {"findings_total": sum(counts.values()), **counts, **extra, **scope}
    ))
    spark.stop()


if __name__ == "__main__":
    main()
