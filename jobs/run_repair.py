"""spark-submit entry point for repair (reference entry point C).

Re-reconciles the routed warehouse against a replica, then applies the
findings back to the replica as one MERGE-shaped dataflow — upsert newer
rows, delete ghost rows, insert missing rows (binlog-repair
HiveDataRepair.java:105-171 / TiDBDataRepair.java:57-146 restated,
SURVEY.md §3.3). The repaired replica is written as a new snapshot and
re-verified; the printed JSON reports findings before and after (after must
be 0 — the reference marks check rows repaired the same way,
BinlogDBHandler.java:50-68).

Usage::

    spark-submit --py-files dist/engine.zip jobs/run_repair.py \
        --warehouse /path/to/wh [--replica /path/to/replica.parquet] \
        [--mutate]

Without --replica, a deterministically mutated replica is derived from the
warehouse itself (see jobs/run_verify.py), making the job a self-contained
inject→detect→repair→re-verify demonstration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binlog_processer_spark.operators.repair import repair
from binlog_processer_spark.operators.verify import reconcile
from binlog_processer_spark.session import get_spark
from binlog_processer_spark.storage.table import SnapshotTable

from run_verify import derived_replica, routed_events  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--replica", help="parquet path with replica rows")
    ap.add_argument("--mutate", action="store_true", default=None,
                    help="inject faults into the derived replica "
                         "(default: on when no --replica is given)")
    args = ap.parse_args()

    spark = get_spark("binlog-repair")
    events = routed_events(spark, args.warehouse)
    from binlog_processer_spark.operators.aggregate import final_state

    # ONE event replay shared by replica derivation, reconcile, repair, and
    # the re-verify (AvroDataReader.java:95-135 replays once)
    fs = final_state(events).persist()
    replica_tbl = None
    if args.replica:
        if os.path.exists(os.path.join(args.replica, "_current")):
            # replica lives in snapshot storage: the repair commits as a NEW
            # SNAPSHOT of the SAME table (TransactionOperate.java:29-66 —
            # repair is a transaction on the replica, not a side copy)
            replica_tbl = SnapshotTable(args.replica)
            replica = replica_tbl.read(spark)
        else:
            replica = spark.read.parquet(args.replica)
    else:
        replica = derived_replica(
            events, True if args.mutate is None else args.mutate, fs=fs
        )

    findings = reconcile(None, replica, fs=fs).persist()
    n_before = findings.count()

    if replica_tbl is not None and n_before:
        # file-scoped commit: repair only rewrites the replica files that
        # contain a flagged key (plus one new file set for the inserts);
        # untouched files are carried by reference in the new manifest
        # (rewrite_files) — at 10^12 rows the write amplification of a full
        # replica rewrite, not the MERGE join, is the dominant repair cost
        from binlog_processer_spark.operators.repair import KEYS

        flagged = findings.select(*KEYS).distinct()
        hit_files = sorted(
            r["__f"]
            for r in replica.withColumn("__f", F.input_file_name())
            .join(flagged, KEYS, "left_semi")
            .select("__f")
            .distinct()
            .collect()
        )
        # repair of ONLY the hit-file rows produces exactly the replacement:
        # stale/ghost keys live in hit files by construction, and
        # missing_create inserts surface through the full-outer MERGE join
        # whatever the replica subset
        replica_hit = replica_tbl.read_files(spark, hit_files)
        repaired_scoped = repair(None, replica_hit, findings, fs=fs)
        tbl = replica_tbl
        snap = tbl.rewrite_files(hit_files, repaired_scoped)
    elif replica_tbl is not None:
        # zero findings on a snapshot-stored replica: nothing to repair,
        # nothing to commit
        tbl, snap = replica_tbl, replica_tbl.current_snapshot()
    else:
        repaired = repair(None, replica, findings, fs=fs)
        tbl = SnapshotTable(os.path.join(args.warehouse, "replica_repaired"))
        snap = tbl.write(repaired)
    # re-verify against the COMMITTED snapshot, not the in-flight DataFrame
    # (BinlogDBHandler.java:50-68 marks rows repaired only after commit)
    n_after = reconcile(None, tbl.read(spark, snapshot=snap), fs=fs).count()
    findings.unpersist()
    print(json.dumps({
        "findings_before": n_before,
        "findings_after": n_after,
        "snapshot": snap,
        "repaired_rows": tbl.read(spark, snapshot=snap).count(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
